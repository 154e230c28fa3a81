"""Query corpus: every operator the engine claims, as a named query.

Each :class:`Query` pairs a Spark DataFrame program with (where SQL can
express it) an equivalent ANSI-SQL oracle string that DuckDB runs on the
same parquet tables. The driver's correctness gate compares the two at
sf=0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased to the SAME name on both sides;
- double-typed aggregates are rounded identically on both sides (sums to
  2 dp, ratios/avgs to 4 dp) so cross-engine float summation order can't
  flip the hash; every rounding — helper or inline — ends `+ 0.0`
  because DuckDB's double round keeps NEGATIVE ZERO where Spark's
  BigDecimal round does not (rounding.py has the full story);
- any LIMIT/top-k query orders by a unique tiebreaker so the selected SET
  is deterministic.

Queries that Spark can express but ANSI SQL can't (streaming, stateful
ops) set ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..rounding import dround, sql_round  # noqa: F401  (re-export for corpus modules)

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the global registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


_MODULES = (
    "relational",
    "relational_extra",
    "tpch_extra",
    "tpch_extra2",
    "coverage_extra",
    "aggregates",
    "windows",
    "setops",
    "scalar_functions",
    "joins_advanced",
    "udf_surface",
    "model_chain",
    "training_pipeline",
    "packing",
    "sampling",
    "dedup",
    "similarity",
    "textanalysis",
    "textsearch",
    "multimodal",
    "streaming_queries",
    "advanced_sql",
    "analytics_extra",
    "reference_pipeline",
    "funnel",
)

# The driver's correctness gate checks the registry PREFIX (50 entries),
# so the prefix is rotated each round toward "driver rows <= 1 round
# old for the whole registry". Round-5 prefix, audited against
# CORRECTNESS_r01..r04 (latest driver row per key):
#   1. ref_ground_truth_labels — r4's ONLY red row (driver canon crashed
#      on array-typed cells); both sides now comma-serialize the lists.
#   2. The 32 queries whose only driver row is r1 (three testdata
#      regenerations old) — the full r1-stale cohort, so after this
#      round no registry query has a driver row older than r2.
#   3. The 5 queries whose code or oracle changed in round 5:
#      sim_sq_int8_topk (-0.0 oracle guard), text_c4_doc_filters
#      (ends_terminal cross-engine anchor), model_snapshot_customer_
#      segments (crash-safe snapshot swap), stream_minhash_band_dedup
#      (stateful registry rework), sample_token_budget_mixture
#      (distributed prefix-sum de-skew).
#   4. The 7 queries ADDED in round 5 (text_gopher_quality_filters,
#      text_dsir_importance_weights, text_line_dedup,
#      dedup_lsh_quality_metrics, text_ccnet_surprisal_buckets,
#      sample_mixture_rebalance, pipeline_quality_funnel) — never
#      driver-checked.
#   5. 5 stalest r2 greens fill the remaining slots (incl. the two
#      bench-headline members q1_pricing_summary and
#      window_topk_orders_per_customer).
# Staleness audit: registry keys vs max round per key across
# CORRECTNESS_r0*.json (all verified green by tools/parity_sweep.py on
# the current testdata before rotation).
_PRIORITY = (
    "ref_ground_truth_labels",
    "q6_forecast_revenue",
    "join_inner_segment_counts",
    "join_left_order_counts",
    "join_semi_active_customers",
    "join_anti_dormant_customers",
    "join_full_outer_nation_presence",
    "sort_limit_top_orders",
    "distinct_flag_status",
    "sql_api_priority_stats",
    "q7_nation_trade",
    "q10_returned_revenue",
    "setop_unpivot_price_stats",
    "agg_string_join",
    "fn_regexp_suite",
    "text_term_frequencies",
    "q4_late_shipment_orders",
    "q8_market_share",
    "q12_shipmode_priority_classes",
    "q13_customer_order_distribution",
    "q14_promo_revenue_ratio",
    "q18_large_volume_orders",
    "q19_disjunctive_ranges",
    "q22_dormant_rich_customers",
    "q2_min_unit_cost_supplier",
    "q11_part_value_concentration",
    "q16_supplier_part_counts",
    "q20_heavy_part_shippers",
    "join_right_suppliers_per_nation",
    "fn_map_from_json",
    "q15_top_revenue_suppliers",
    "q17_small_quantity_revenue",
    "agg_count_distinct",
    "sim_sq_int8_topk",
    "text_c4_doc_filters",
    "model_snapshot_customer_segments",
    "stream_minhash_band_dedup",
    "sample_token_budget_mixture",
    "q1_pricing_summary",
    "subquery_orders_above_cust_avg",
    "agg_collect_list_sorted",
    "agg_approx_distinct",
    "pipeline_quality_funnel",
    "window_topk_orders_per_customer",
    "text_ccnet_surprisal_buckets",
    "sample_mixture_rebalance",
    "text_gopher_quality_filters",
    "text_dsir_importance_weights",
    "text_line_dedup",
    "dedup_lsh_quality_metrics",
)


def registry() -> dict[str, Query]:
    """Import all corpus modules (populating the registry) and return it,
    priority entries first (see ``_PRIORITY``)."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names not in registry: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    ordered.update({n: q for n, q in _REGISTRY.items() if n not in ordered})
    return ordered
