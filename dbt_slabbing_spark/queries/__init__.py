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
)

# The driver's correctness gate checks the registry PREFIX (50 entries),
# so the prefix is rotated each round toward full coverage-ever AND
# re-validation of the stalest greens. Round-4 prefix = the one r3 red
# (text_rolling_hash_fingerprint, oracle CAST fixed) + every query
# that has NEVER had a driver CORRECTNESS row: the two reference-
# pipeline gates, the six early-round-4 additions, the nine r3
# leftovers, and all nineteen late-round-4 gates — audited
# programmatically: registry keys − keys(CORRECTNESS_r01..r03) −
# this prefix = ∅, so after this round EVERY registry query has a
# driver row. The remaining slots re-check r1-only greens
# (dedup_cluster_representatives after its oracle refactor, plus the
# agg/window/fn cohort below). 32 r1-only greens defer to round 5:
# agg_count_distinct, agg_string_join, distinct_flag_status,
# fn_map_from_json, fn_regexp_suite, join_anti_dormant_customers,
# join_full_outer_nation_presence, join_inner_segment_counts,
# join_left_order_counts, join_right_suppliers_per_nation,
# join_semi_active_customers, q2_min_unit_cost_supplier,
# q4_late_shipment_orders, q6_forecast_revenue, q7_nation_trade,
# q8_market_share, q10_returned_revenue,
# q11_part_value_concentration, q12_shipmode_priority_classes,
# q13_customer_order_distribution, q14_promo_revenue_ratio,
# q15_top_revenue_suppliers, q16_supplier_part_counts,
# q17_small_quantity_revenue, q18_large_volume_orders,
# q19_disjunctive_ranges, q20_heavy_part_shippers,
# q22_dormant_rich_customers, setop_unpivot_price_stats,
# sort_limit_top_orders, sql_api_priority_stats,
# text_term_frequencies — ALL verified green by the local
# full-registry sweeps on the final round-4 data at sf0.001, sf0.01
# AND sf0.1 (tools/parity_sweep.py, 2026-08-14). Find stale ones:
# registry keys vs max round per key across CORRECTNESS_r0*.json.
_PRIORITY = (
    "text_rolling_hash_fingerprint",
    "text_duplicate_ngram_fraction",
    "text_c4_doc_filters",
    "dedup_containment_pairs",
    "sim_sq_int8_topk",
    "sim_truncated_rerank_topk",
    "dedup_incremental_batch",
    "sim_lshpq_adc_topk",
    "join_scd2_point_in_time",
    "ts_rolling_7d_user_spend",
    "model_snapshot_customer_segments",
    "udf_udtf_dynamic_schema",
    "agg_histogram_quantile_rollup",
    "stream_minhash_band_dedup",
    "setop_intersect_except_all",
    "fn_collation_suite",
    "join_salted_replicated_dim",
    "sim_ivfpq_residual_topk",
    "sample_token_budget_mixture",
    "ref_mapping_truth_labels",
    "ref_ground_truth_labels",
    "text_bm25_topk",
    "text_repetition_profile",
    "text_unigram_surprisal",
    "sim_pq_adc_topk",
    "model_incremental_hourly_mart",
    "sink_orc_roundtrip",
    "stream_stream_left_outer_join",
    "fn_sql_udf_surface",
    "sample_group_aware_split",
    "graph_pagerank_supplier_part",
    "profile_orders_columns",
    "ts_rollup_time_hierarchy",
    "stream_static_enrich",
    "agg_hll_sketch_rollup",
    "agg_bitmap_exact_distinct_rollup",
    "ts_time_weighted_avg",
    "graph_triangle_count",
    "ts_anomaly_hourly_zscore",
    "fn_try_error_safe_suite",
    "dedup_cluster_representatives",
    "agg_cube_priority_status",
    "agg_filtered_counts",
    "agg_grouping_sets",
    "agg_histogram_buckets",
    "agg_last_state_per_user",
    "agg_pivot_status",
    "agg_rollup_flag_status",
    "agg_salted_hot_keys",
    "agg_stats_moments",
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
