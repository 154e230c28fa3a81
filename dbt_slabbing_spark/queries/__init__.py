"""Query corpus: every operator the engine claims, as a named query.

Each :class:`Query` pairs a Spark DataFrame program with (where SQL can
express it) an equivalent ANSI-SQL oracle string that DuckDB runs on the
same parquet tables. The driver's correctness gate compares the two at
sf=0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased to the SAME name on both sides;
- double-typed aggregates are rounded identically on both sides (sums to
  2 dp, ratios/avgs to 4 dp) so cross-engine float summation order can't
  flip the hash;
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
    "multimodal",
    "streaming_queries",
    "advanced_sql",
    "analytics_extra",
)

# The driver's correctness gate checks the registry PREFIX (50 entries),
# so the prefix is rotated each round toward full coverage-ever:
# rounds 1+2 green-checked 94 distinct queries (CORRECTNESS_r01/r02);
# round 3's prefix = the 40 queries never yet driver-checked, plus 6
# re-checks of queries whose source changed this round (broadcast-hint
# removal, q3/q21/minhash plan rewrites, events-ts normalization) and 4
# of the round-3 additions. The already-checked entries stay
# regression-covered by tests/test_oracle_parity.py at sf0.001; round-3
# additions that didn't fit the window rotate in next round (find them:
# registry keys minus CORRECTNESS_r0*.json keys minus this prefix).
_PRIORITY = (
    # -- the 40 never-driver-checked queries (VERDICT r2 "What's missing" #1) --
    # aggregates depth
    "agg_approx_topk_event_types",
    "agg_exact_distribution",
    "agg_mode_priority_by_status",
    "agg_corr_regression",
    # window depth variants
    "window_lag_lead_gaps",
    "window_range_hourly_sum",
    "window_rank_dense_percent",
    "window_ntile_quartiles",
    "window_first_last_order",
    # set ops depth
    "setop_except_nations",
    "setop_union_by_name",
    # scalar-fn suites depth
    "fn_math_suite",
    "fn_null_handling",
    "fn_hash_suite",
    "fn_case_classification",
    # UDF surface depth
    "udf_grouped_ols_slope",
    "udf_row_at_a_time_upper",
    # text analysis depth
    "text_token_histogram",
    "text_langid_confusion",
    "text_fingerprint_groups",
    "text_bpe_token_estimate",
    "text_rolling_hash_fingerprint",
    # curriculum / sampling depth
    "train_curriculum_order",
    "sample_train_test_split",
    "sample_weighted_mixture",
    # dedup depth
    "dedup_normalized_md5",
    "dedup_simhash",
    # similarity depth
    "sim_lsh_bucket_histogram",
    "sim_neardup_pairs",
    "sim_neardup_pairs_lsh",
    "sim_brp_euclidean_topk",
    # multimodal depth
    "mm_frame_sample_plan",
    "mm_size_stats_by_source",
    # streaming depth
    "stream_sliding_user_activity",
    "stream_foreach_batch_totals",
    # joins / time-series / subquery depth
    "join_fuzzy_levenshtein",
    "join_null_safe_equality",
    "ts_gap_fill_hourly",
    "ts_forward_fill_hourly",
    "subquery_not_in_null_semantics",
    # -- 6 re-checks (source modified in round 3) + 4 round-3 additions --
    "q3_shipping_priority",
    "q5_local_supplier",
    "q9_product_type_profit",
    "q21_sole_late_supplier",
    "stream_hourly_type_counts",
    "dedup_minhash_lsh",
    "ts_retention_cohorts",
    "ts_funnel_conversion",
    "sample_weighted_noreplacement",
    "dedup_cluster_representatives",
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
