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
    "mining",
    "curation",
    "bucketed",
    "reference_pipeline",
    "funnel",
)

# The driver's correctness gate checks the registry PREFIX (50 entries),
# so the prefix is rotated each round toward "driver rows <= 1 round
# old for the whole registry". Round-13 prefix = the 4 gates ADDED
# this round (never-driver-checked outranks stale-but-green: the rich
# MERGE clause gate, the RETAIN-HOURS retention gate, the
# partition-style pruning gate, the DV change-feed reader gate), then
# EXACTLY the 43 r7-stale rows `python tools/rotation_audit.py` queued
# at round start (VERDICT r12 'Next round #1': the 7 round-12-
# displaced rows first, then the r7 cohort in audit order -- all
# re-verified green by the r12 judge parity sample or the round-12
# full sweeps, but a judge row is not a driver row), then the r8
# cohort head to fill 50. After this round max staleness is r8 and
# every row has a driver row <= 5 rounds old.
_PRIORITY = (
    "layout_merge_full_clauses",  # round-13 gate, never driver-checked
    "layout_retention_horizon",  # round-13 gate, never driver-checked
    "layout_partition_style_pruning",  # round-13 gate, never driver-checked
    "stream_table_change_feed",  # round-13 gate, never driver-checked
    "layout_cdc_replication",  # round-13 gate, never driver-checked:
    # takes agg_heavy_hitters_mg's slot (r8-green; displaced to the
    # round-14 queue; the end-of-round full sweep re-verifies it)
    "layout_add_column_evolution",  # round-13 gate, never driver-checked:
    # takes dedup_entity_resolution's slot (r8-green; displaced to the
    # round-14 queue head; the end-of-round full sweep re-verifies it)
    "dedup_semantic_clusters",
    "dedup_simhash_pairs",
    "fn_array_suite",
    "fn_date_suite",
    "fn_json_extract",
    "fn_string_suite",
    "fn_variant_json",
    "mm_decode_dimensions",
    "mm_probe_metadata",
    "model_chain_segment_revenue",
    "model_schema_tests",
    "q21_bucketed_layout",
    "q3_bucketed_layout",
    "range_join_error_context",
    "sample_hash_bernoulli",
    "sample_stratified_quota",
    "sample_temperature_mixture",
    "setop_intersect_nations",
    "setop_union_all_parties",
    "sim_ann_topk_lsh",
    "sim_bitext_margin_pairs",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "sql_lateral_topn_per_nation",
    "sql_recursive_month_spine",
    "stream_dedup_counts",
    "stream_quality_funnel",
    "stream_session_windows",
    "stream_stateful_levels",
    "stream_stream_interval_join",
    "text_decontaminate_flags",
    "text_quality_classifier_scores",
    "text_quality_scores",
    "text_redact_pii",
    "text_tfidf_top_terms",
    "text_token_stats",
    "train_pack_concat_chunks",
    "train_pack_next_fit",
    "training_chunks_pipeline",
    "udf_grouped_agg_median",
    "udf_map_in_arrow_norms",
    "udf_pandas_scalar_bytelen",
    "udf_udtf_chunk_text",
    "agg_countmin_sketch",  # r8 cohort head (audit order)
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
