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
    "bucketed",
    "reference_pipeline",
    "funnel",
)

# The driver's correctness gate checks the registry PREFIX (50 entries),
# so the prefix is rotated each round toward "driver rows <= 1 round
# old for the whole registry". Round-7 prefix, audited against
# CORRECTNESS_r01..r06 (latest driver row per key; distribution before
# rotation: r6:50, r4:44, r3:48, r2:42, never:1):
#   1. dedup_semantic_clusters — added in round 6, has NO driver row
#      ever (round 6 shipped without rotating this prefix).
#   2. Queries ADDED in round 7 (never driver-checked):
#      text_quality_classifier_scores, q3_bucketed_layout,
#      q21_bucketed_layout, text_tfidf_top_terms,
#      sim_bitext_margin_pairs, sample_temperature_mixture,
#      stream_quality_funnel, model_schema_tests,
#      agg_bitmap_audience_overlap (displacing window_sessionize_batch
#      and window_running_revenue, the only r2 rows left un-refreshed:
#      never-driver-checked outranks stale-but-green — those two are
#      the first rotation items next round).
#      (q3_shipping_priority and q21_sole_late_supplier yielded their
#      slots: their oracles are byte-identical to the prefixed
#      q3_bucketed_layout / q21_bucketed_layout rows, so the VALUES
#      still get a round-7 driver check through those.)
#   3. The full r2-stale cohort (42 queries, latest driver row is r2 —
#      four testdata regenerations old), so after this round no
#      registry query's driver row is older than r3.
#   4. The round-7 never-checked gates plus the full r2 cohort exactly
#      fill the 50 slots; the r3 cohort stays r3-stale one more round
#      (every member is green in this round's full 191-query parity
#      sweep at sf0.1 AND the full vanilla contract drive) — rotate it
#      next round.
# Staleness audit: registry keys vs max round per key across
# CORRECTNESS_r0*.json (all verified green by tools/parity_sweep.py on
# the current testdata before rotation).
_PRIORITY = (
    "dedup_semantic_clusters",
    "text_quality_classifier_scores",
    "q3_bucketed_layout",
    "q21_bucketed_layout",
    "text_tfidf_top_terms",
    "sim_bitext_margin_pairs",
    "sample_temperature_mixture",
    "stream_quality_funnel",
    "model_schema_tests",
    "agg_bitmap_audience_overlap",
    "agg_approx_percentiles",
    "asof_purchase_attribution",
    "dedup_connected_components",
    "dedup_exact_sha256",
    "dedup_mllib_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "fn_array_suite",
    "fn_date_suite",
    "fn_json_extract",
    "fn_string_suite",
    "fn_variant_json",
    "mm_decode_dimensions",
    "mm_probe_metadata",
    "model_chain_segment_revenue",
    "range_join_error_context",
    "sample_hash_bernoulli",
    "sample_stratified_quota",
    "setop_intersect_nations",
    "setop_union_all_parties",
    "sim_ann_topk_lsh",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "sql_lateral_topn_per_nation",
    "sql_recursive_month_spine",
    "stream_dedup_counts",
    "stream_session_windows",
    "stream_stateful_levels",
    "stream_stream_interval_join",
    "text_decontaminate_flags",
    "text_quality_scores",
    "text_redact_pii",
    "text_token_stats",
    "train_pack_concat_chunks",
    "train_pack_next_fit",
    "training_chunks_pipeline",
    "udf_grouped_agg_median",
    "udf_map_in_arrow_norms",
    "udf_pandas_scalar_bytelen",
    "udf_udtf_chunk_text",
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
