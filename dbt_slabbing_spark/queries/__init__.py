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
    "bucketed",
    "reference_pipeline",
    "funnel",
)

# The driver's correctness gate checks the registry PREFIX (50 entries),
# so the prefix is rotated each round toward "driver rows <= 1 round
# old for the whole registry". Round-8 prefix, audited via max round
# per key across CORRECTNESS_r01..r07 (distribution before rotation:
# r7:50, r6:50, r4:44, r3:48, r2:2 — the round-7 comment's "nothing
# older than r3 after this round" overstated by exactly the two r2
# rows it displaced; corrected here):
#   1. window_sessionize_batch + window_running_revenue — the two r2
#      rows displaced by round 7's never-checked gates, queued first
#      as promised.
#   2. The full r3-stale cohort (48 queries) — together with item 1,
#      exactly 50 slots.
#   3. Gates ADDED in round 8 are swapped in as they land
#      (never-driver-checked outranks stale-but-green). Yields so far:
#      udf_row_at_a_time_upper → ml_kmeans_cells, setop_union_by_name
#      → text_domain_filter, fn_hash_suite → sim_ivf_trained_topk,
#      mm_frame_sample_plan → text_bpe_learn_merges (each displaced
#      row is trivially/pytest-pinned: the UDF surface gate, the
#      structural union-by-name, the deterministic hash-fn suite, the
#      plan-shape-guarded frame sampler), then sim_neardup_pairs →
#      dedup_semantic_trained (its LSH twin sim_neardup_pairs_lsh
#      stays prefixed and shares the cosine/threshold kernel, so the
#      VALUES keep a driver check through the twin), then
#      stream_sliding_user_activity → stream_domain_cap (the streaming
#      family keeps three prefixed rows incl. the newcomer). Later
#      round-8 waves swapped further gates in; each swap's displaced
#      row and its coverage-keeper twin are annotated INLINE at the
#      entry below. Final round-8 composition (audited by max round
#      per key over CORRECTNESS_r0*.json): the 2 promised r2 rows +
#      43 round-8 never-driver-checked gates + 5 r3-green keeper
#      twins that other displacements cite (weighted_noreplacement,
#      brp_euclidean_topk, neardup_pairs_lsh, hourly_type_counts,
#      forward_fill_hourly) = 50. Every displaced row is r3-stale one
#      more round and rotates FIRST in round 9.
# Staleness audit: registry keys vs max round per key across
# CORRECTNESS_r0*.json (all 50 verified green by tools/parity_sweep.py
# on the current 2026-08-14 10:21 testdata before rotation).
# `python tools/rotation_audit.py` automates this audit and prints the
# proposed next-round queue.
_PRIORITY = (
    "window_sessionize_batch",
    "window_running_revenue",
    "agg_heavy_hitters_mg",  # round-8 gate, never driver-checked:
    # takes agg_approx_topk_event_types's slot (r3-green approx-topk
    # twin of the same sketch family -> round-9 rotation queue)
    "ts_attribution_position_based",  # round-8 gate, never
    # driver-checked: takes agg_corr_regression's slot (r3-green ->
    # round-9 rotation queue)
    "text_bigram_surprisal",  # round-8 gate, never driver-checked:
    # takes agg_exact_distribution's slot (r3-green -> round-9
    # rotation queue)
    "layout_manifest_delete",  # round-8 gate, never driver-checked:
    # takes agg_mode_priority_by_status's slot (r3-green -> round-9
    # rotation queue)
    "dedup_sorted_neighborhood",  # round-8 gate, never driver-checked:
    # takes dedup_minhash_lsh's slot (r3-green; the minhash band kernel
    # keeps a prefixed driver row via sim_neardup_pairs_lsh -> round-9
    # rotation queue)
    "ml_logreg_gd",  # round-8 gate, never driver-checked: takes
    # dedup_normalized_md5's slot (r3-green, oracle shape shared with
    # the prefixed dedup_exact twin family -> round-9 rotation queue)
    "ml_naive_bayes_langid",  # round-8 gate, never driver-checked:
    # takes dedup_simhash's slot (r3-green; simhash-PAIRS variant
    # keeps banding coverage elsewhere -> round-9 rotation queue)
    "profile_chi2_independence",  # round-8 gate, never driver-checked:
    # takes fn_case_classification's slot (r3-green byte-stable scalar
    # suite -> round-9 rotation queue)
    "sim_ivf_trained_topk",  # round-8 gate (slot yielded by fn_hash_suite)
    "text_bpe_encode_tokens",  # round-8 gate, never driver-checked:
    # takes fn_math_suite's slot (r3-green byte-stable scalar suite ->
    # round-9 rotation queue)
    "ml_power_iteration_pc1",  # round-8 gate, never driver-checked:
    # takes fn_null_handling's slot (r3-green byte-stable scalar suite
    # -> round-9 rotation queue)
    "ml_kn_trigram_lm",  # round-8 gate, never driver-checked: takes
    # join_fuzzy_levenshtein's slot (r3-green; its banded candidate
    # equi-join shape keeps driver coverage via the prefixed dedup/sim
    # band joins -> round-9 rotation queue)
    "join_bloom_prefilter_membership",  # round-8 gate, never
    # driver-checked: takes join_null_safe_equality's slot (r3-green
    # -> round-9 rotation queue)
    "text_bpe_learn_merges",  # round-8 gate (slot yielded by mm_frame_sample_plan)
    "ts_event_transition_matrix",  # round-8 gate, never
    # driver-checked: takes mm_size_stats_by_source's slot (r3-green
    # -> round-9 rotation queue)
    "train_contrastive_negatives",  # round-8 gate, never
    # driver-checked: takes q21_sole_late_supplier's slot (r3-green;
    # q21's VALUES keep a driver check through q21_bucketed_layout —
    # identical result set, r7-green — and bench re-times both every
    # round -> round-9 rotation queue)
    "profile_gini_concentration",  # round-8 gate, never driver-checked:
    # takes q3_shipping_priority's slot (r3-green; q3's VALUES keep a
    # driver check through q3_bucketed_layout — identical result set,
    # r7-green -> round-9 rotation queue)
    "ml_assoc_rules_pairs",  # round-8 gate, never driver-checked: takes
    # q5_local_supplier's slot (r3-green; the TPC-H multi-dim join
    # family keeps r7-fresh driver rows via the two bucketed-layout
    # gates -> round-9 rotation queue)
    "text_pmi_collocations",  # round-8 gate, never driver-checked:
    # takes q9_product_type_profit's slot (r3-green; same TPC-H family
    # argument as q5 -> round-9 rotation queue)
    "profile_benford_digits",  # round-8 gate, never driver-checked:
    # takes sample_train_test_split's slot (r3-green; the md5-keyed
    # sampling kernel keeps a prefixed row via
    # sample_weighted_noreplacement -> round-9 rotation queue)
    "ml_item_cofiltering",  # round-8 gate, never driver-checked: takes
    # sample_weighted_mixture's slot (r3-green; the md5-keyed sampling
    # kernel keeps two prefixed rows via train_test_split and
    # weighted_noreplacement -> round-9 rotation queue)
    "sample_weighted_noreplacement",
    "stream_trending_topk",  # round-8 gate, never driver-checked:
    # takes setop_except_nations's slot (r3-green -> round-9 rotation
    # queue)
    "text_domain_filter",  # round-8 gate, never driver-checked: takes
    # the slot setop_union_by_name was designated to yield (see item 3)
    "sim_brp_euclidean_topk",
    "ml_als_rank1",  # round-8 gate, never driver-checked: takes
    # sim_lsh_bucket_histogram's slot (r3-green; the hyperplane-LSH
    # kernel keeps prefixed rows via sim_neardup_pairs_lsh and
    # sim_brp_euclidean_topk -> round-9 rotation queue)
    "dedup_semantic_trained",  # round-8 gate (slot yielded by sim_neardup_pairs)
    "sim_neardup_pairs_lsh",
    "ts_session_paths_topk",  # round-8 gate, never driver-checked:
    # takes stream_foreach_batch_totals's slot (r3-green; the
    # streaming family keeps three prefixed rows via
    # stream_hourly_type_counts, stream_trending_topk and
    # stream_domain_cap -> round-9 rotation queue)
    "stream_hourly_type_counts",
    "stream_domain_cap",  # round-8 gate (slot yielded by stream_sliding_user_activity)
    "sql_recursive_reachability",  # round-8 gate, never
    # driver-checked: takes subquery_not_in_null_semantics's slot
    # (r3-green -> round-9 rotation queue)
    "agg_countmin_sketch",  # round-8 gate, never driver-checked:
    # takes text_bpe_token_estimate's slot (r3-green; the BPE family
    # keeps two prefixed rows via learn_merges and encode_tokens ->
    # round-9 rotation queue)
    "text_proximity_search",  # round-8 gate, never driver-checked:
    # takes text_fingerprint_groups's slot (r3-green -> round-9
    # rotation queue)
    "graph_common_neighbors",  # round-8 gate, never driver-checked:
    # takes text_langid_confusion's slot (r3-green; langid keeps a
    # prefixed driver row via ml_naive_bayes_langid -> round-9
    # rotation queue)
    "profile_ks_two_sample",  # round-8 gate, never driver-checked:
    # takes text_token_histogram's slot (r3-green; the token-stats
    # kernel is trivially pytest-pinned and the histogram shape keeps
    # driver coverage via the agg_histogram family -> round-9 rotation
    # queue)
    "ts_rfm_segments",  # round-8 gate, never driver-checked: takes
    # train_curriculum_order's slot (r3-green; the global_row_number
    # ordering kernel is plan-guard pytest-pinned -> round-9 rotation
    # queue)
    "ts_forward_fill_hourly",
    "profile_mad_outliers",  # round-8 gate, never driver-checked:
    # takes ts_funnel_conversion's slot (r3-green; the customer-
    # behavior mart family keeps a prefixed driver row via
    # ts_rfm_segments -> round-9 rotation queue)
    "layout_merge_upsert",  # round-8 gate, never driver-checked: takes
    # ts_gap_fill_hourly's slot (r3-green; its forward-fill twin stays
    # prefixed and shares the spine/join kernel -> round-9 rotation
    # queue)
    "stream_ewma_alert",  # round-8 gate, never driver-checked: takes
    # ts_retention_cohorts's slot (r3-green; the customer-behavior
    # mart family keeps prefixed rows via ts_rfm_segments and
    # ts_funnel_conversion -> round-9 rotation queue)
    "dedup_entity_resolution",  # round-8 gate, never driver-checked:
    # takes udf_grouped_ols_slope's slot (r3-green; the pandas-UDF
    # value kernels are pytest-pinned — hypothesis fold-model +
    # grouped-median — and the whole UDF surface keeps parity-sweep
    # coverage -> round-9 rotation queue)
    "ml_kmeans_cells",  # round-8 gate, never driver-checked: takes the
    # slot udf_row_at_a_time_upper was designated to yield (see item 3)
    "ml_psi_value_drift",  # round-8 gate, never driver-checked:
    # takes window_first_last_order's slot (r3-green -> round-9
    # rotation queue)
    "ts_ewma_smoothing",  # round-8 gate, never driver-checked:
    # takes window_lag_lead_gaps's slot (r3-green; the lag/lead kernel
    # keeps a driver check through window_sessionize_batch, which is
    # built on it and stays prefixed -> round-9 rotation queue)
    "layout_time_travel",  # round-8 gate, never driver-checked: takes
    # window_ntile_quartiles's slot (r3-green; the window family keeps
    # five prefixed rows -> round-9 rotation queue)
    "ts_cusum_changepoint",  # round-8 gate, never driver-checked:
    # takes window_range_hourly_sum's slot (r3-green; the hourly-
    # bucket aggregation shape keeps driver coverage via
    # stream_hourly_type_counts, which stays prefixed -> round-9
    # rotation queue)
    "ml_decision_stump",  # round-8 gate, never driver-checked: takes
    # window_rank_dense_percent's slot (r3-green; the window family
    # keeps four prefixed rows -> round-9 rotation queue)
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
