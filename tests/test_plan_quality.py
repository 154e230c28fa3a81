"""Physical-plan regression guards: the plans we tuned for must STAY
the plans (a correctness-preserving refactor that silently drops a
broadcast or a pushed filter is a 100 TB regression local tests would
never feel)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_slabbing_spark.queries import registry
from tests.conftest import SF_SMOKE


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_joins_all_broadcast(spark):
    plan = _executed_plan(registry()["q5_local_supplier"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "a dim join fell back to sort-merge"


def test_q1_filter_pushed_and_pruned(spark):
    plan = _executed_plan(registry()["q1_pricing_summary"].fn(spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: unreferenced wide columns must not be read
    assert "l_partkey" not in plan.split("ReadSchema")[-1]


def test_q3_preagg_below_join_no_fact_broadcast(spark):
    """q3's revenue aggregation must sit BELOW the orders join (partial
    agg on the scan side of the exchange), and the pre-aggregated fact
    side must never be broadcast (the stats-less static planner would —
    a driver round-trip locally, an OOM at 100 TB; pinned by the merge
    hint)."""
    plan = _executed_plan(registry()["q3_shipping_priority"].fn(spark, SF_SMOKE))
    assert "partial_sum" in plan, plan[:3000]
    assert "SortMergeJoin [l_orderkey" in plan, plan[:3000]
    # the only broadcasts allowed are the genuinely small sides (cust)
    assert "BroadcastExchange" not in plan.split("SortMergeJoin")[0], plan[:3000]


def test_window_topk_group_limit_pushed_below_exchange(spark):
    """The rank-filter top-k must run as WindowGroupLimit so only ≤k
    rows per group survive the rank. Two admissible shapes (r14):
    spread fired (single-row-group local input) → ONE exchange on the
    window key and the sort+rank parallelized behind it; spread off
    (well-split input) → WindowGroupLimit on BOTH sides of the window's
    own exchange (partial before the shuffle — the 100 TB shape: ≤k
    rows per group cross the wire). Losing WGL entirely (e.g. by
    filtering on a derived column Catalyst can't see through) would
    rank every row at 100 TB."""
    q = registry()["window_topk_orders_per_customer"].fn
    plan = _executed_plan(q(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan, plan[:3000]
    assert plan.count("hashpartitioning(o_custkey") == 1, plan[:3000]
    # force the no-spread path and require the partial WGL back
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        plan = _executed_plan(q(spark, SF_SMOKE))
        assert plan.count("WindowGroupLimit") >= 2, plan[:3000]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_q2_single_fact_shuffle(spark):
    """q2's correlated-min decorrelation: supplier/nation/region and part
    are broadcast, so lineitem shuffles only on its aggregation/window
    key — no sort-merge join of the fact table."""
    plan = _executed_plan(registry()["q2_min_unit_cost_supplier"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dim join fell back to sort-merge"


def test_q21_decorrelated_no_fact_sortmerge_explosion(spark):
    """q21's EXISTS/NOT EXISTS pair is one per-order aggregate + one
    l_orderkey join. Round 4 pins the lineitem⋈orders join to shuffled
    hash: the static planner otherwise BROADCASTS the F-filtered orders
    fact at sf0.1 (OOM at scale), and merge would add two sorts the
    stacked aggregates don't need. Supplier (true dim) stays broadcast;
    lineitem shuffles exactly once (aggregate keys are supersets of the
    join key, so the exchange is reused)."""
    plan = _executed_plan(registry()["q21_sole_late_supplier"].fn(spark, SF_SMOKE))
    assert "ShuffledHashJoin [l_orderkey" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the supplier dim join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q9_part_filter_pushed(spark):
    """q9's p_name contains-filter must reach the part parquet scan."""
    plan = _executed_plan(registry()["q9_product_type_profit"].fn(spark, SF_SMOKE))
    assert "StringContains(p_name,widget)" in plan, "part filter not pushed to scan"


def test_minhash_partial_aggregation(spark):
    """The per-(doc, seed) min must partial-aggregate before its
    exchange (shuffle volume docs×seeds, not shingles×seeds)."""
    from dbt_slabbing_spark.catalog import table
    from dbt_slabbing_spark.operators.hashing import minhash_signatures

    sigs = minhash_signatures(table(spark, SF_SMOKE, "documents"), "doc_id", "text")
    plan = _executed_plan(sigs)
    before_exchange = plan.split("Exchange")[-1]  # deepest section = pre-shuffle
    assert "partial_min" in before_exchange or "partial_min" in plan, plan[:2000]


def test_minhash_fused_band_join_reuses_exchange_no_cache(spark):
    """dedup_minhash_lsh must (a) leave NO cache entry behind (round 2
    leaked a .persist()), and (b) build the signature pipeline once:
    the fused band self-join's two sides are identical subplans, so the
    executed plan must contain a ReusedExchange instead of a second
    shingle→minhash build."""
    q = registry()["dedup_minhash_lsh"]
    jsc = spark.sparkContext._jsc.sc()
    # delta, not absolute: the shared test session may hold other tests'
    # localCheckpoint blocks until GC
    before = jsc.getPersistentRDDs().size()
    df = q.fn(spark, SF_SMOKE)
    df.collect()
    assert jsc.getPersistentRDDs().size() <= before, "minhash query left a cache entry"
    final = _executed_plan(df).split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, final[:3000]
    # exactly one signature build in the executed (final) plan: the
    # documents scan feeding the shingle explode appears once; the other
    # join side reads the reused shuffle output
    assert final.count("FileScan parquet [doc_id") == 1, final[:3000]


def test_ivf_deterministic_and_bounded(spark):
    from dbt_slabbing_spark.catalog import table
    from dbt_slabbing_spark.operators.ivf import ivf_topk
    from dbt_slabbing_spark.operators.similarity import brute_force_topk

    emb = table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(emb, queries).collect()))
    b = sorted(map(tuple, ivf_topk(emb, queries).collect()))
    assert a == b and len(a) > 0
    # ANN cosines can never beat the exact top-1
    exact_best = {
        r["query_id"]: r["cos"]
        for r in brute_force_topk(emb, queries, k=1).collect()
    }
    for qid, _vid, cos in a:
        assert cos <= exact_best[qid] + 1e-9


def test_approx_percentiles_bounded_error(spark):
    """The GK sketch has a rank-error guarantee (≤ n/accuracy). With
    accuracy=10000 on sf0.001 (~6k rows/group) the rank error is < 1,
    so each raw sketch output must land within one exact-order-statistic
    neighbor of the true quantile — and the registry query's in-engine
    verdict booleans (a ~50× looser band) must therefore all be true."""
    from dbt_slabbing_spark.catalog import table

    li = table(spark, SF_SMOKE, "lineitem")
    approx = {
        r["l_returnflag"]: r["qs"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice",
                F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)),
                10000,
            ).alias("qs")
        )
        .collect()
    }
    rows = li.select("l_returnflag", "l_extendedprice").collect()
    by_flag: dict[str, list[float]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    for flag, vals in by_flag.items():
        vals.sort()
        n = len(vals)
        for p, got in zip([0.25, 0.5, 0.75, 0.95], approx[flag]):
            rank = int(p * n)
            lo, hi = vals[max(rank - 2, 0)], vals[min(rank + 2, n - 1)]
            assert lo <= got <= hi, (flag, p, got, lo, hi)
    # registry form: every verdict column must come back true
    for row in registry()["agg_approx_percentiles"].fn(spark, SF_SMOKE).collect():
        for t in (25, 50, 75, 95):
            assert row[f"q{t}_ok"] is True, row


def test_simhash_pairs_banded_no_nested_loop(spark):
    """dedup_simhash_pairs must generate candidates via the pigeonhole
    block equi-join — an all-pairs theta join (BroadcastNestedLoopJoin /
    CartesianProduct over n²/2 document pairs) is the 100 TB regression
    this plan replaced in round 2."""
    plan = _executed_plan(registry()["dedup_simhash_pairs"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan[:3000]
    # candidate generation = hash equi-join on the pigeonhole block key
    assert "BroadcastHashJoin [block_idx" in plan, plan[:3000]
    # the only nested-loop joins allowed are simhash_df's broadcast
    # fan-outs against the constant 32-row bit-position table (Cross with
    # a literal side, linear in docs) — never an Inner doc×doc pair scan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line


def test_concat_chunk_prefix_sum_is_distributed(spark):
    """The concat-and-chunk global offset must come from the two-pass
    range-partition + broadcast-offsets scheme: the doc-sized side is
    range-partitioned and joined by broadcast; the ONLY single-partition
    exchange allowed is the partitions-sized offsets table."""
    plan = _executed_plan(registry()["train_pack_concat_chunks"].fn(spark, SF_SMOKE))
    assert "rangepartitioning" in plan.lower(), plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # the single-partition window may appear exactly once (tiny offsets
    # table) — a second one would mean the doc stream went global
    assert plan.count("Exchange SinglePartition") <= 1, plan[:3000]


def test_shingle_df_cap_bounds_hot_shingle_join(spark):
    """One boilerplate shingle shared by every document must NOT create
    O(n²) candidate pairs: capped_shingles drops it, so two documents
    that overlap ONLY in the hot shingle never become a pair."""
    from dbt_slabbing_spark.queries.dedup import capped_shingles

    # 60 docs: all share one hot 3-gram; docs 0/1 also share a rare one.
    hot = "the quick fox"
    rows = [(i, f"{hot} unique{i} tail{i} word{i}") for i in range(58)]
    rows += [(100, f"{hot} shared rare trigram"), (101, f"{hot} shared rare trigram extra")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = capped_shingles(docs, df_cap=50)
    kept = {r["sh"] for r in sh.collect()}
    assert hot not in kept, "hot shingle survived the df cap"

    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
        .collect()
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(100, 101)}, got


def test_aqe_skew_join_splits_hot_partition(spark):
    """The 100 TB skew stance (SCALE.md): heavily skewed shuffle joins
    are healed by AQE splitting the hot partition. Build a join where
    one key owns ~95% of rows, force the sort-merge path, and assert
    the adaptive final plan marked the join skew=true."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(100_000).selectExpr(
            "CASE WHEN id % 20 = 0 THEN id % 7 ELSE 0 END AS k", "id AS payload"
        )
        dim = spark.range(7).selectExpr("id AS k", "id AS other")
        # no aggregation downstream of the join: skew-split changes the
        # join's output partitioning, so AQE (with forceOptimize off)
        # only applies it when nothing downstream requires that
        # partitioning — same reason a skewed groupBy needs salting
        # (queries/coverage_extra.py::agg_salted_hot_keys) rather than AQE.
        joined = hot.join(dim, "k")
        joined.collect()  # AQE re-plans at runtime; materialize first
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_lateral_topn_decorrelates_to_window_join(spark):
    """The correlated LATERAL (ORDER BY + LIMIT 2 per nation) must
    decorrelate into a ranked-window + equi-join plan — per-row subquery
    re-execution would show up as a nested-loop join."""
    plan = _executed_plan(registry()["sql_lateral_topn_per_nation"].fn(spark, SF_SMOKE))
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_recursive_spine_native_loop_and_preagg(spark):
    """WITH RECURSIVE must run as Spark 4's native UnionLoop, and the
    orders side must be hash-aggregated BEFORE joining the 84-row spine
    (the spine joins an aggregate, never the raw fact)."""
    plan = _executed_plan(registry()["sql_recursive_month_spine"].fn(spark, SF_SMOKE))
    assert "UnionLoop" in plan
    assert "HashAggregate" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gap_fill_grid_stays_broadcast(spark):
    """Gap filling joins the dense grid against a PRE-AGGREGATED counts
    frame: the tiny types/grid sides broadcast; a CartesianProduct or a
    sort-merge of raw events would be the 100 TB regression."""
    plan = _executed_plan(registry()["ts_gap_fill_hourly"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_bitmap_rollup_expand_free_and_scan_shared(spark):
    """The exact-distinct bitmap rollup (bench `bitmap_rollup`) must stay
    Expand-free (no count_distinct rewrite — the whole point is that
    coarser levels merge bitmaps, not rows) and the per-(group, bucket)
    bitmap exchange must be REUSED by the global level, so orders is
    scanned/bucketed once for both rollup levels."""
    df = registry()["agg_bitmap_exact_distinct_rollup"].fn(spark, SF_SMOKE)
    df.collect()  # AQE: exchange reuse appears in the final plan
    plan = _executed_plan(df)
    assert "Expand" not in plan, plan[:3000]
    assert "ReusedExchange" in plan, plan[:3000]


def test_bm25_stats_broadcast_and_topk_single_reduce(spark):
    """BM25's corpus statistics (N, avgdl, per-term df) are ONE scalar
    row broadcast back over the feature scan — the corpus must never be
    shuffled to meet its own statistics — and the final top-k must plan
    as TakeOrderedAndProject (partial top-k per partition + single
    reduce), not a global sort."""
    plan = _executed_plan(registry()["text_bm25_topk"].fn(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan[:3000]
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert "CartesianProduct" not in plan, plan[:3000]


def test_repetition_profile_aggs_keyed_by_doc(spark):
    """Both repetition aggregations key by doc_id, so the second-level
    per-doc max/sum must reuse the (doc_id, ngram) exchange partitioning
    instead of reshuffling, and nothing may cartesian-join."""
    plan = _executed_plan(registry()["text_repetition_profile"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # (doc_id, tok) -> doc_id: partial aggregation before the reduce
    assert "partial_max" in plan or "partial_count" in plan, plan[:3000]


def test_pq_adc_codebook_and_dtable_broadcast(spark):
    """PQ/ADC: the codebook join at encode time and the per-query
    distance-table join at search time must both be broadcasts — the
    corpus-sized frames (subvectors, codes) may never be on the build
    side of a join, and nothing may cartesian-join."""
    plan = _executed_plan(registry()["sim_pq_adc_topk"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "CartesianProduct" not in plan, plan[:3000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime semi-join reduction: a selective predicate on the DIM
    side of a shuffle join should inject a bloom filter that prunes
    fact rows BEFORE the exchange (might_contain in the fact-side
    Filter, bloom_filter_agg on the dim side). At 100 TB this is the
    difference between shuffling the whole fact table and shuffling
    the ~1/17th that can possibly match — Catalyst does it for free
    once the thresholds see honest sizes, which is why SCALE.md insists
    on ANALYZE'd tables instead of hand-rolled pre-filters.

    The dim attribute comes from literal rows (not an expression over
    the join key), so constraint propagation CANNOT rewrite the
    predicate onto the fact side — the bloom filter is the only
    fact-side pruning in the plan.
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # local toy sizes: the fact scan is ~1.6 MB, far below the
        # 10 GB production default
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(200_000).selectExpr("id % 1000 AS k", "id AS payload")
        # dim goes through parquet: literal rows (ExistingRDD) carry the
        # unknown-size default (Long.Max), which fails the creation-side
        # threshold — the injection rule needs honest file-scan stats
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                [(i, (i * i + 3) % 17) for i in range(1000)], "k long, attr long"
            ).write.mode("overwrite").parquet(d)
            dim = spark.read.parquet(d).filter("attr = 3")
            plan = _executed_plan(fact.join(dim, "k"))
        assert "might_contain" in plan, plan[:3000]
        assert "bloom_filter_agg" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_token_budget_prefix_sum_is_distributed(spark):
    """The token-budget mixture's per-source running sum must come from
    the two-pass grouped prefix-sum (range partition + broadcast
    offsets): a `sum() OVER (PARTITION BY source)` window would put a
    whole source — a constant fraction of the corpus — in one task.
    The regression signature is a window partitioned by source ALONE
    and ordered by doc_id (the legitimate survivors: the tiny offsets
    window ordered by partition id, the intra windows keyed by
    (partition id, source), and the map-side-combined final rollup's
    source exchange — all bounded)."""
    import re

    plan = _executed_plan(registry()["sample_token_budget_mixture"].fn(spark, SF_SMOKE))
    assert "rangepartitioning" in plan.lower(), plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]
    bad = re.findall(r"windowspecdefinition\(source#\d+, doc_id", plan)
    assert not bad, plan[:3000]


def test_semdedup_pair_scan_is_cell_equi_join(spark):
    """SemDeDup's within-cell pair scan must execute as an EQUI-join
    keyed on the quantizer cell (Spark extracting `_cell_a == _cell_b`
    as the join key, `_id_a < _id_b` as a post-join filter) — a
    BroadcastNestedLoopJoin / CartesianProduct over all vector pairs is
    the 100 TB regression the clustering exists to prevent (makes
    operators/semdedup.py's no-cross-join claim a pinned fact)."""
    plan = _executed_plan(registry()["dedup_semantic_clusters"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan[:3000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    assert "_cell_a" in plan.split("Join")[0] or any(
        j in plan for j in ("SortMergeJoin [_cell_a", "ShuffledHashJoin [_cell_a",
                            "BroadcastHashJoin [_cell_a")
    ), plan[:3000]


def test_quality_classifier_is_map_only(spark):
    """The fasttext-style scorer ships its weight vector as a plan
    literal: scoring must be a single map-only codegen stage over the
    scan — no join, no aggregation exchange, no Python UDF. At 100 TB
    this stage prices at one read of the corpus, which is what lets it
    sit in front of dedup in the funnel's cheapest-first ordering."""
    plan = _executed_plan(registry()["text_quality_classifier_scores"].fn(spark, SF_SMOKE))
    for op in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython", "Aggregate"):
        assert op not in plan, f"unexpected {op} in map-only scorer plan\n" + plan[:3000]
    # `*(n)` is executedPlan().toString()'s whole-stage-codegen marker
    # (the higher-order-function projects sit between codegen'd stages —
    # HOFs don't codegen, but they are still JVM-side expression eval).
    assert "*(" in plan and "FileScan parquet" in plan


def test_bpe_encode_is_map_only(spark):
    """The ENCODE side of the learned tokenizer ships the 6-row merge
    table as plan literals (chained replace inside a transform lambda):
    the returned plan must be one map over the documents scan — no
    join, no aggregation, no Python UDF. The learning phase runs its
    own bounded jobs beforehand; what prices per-corpus-byte at 100 TB
    is exactly this single pass. r14: a single-row-group local input
    additionally gets ONE spread exchange so the map uses the cores —
    the no-spread branch below re-asserts the pure zero-exchange shape
    a well-split input gets."""
    q = registry()["text_bpe_encode_tokens"].fn
    plan = _executed_plan(q(spark, SF_SMOKE))
    for op in ("Join", "BatchEvalPython", "ArrowEvalPython", "Aggregate"):
        assert op not in plan, f"unexpected {op} in map-only encode plan\n" + plan[:3000]
    assert plan.count("Exchange") <= 1, plan[:3000]  # the spread, nothing else
    assert "FileScan parquet" in plan
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")  # spread off
        plan = _executed_plan(q(spark, SF_SMOKE))
        for op in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython", "Aggregate"):
            assert op not in plan, f"unexpected {op} in map-only encode plan\n" + plan[:3000]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_pca_projection_is_map_only(spark):
    """ml_power_iteration_pc1's RETURNED plan is the projection stage:
    means and eigenvector ride as plan literals, so it must be one map
    over the embeddings scan — no join, no shuffle, no aggregation, no
    Python UDF. The co-moment pass ran its own bounded jobs; the
    per-corpus-byte cost at 100 TB is one scan there and one here."""
    plan = _executed_plan(registry()["ml_power_iteration_pc1"].fn(spark, SF_SMOKE))
    for op in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython", "Aggregate"):
        assert op not in plan, f"unexpected {op} in map-only projection plan\n" + plan[:3000]
    assert "FileScan parquet" in plan


def test_q3_bucketed_layout_zero_shuffle_exchanges(spark):
    """q3 over the bucketed fact layout must need NO shuffle exchange
    anywhere: the revenue agg runs on the scan partitioning, the
    fact-to-fact sort-merge join reuses the co-bucketed partitioning
    (both scans show Bucketed: true), the top-10 is a
    TakeOrderedAndProject, and the only exchange in the plan is the
    customer broadcast. This is the write-once layout that deletes
    q3's one mandatory runtime shuffle (BASELINE.md round-4 stage
    decomposition) at 100 TB."""
    import re

    plan = _executed_plan(registry()["q3_bucketed_layout"].fn(spark, SF_SMOKE))
    assert len(re.findall(r"Exchange (hash|range|SinglePartition)", plan)) == 0, plan[:3000]
    assert plan.count("Bucketed: true") == 2, plan[:3000]
    assert "SortMergeJoin" in plan and "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # customer, the one small side


def test_q21_bucketed_layout_single_terminal_shuffle(spark):
    """q21 over the SAME bucketed layout as q3_bucketed_layout: the
    fact join and both stacked per-order aggregates must run on the
    write-time bucketing (both scans Bucketed: true, join on the order
    key with no exchange under it), leaving exactly ONE shuffle in the
    whole plan — the terminal s_name rollup, whose cardinality is the
    supplier count, not the fact. One layout amortized across queries
    is the 100 TB point of bucketing."""
    import re

    plan = _executed_plan(registry()["q21_bucketed_layout"].fn(spark, SF_SMOKE))
    shuffles = re.findall(
        r"Exchange (?:hashpartitioning\(\w+|rangepartitioning|SinglePartition)", plan
    )
    assert len(shuffles) == 1 and "s_name" in shuffles[0], (shuffles, plan[:3000])
    assert plan.count("Bucketed: true") == 2, plan[:3000]
    assert "SortMergeJoin [l_orderkey" in plan, plan[:3000]


def test_tfidf_topk_group_limit_and_no_vocab_broadcast(spark):
    """text_tfidf_top_terms: the top-3 rank filter must compile to
    WindowGroupLimit on BOTH sides of the doc_id exchange (≤3 rows per
    doc cross the wire), and the term→idf dim must join as a shuffle
    equi-join, NOT a broadcast — vocabulary scales with the corpus, so
    a broadcast of the df table is a driver OOM at 100 TB."""
    plan = _executed_plan(registry()["text_tfidf_top_terms"].fn(spark, SF_SMOKE))
    assert plan.count("WindowGroupLimit") >= 2, plan[:3000]
    # the df(term) side must not be broadcast: the only BroadcastExchange
    # allowed is the 1-row corpus count
    import re

    for m in re.finditer(r"BroadcastExchange[^\n]*", plan):
        section = plan[m.start():m.start() + 400]
        assert "n_docs" in section or "IdentityBroadcastMode" in section, section


def test_bitext_candidates_are_bucket_equi_join(spark):
    """sim_bitext_margin_pairs: the en x non-en candidate generation
    must be an equi-join on the LSH bucket id — an all-pairs
    cross-lingual scan (CartesianProduct / a non-Cross BNLJ) is the
    100 TB regression the buckets exist to prevent. The only
    BroadcastNestedLoopJoin allowed is the 4-row hyperplane
    attachment (Cross build of the planes literal, the sim_* idiom)."""
    plan = _executed_plan(registry()["sim_bitext_margin_pairs"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan[:3000]
    assert "SortMergeJoin [bucket" in plan or "ShuffledHashJoin [bucket" in plan, plan[:3000]
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line  # planes attachment only
