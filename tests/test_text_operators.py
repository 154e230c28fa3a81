"""Edge cases for the text rolling-hash fingerprint and the
distributed global row-number operator."""

from __future__ import annotations

def test_rolling_min_hash_edge_cases(spark):
    """Empty/whitespace docs hash to NULL (matching the oracle's empty
    list_sum), short docs use the fallback, and the O(L) rolling
    recurrence must agree with a direct per-window computation."""
    from pyspark.sql import functions as F

    from dbt_slabbing_spark.operators.text import rolling_min_hash

    rows = [
        (1, ""),
        (2, "   "),
        (3, "short"),
        (4, "exactly16chars!!"),
        (5, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", rolling_min_hash(F.col("text")).alias("fp")).collect()}
    assert got[1] is None and got[2] is None

    B, M, K = 131, 1_000_000_007, 16

    def direct(text):
        s = " ".join(text.strip().lower().split())
        if not s:
            return None
        if len(s) < K:
            return sum(ord(c) * (1 + (j % 7)) for j, c in enumerate(s, start=1)) % M
        best = None
        for i in range(len(s) - K + 1):
            h = 0
            for j in range(K):
                h += ord(s[i + j]) * pow(B, K - 1 - j, M)
            h %= M
            best = h if best is None else min(best, h)
        return best

    for doc_id, text in rows:
        assert got[doc_id] == direct(text), (doc_id, text)


def test_global_row_number_preserves_caller_columns(spark):
    """A caller column named _pid must survive the operator's temp
    columns (uuid-suffixed internals)."""
    from pyspark.sql import functions as F

    from dbt_slabbing_spark.operators.ordering import global_row_number

    df = spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("_pid"))
    out = global_row_number(df, [F.asc("id")], out_col="rn")
    assert set(out.columns) == {"id", "_pid", "rn"}
    rows = sorted((r["rn"], r["id"], r["_pid"]) for r in out.collect())
    assert [t[0] for t in rows] == list(range(1, 101))
    assert all(t[2] == t[1] % 3 for t in rows)


def test_proximity_pair_window_semantics(spark):
    """Hand-built docs pin the NEAR/3 contract: ordered (term1 before
    term2), within 3 words, every qualifying position pair counted,
    reverse order and distance-4 pairs not counted."""
    import dbt_slabbing_spark.queries.textsearch as ts
    from dbt_slabbing_spark.queries import registry

    rows = [
        (1, "alpha x beta"),          # d=2: 1 pair
        (2, "alpha x y z beta"),      # d=4: 0
        (3, "beta alpha"),            # reverse only: 0
        (4, "alpha beta alpha beta"), # (1,2),(3,4),(1,4)? d=3 -> yes: 3 pairs
        (5, "alpha alpha beta"),      # (1,3),(2,3): 2 pairs
        # filler docs so 'alpha'/'beta' are the top-2 terms
        (6, "alpha beta alpha beta alpha beta zz"),
    ]
    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
        got = {
            r["doc_id"]: r
            for r in registry()["text_proximity_search"].fn(spark, tmp).collect()
        }
    assert got[1]["n_pairs"] == 1 and got[1]["term1"] == "alpha"
    assert 2 not in got and 3 not in got
    assert got[4]["n_pairs"] == 3
    assert got[5]["n_pairs"] == 2
    # alpha at 1,3,5; beta at 2,4,6: (1,2),(1,4),(3,4),(3,6),(5,6)
    assert got[6]["n_pairs"] == 5


def test_ordering_kernels_pin_one_range_partitioning(spark):
    """Both kernel consumers (counts/partials and rank/running-sum)
    must observe ONE materialized range partitioning: with a payload
    column, column pruning makes the two subtrees non-identical, AQE
    stage reuse does not fire, and two independent range exchanges can
    reservoir-sample DIFFERENT split points at scale — silently
    corrupting the ranks. The kernels persist the partitioned frame;
    the executed plan must read it from the cache."""
    from pyspark.sql import functions as F

    from dbt_slabbing_spark.operators.ordering import (
        global_row_number,
        grouped_prefix_sum,
    )

    # payload column NOT in the sort key -> the historical no-reuse shape
    df = spark.range(500).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    out = global_row_number(df, [F.col("k"), F.col("id")], out_col="rn")
    rows = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    assert sorted(r["rn"] for r in rows) == list(range(1, 501))

    cum = grouped_prefix_sum(
        df.withColumn("v", F.lit(1)), ["k"], [F.col("id")], "v", out_col="cum"
    )
    crows = cum.collect()
    cplan = cum._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in cplan or "TableCacheQueryStage" in cplan
    # per-group running count of 1s in id order == per-group rank
    by_k = {}
    for r in sorted(crows, key=lambda r: (r["k"], r["id"])):
        by_k[r["k"]] = by_k.get(r["k"], 0) + 1
        assert r["cum"] == by_k[r["k"]]


def test_proximity_search_degenerate_corpus_returns_empty(spark, tmp_path):
    """A corpus with fewer than two distinct non-empty words has no
    term pair to search: the engine must return an EMPTY frame with the
    declared schema (matching the oracle's NULL scalar subqueries), not
    IndexError on the bounded 2-row collect."""
    from dbt_slabbing_spark.queries import registry

    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        [(1, "hello hello hello", "en", "web", 17), (2, "  hello ", "en", "web", 8)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))

    df = registry()["text_proximity_search"].fn(spark, str(sf))
    assert df.columns == ["doc_id", "term1", "term2", "n_pairs"]
    assert df.count() == 0


def test_rrf_fusion_score_consistent_with_ranks(spark):
    """search_rrf_hybrid_topk: the fused score must equal the RRF
    closed form of the emitted ranks (rank 0 = channel miss contributes
    nothing), every query returns at most 10 rows, and at least one row
    is fused from BOTH channels somewhere (non-vacuous hybrid)."""
    from dbt_slabbing_spark.queries import registry
    from dbt_slabbing_spark.queries.textsearch import RRF_K, RRF_QUERY_TERMS
    from tests.conftest import SF_SMOKE

    rows = registry()["search_rrf_hybrid_topk"].fn(spark, SF_SMOKE).collect()
    assert rows
    per_q: dict[int, int] = {}
    both = 0
    for r in rows:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
        want = (1.0 / (RRF_K + r["rank_text"]) if r["rank_text"] else 0.0) + (
            1.0 / (RRF_K + r["rank_dense"]) if r["rank_dense"] else 0.0
        )
        assert r["rrf_score"] == round(want, 9)
        assert want > 0.0  # a surfaced row came from at least one channel
        both += 1 if (r["rank_text"] and r["rank_dense"]) else 0
    assert set(per_q) <= set(range(len(RRF_QUERY_TERMS)))
    assert all(n <= 10 for n in per_q.values())
    assert both >= 1


def test_dedup_span_removal_hand_built_clones(spark, tmp_path, monkeypatch):
    """text_dedup_span_removal on hand-built docs where every expected
    rebuilt string is written out by hand:

    - d1 and d2 share the 5-gram 'a b c d e'; d1's occurrence is the
      corpus-wide first (min (doc_id, position)) and is KEPT; d2's is
      excised, removing its covered word positions 2..6 -> 'x y'.
    - d3 is too short for any 5-gram: untouched.
    - d4 repeats a 5-gram WITHIN one doc only: df counts DISTINCT
      docs, so an intra-doc repeat is not 'duplicated' and the doc is
      untouched (the Lee et al. signal is cross-document).
    """
    import hashlib

    from dbt_slabbing_spark.queries import registry

    rows = [
        (1, "a b c d e f"),
        (2, "x a b c d e y"),
        (3, "p q r"),
        (4, "m n o p q m n o p q"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in registry()["text_dedup_span_removal"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[1]["n_words"] == 6 and got[1]["n_removed"] == 0
    assert got[1]["rebuilt_md5"] == md5("a b c d e f")
    assert got[2]["n_words"] == 7 and got[2]["n_removed"] == 5
    assert got[2]["rebuilt_md5"] == md5("x y")
    assert got[3]["n_words"] == 3 and got[3]["n_removed"] == 0
    assert got[3]["rebuilt_md5"] == md5("p q r")
    assert got[4]["n_removed"] == 0
    assert got[4]["rebuilt_md5"] == md5("m n o p q m n o p q")


def test_dedup_span_removal_full_doc_excised(spark, tmp_path):
    """A doc that is ENTIRELY a non-first duplicated span rebuilds to
    the empty string (md5('')), with every position removed."""
    import hashlib

    from dbt_slabbing_spark.queries import registry

    rows = [
        (1, "a b c d e tail tail2"),  # first occurrence, kept
        (2, "a b c d e"),  # exactly the duplicated gram: fully excised
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in registry()["text_dedup_span_removal"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got[2]["n_removed"] == 5
    assert got[2]["rebuilt_md5"] == hashlib.md5(b"").hexdigest()
    assert got[1]["n_removed"] == 0
