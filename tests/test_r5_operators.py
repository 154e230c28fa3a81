"""Round-5 operator unit tests: grouped prefix sum, minhash array form."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_grouped_prefix_sum_equals_window_cumsum(spark):
    """The distributed two-pass prefix sum must equal the single-task
    per-group window cumsum it replaces, on any partitioning."""
    from dbt_slabbing_spark.operators.ordering import grouped_prefix_sum

    rows = [(g, i, (i * 7 + ord(g)) % 13) for g in ("a", "b", "c") for i in range(211)]
    df = spark.createDataFrame(rows, "g string, i long, v long").repartition(7)
    got = {
        (r["g"], r["i"]): r["cum"]
        for r in grouped_prefix_sum(df, ["g"], [F.col("i")], "v", "cum").collect()
    }
    w = Window.partitionBy("g").orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["g"], r["i"]): r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want and len(got) == 633


def test_grouped_prefix_sum_preserves_caller_columns(spark):
    from dbt_slabbing_spark.operators.ordering import grouped_prefix_sum

    df = spark.createDataFrame([("a", 1, 2, 9)], "g string, i long, v long, extra long")
    out = grouped_prefix_sum(df, ["g"], [F.col("i")], "v", "cum")
    assert set(out.columns) == {"g", "i", "v", "extra", "cum"}


def test_minhash_array_form_matches_agg_form(spark):
    """minhash_sig_from_ab (stateless streaming form) must be
    bit-identical to minhash_signatures (batch agg form)."""
    from dbt_slabbing_spark.operators.hashing import (
        minhash_ab_pairs,
        minhash_sig_from_ab,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    agg = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs, "doc_id", "text").collect()
    }
    arr = {
        r["doc_id"]: list(r["sig"])
        for r in (
            docs.select("doc_id", minhash_ab_pairs(F.col("text")).alias("_ab"))
            .select("doc_id", minhash_sig_from_ab(F.col("_ab")).alias("sig"))
            .filter(F.col("sig").isNotNull())
            .collect()
        )
    }
    assert agg == arr and len(agg) > 100


def test_gopher_rules_ground_truth(spark, tmp_path):
    """Hand-built docs exercising each Gopher rule branch."""
    import pandas as pd

    from dbt_slabbing_spark.queries import registry

    good = "the quick brown fox jumps over a lazy dog near the old stone bridge " * 5
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                good,                                   # passes everything
                "short doc only",                       # n_words < 50
                "- one\n- two\n- three",                # all bullet lines
                good + " ###### " * 20,                 # symbol ratio >= 0.1
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(good), 14, 19, 1],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    rows = {
        r["doc_id"]: r.asDict()
        for r in registry()["text_gopher_quality_filters"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[0]["keep"] is True
    assert rows[1]["keep"] is False and rows[1]["n_words"] == 3
    assert rows[2]["keep"] is False and rows[2]["bullet_line_frac"] == 1.0
    assert rows[3]["keep"] is False and rows[3]["symbol_word_ratio"] >= 0.1


def test_line_dedup_ground_truth(spark, tmp_path):
    """First occurrence wins globally; rebuilt text drops later dupes."""
    import hashlib

    import pandas as pd

    from dbt_slabbing_spark.queries import registry

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["alpha\nshared line\nbeta", "shared line\ngamma"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [22, 17],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    rows = {
        r["doc_id"]: r.asDict()
        for r in registry()["text_line_dedup"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[0]["n_kept"] == 3 and rows[0]["n_dropped"] == 0
    assert rows[1]["n_kept"] == 1 and rows[1]["n_dropped"] == 1
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows[0]["rebuilt_md5"] == md5("alpha\nshared line\nbeta")
    assert rows[1]["rebuilt_md5"] == md5("gamma")


def test_mixture_rebalance_budget_semantics(spark):
    """Rates clamp at 1 (small sources keep everything) and kept tokens
    never exceed the source's total; every source appears."""
    from dbt_slabbing_spark.queries import registry
    from tests.conftest import SF_SMOKE

    rows = registry()["sample_mixture_rebalance"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r["rate"] <= 1.0
        assert r["tokens_kept"] <= r["tokens_total"]
        assert r["n_kept"] <= r["n_docs"]
        if r["rate"] == 1.0:
            assert r["n_kept"] == r["n_docs"]


def test_ccnet_buckets_are_ordered_terciles(spark):
    """Within each language every head score <= every middle score <=
    every tail score, and the three buckets are within one doc of a
    third each (ties can cross the boundary)."""
    from collections import defaultdict

    from dbt_slabbing_spark.queries import registry
    from tests.conftest import SF_SMOKE

    by_lang = defaultdict(lambda: defaultdict(list))
    for r in registry()["text_ccnet_surprisal_buckets"].fn(spark, SF_SMOKE).collect():
        by_lang[r["lang"]][r["bucket"]].append(r["mean_surprisal"])
    assert by_lang
    for lang, buckets in by_lang.items():
        h, m, t = buckets.get("head", []), buckets.get("middle", []), buckets.get("tail", [])
        if h and m:
            assert max(h) <= min(m), lang
        if m and t:
            assert max(m) <= min(t), lang


def test_funnel_stage_attribution(spark, tmp_path):
    """Every funnel stage attributes correctly, including exact_dup
    (absent from the synthetic corpus, so proven on hand-built docs):
    an exact clone dies at exact_dup, a near-clone at near_dup, a
    short doc at length, a one-word-repeated doc at repetition."""
    import pandas as pd

    from dbt_slabbing_spark.queries import registry

    base = " ".join(f"tok{i}" for i in range(40))
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                base,                       # kept (first occurrence)
                base,                       # exact clone -> exact_dup
                base + " extraword",        # near clone -> near_dup
                "tiny doc",                 # -> length
                "same " * 30,               # -> repetition
            ],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [1] * 5,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        r["doc_id"]: r["verdict"]
        for r in registry()["pipeline_quality_funnel"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {0: "kept", 1: "exact_dup", 2: "near_dup", 3: "length", 4: "repetition"}


def test_funnel_exercises_every_live_stage_on_corpus(spark):
    """On the driver corpus the funnel's non-vacuous stages all fire:
    length, repetition and near_dup drops exist and the majority is
    kept (exact_dup is legitimately zero — the corpus has no exact
    duplicate above the length floor)."""
    from dbt_slabbing_spark.queries import registry
    from tests.conftest import SF_SMOKE

    counts = {
        r["verdict"]: r["count"]
        for r in registry()["pipeline_quality_funnel"]
        .fn(spark, SF_SMOKE)
        .groupBy("verdict")
        .count()
        .collect()
    }
    assert counts.get("length", 0) > 0
    assert counts.get("repetition", 0) > 0
    assert counts.get("near_dup", 0) > 0
    assert counts["kept"] > sum(v for k, v in counts.items() if k != "kept")
