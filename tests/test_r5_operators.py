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
