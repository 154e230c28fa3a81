"""Misra-Gries heavy hitters (operators/heavyhitters.py): the classic
counter dynamics on a hand stream, the capacity merge, and the
mergeable-summaries guarantees — including the TIGHT error bound
(n − Σest)/(k+1) the gate's looser n/(k+1) verdict derives from —
checked against exact counts on the real corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.heavyhitters import (
    _mg_feed,
    mg_merge,
    misra_gries,
)
from dbt_slabbing_spark.queries import registry
from tests.conftest import SF_SMOKE


def test_mg_feed_classic_dynamics():
    c: dict[str, int] = {}
    _mg_feed(c, ["a", "a", "b", "c"], k=2)
    # a:2, b:1 full; c decrements both (b dies) and is discarded
    assert c == {"a": 1}
    _mg_feed(c, ["d", "d", "d"], k=2)
    assert c == {"a": 1, "d": 3}


def test_mg_merge_subtracts_k_plus_first_largest():
    combined = [("a", 10), ("b", 7), ("c", 4), ("d", 2)]
    assert mg_merge(combined, k=2) == {"a": 6, "b": 3}  # t = 4
    assert mg_merge(combined, k=8) == {"a": 10, "b": 7, "c": 4, "d": 2}


def test_mg_guarantees_against_exact_counts_on_corpus(spark):
    k = 16
    words = (
        table(spark, SF_SMOKE, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    summary = misra_gries(words, "word", k)
    assert 0 < len(summary) <= k
    exact = {
        r["word"]: r["c"]
        for r in words.groupBy("word").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(exact.values())
    slack = (n - sum(summary.values())) / (k + 1)  # tight bound
    for w, est in summary.items():
        assert est <= exact[w], w
        assert exact[w] - est <= slack, w
    for w, cnt in exact.items():
        if cnt * (k + 1) > n:
            assert w in summary, (w, cnt)


def test_mg_gate_verdicts_all_true_and_nonvacuous(spark):
    rows = registry()["agg_heavy_hitters_mg"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["in_summary"] and r["est_le_true"] and r["within_bound"], r
