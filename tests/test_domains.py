"""Domain-level curation (operators/domains.py): URL keying, blocklist
anti-join, per-domain count cap (WindowGroupLimit plan shape), and the
grouped-prefix-sum char budget."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.domains import (
    blocklist_filter,
    cap_chars_per_domain,
    cap_docs_per_domain,
    url_domain,
)
from tests.conftest import SF_SMOKE


def test_url_domain_keying(spark):
    """The production keying step: host extraction, lowercasing,
    www-strip, ports/paths/queries ignored, invalid → NULL."""
    rows = spark.createDataFrame(
        [
            ("https://www.Example.COM/path?q=1",),
            ("http://sub.example.org:8080/a/b",),
            ("https://example.net",),
            ("not a url",),
            (None,),
        ],
        "url string",
    ).select(url_domain(F.col("url")).alias("d")).collect()
    assert [r["d"] for r in rows] == [
        "example.com",
        "sub.example.org",
        "example.net",
        None,
        None,
    ]


def test_blocklist_filter_is_broadcast_anti_join(spark):
    docs = table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.col("source").alias("domain")
    )
    bl = spark.createDataFrame([("src1",), ("src2",)], "domain string")
    out = blocklist_filter(docs, "domain", bl)
    assert out.filter(F.col("domain").isin("src1", "src2")).count() == 0
    n_blocked = docs.filter(F.col("domain").isin("src1", "src2")).count()
    assert out.count() == docs.count() - n_blocked and n_blocked > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_cap_docs_per_domain_keeps_first_by_order_and_plans_group_limit(spark):
    docs = table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.col("source").alias("domain"), "n_chars"
    )
    capped = cap_docs_per_domain(docs, "domain", 5, [F.desc("n_chars"), F.asc("doc_id")])
    got = {
        d: sorted((r["n_chars"], r["doc_id"]) for r in rows)
        for d, rows in _group_by(capped.collect(), "domain").items()
    }
    want_src = _group_by(docs.collect(), "domain")
    for d, rows in want_src.items():
        top5 = sorted(((-r["n_chars"], r["doc_id"]) for r in rows))[:5]
        want = sorted((-neg, did) for neg, did in top5)
        assert got[d] == want, d
    # the rank filter must compile to WindowGroupLimit (map-side
    # pre-prune before the window shuffle) — the 100 TB mega-domain story
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_cap_chars_per_domain_prefix_budget(spark):
    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 150), (3, "a", 100), (4, "b", 400), (5, "b", 50)],
        "doc_id int, domain string, w int",
    )
    kept = {
        r["doc_id"]
        for r in cap_chars_per_domain(df, "domain", 250, "w", [F.asc("doc_id")]).collect()
    }
    # a: 100, 250 -> kept; 350 over. b: 400 over immediately (even > budget alone).
    assert kept == {1, 2}


def _group_by(rows, key):
    out = {}
    for r in rows:
        out.setdefault(r[key], []).append(r)
    return out
