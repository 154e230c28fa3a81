"""Bucketing: pre-shuffled table layout so repeated joins on the bucket
key are exchange-free (SCALE.md join policy; pyspark_guide.md
"Bucketing"). At 100 TB this is the difference between shuffling the
fact table on every join vs once at write time."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def bucketed_tables(spark):
    orders = table(spark, SF_SMOKE, "orders")
    customer = table(spark, SF_SMOKE, "customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("t_orders_bucketed")
    )
    (
        customer.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("t_customer_bucketed")
    )
    yield "t_orders_bucketed", "t_customer_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_customer_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_customer = bucketed_tables
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # force a non-broadcast join so the shuffle question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        joined = (
            spark.table(t_orders)
            .join(spark.table(t_customer), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]  # below the agg: the join subtree
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section[:1500]
        # and it still computes the right thing
        expected = (
            table(spark, SF_SMOKE, "orders")
            .join(table(spark, SF_SMOKE, "customer"), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .count()
        )
        got = {r["c_mktsegment"]: r["n"] for r in joined.collect()}
        exp = {r["c_mktsegment"]: r["count"] for r in expected.collect()}
        assert got == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_mismatched_bucket_counts_fall_back_correctly(spark, tmp_path):
    """Bucketing is a performance contract, not a correctness one: if
    the two sides were written with DIFFERENT bucket counts (a resize
    that touched one table), Spark must fall back to re-shuffling a
    side — results identical to the plain join, never silently wrong."""
    from dbt_slabbing_spark.operators.bucketing import write_bucketed

    orders = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "t_li_b8", "l_orderkey", 8, str(tmp_path / "li8"))
    write_bucketed(orders, "t_ord_b16", "o_orderkey", 16, str(tmp_path / "ord16"))
    try:
        got = (
            spark.table("t_li_b8")
            .join(spark.table("t_ord_b16"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        exp = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        g = {r["o_orderkey"]: r["q"] for r in got.collect()}
        e = {r["o_orderkey"]: r["q"] for r in exp.collect()}
        assert g == e and len(g) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_b8")
        spark.sql("DROP TABLE IF EXISTS t_ord_b16")


def test_auto_bucket_count_rule(tmp_path):
    """Bytes-derived sizing: 8-bucket floor below 32 MB of lineitem,
    core-count ceiling at 128 MB+ — mirroring bench._auto_split_bytes'
    derive-from-data principle."""
    import pathlib

    from dbt_slabbing_spark.operators.bucketing import auto_bucket_count

    mb = 1024 * 1024
    li = pathlib.Path(tmp_path) / "lineitem.parquet"
    for size, want in [(1 * mb, 8), (40 * mb, 10), (200 * mb, 32), (600 * mb, 32)]:
        li.write_bytes(b"\0" * size)
        assert auto_bucket_count(str(tmp_path)) == want, size
    # sandbox scales sit on the floor -> driver bench behavior unchanged
    assert auto_bucket_count("/root/testdata/sf0.1") == 8


def test_bucketed_cache_refreshes_on_regenerated_data(spark, tmp_path):
    """Regenerating testdata in place (a documented driver workflow)
    must NOT serve stale session-catalog tables: the cache key is a
    data fingerprint (mtime/size), so a rewrite mints fresh tables."""
    import os

    from dbt_slabbing_spark.operators.bucketing import ensure_orderkey_bucketed_tables

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    li = table(spark, SF_SMOKE, "lineitem").limit(100)
    orders = table(spark, SF_SMOKE, "orders").limit(50)
    li.write.parquet(f"{sf}/lineitem.parquet")
    orders.write.parquet(f"{sf}/orders.parquet")

    li1, ord1 = ensure_orderkey_bucketed_tables(spark, sf, base_dir=str(tmp_path / "b1"))
    n1 = spark.table(li1).count()
    # same data -> same names (cache hit, no rewrite)
    assert ensure_orderkey_bucketed_tables(spark, sf) == (li1, ord1)

    # "regenerate" in place: different contents, later mtime
    table(spark, SF_SMOKE, "lineitem").limit(40).write.mode("overwrite").parquet(
        f"{sf}/lineitem.parquet"
    )
    li2, ord2 = ensure_orderkey_bucketed_tables(spark, sf, base_dir=str(tmp_path / "b2"))
    assert (li2, ord2) != (li1, ord1)
    assert spark.table(li2).count() == 40 != n1
    for t in (li1, ord1, li2, ord2):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
