"""Bucketed table layout: pre-shuffle facts on their join key at WRITE
time so every subsequent join/aggregation on that key is exchange-free.

This is the layout decision that converts q3's one mandatory runtime
shuffle (BASELINE.md's round-4 stage decomposition attributes q3's
whole residual gap to it) into a cost paid once at ingest: lineitem
bucketed by l_orderkey and orders by o_orderkey, same bucket count, and
the q3 plan needs ZERO shuffle exchanges —

- the per-order revenue aggregation groups on the bucket key, so the
  HashAggregate runs directly on the scan partitioning;
- the fact-to-fact sort-merge join sees both sides hash-partitioned
  compatibly (HashPartitioning(l_orderkey, n) == required
  HashPartitioning(o_orderkey, n) through the join equality), so
  neither side re-shuffles — only within-partition sorts remain;
- the top-10 is a TakeOrderedAndProject (no range exchange).

At 100 TB the same decision is bucketed (or Iceberg/Delta
cluster-keyed) fact tables: the shuffle that dominates every
order-keyed query is paid once, at write, amortized over every
downstream read. tests/test_bucketing.py proves the bare mechanism;
``q3_shipping_priority_bucketed`` (queries/bucketed.py) is the full
headline query on top of it, plan-guarded in test_plan_quality.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int, path: str
) -> None:
    """Write ``df`` as an external bucketed+sorted table at ``path``.

    Bucketing metadata lives in the session catalog (path-based parquet
    reads can't know the layout), so this registers ``name`` pointing
    at ``path``; mode=overwrite makes it idempotent per session.
    """
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def ensure_orderkey_bucketed_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8, base_dir: str | None = None
) -> tuple[str, str]:
    """(lineitem_table, orders_table) bucketed on the order key for
    ``sf_dir``, creating them on first use (names are sf_dir-keyed so
    different scale factors coexist in one session catalog)."""
    from ..catalog import table

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    li_name = f"lineitem_bkt_{tag}"
    ord_name = f"orders_bkt_{tag}"
    if not (spark.catalog.tableExists(li_name) and spark.catalog.tableExists(ord_name)):
        if base_dir is None:
            import tempfile

            base_dir = tempfile.mkdtemp(prefix="dbt_slabbing_bucketed_")
        write_bucketed(
            table(spark, sf_dir, "lineitem"),
            li_name,
            "l_orderkey",
            n_buckets,
            f"{base_dir}/{li_name}",
        )
        write_bucketed(
            table(spark, sf_dir, "orders"),
            ord_name,
            "o_orderkey",
            n_buckets,
            f"{base_dir}/{ord_name}",
        )
    return li_name, ord_name
