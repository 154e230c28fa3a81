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


def auto_bucket_count(sf_dir: str) -> int:
    """Bucket count derived from the data, not hand-tuned per scale —
    the same bytes-derived sizing idea as bench.py::_auto_split_bytes.

    Rule: lineitem bytes / 4 MB, clamped to [8, 32]. Rationale: on the
    zero-exchange bucketed plans the bucket count IS the post-scan
    parallelism, so it should reach the core count as soon as
    per-bucket work dominates per-task fixed cost (~4 MB/bucket);
    below that, more buckets just add task overhead and small files.
    Reproduces the measured optima: sf0.1 (lineitem ~11 MB) → the
    8-bucket floor (byte-identical driver bench behavior); sf3
    (~552 MB) → 32, the manual setting that turned the round-7 A/B
    from a wash into −21%; sf1 (~184 MB) → 32, un-capping the 8-bucket
    3.8× crossover the round-7 verdict flagged. At 100 TB the same
    rule targets file-count/size budgets instead (buckets of
    ~128-512 MB per partition-writer), but the principle — derive the
    count from bytes at write time — is the operator's contract.
    """
    import pathlib

    li = pathlib.Path(sf_dir) / "lineitem.parquet"
    mb = 1024 * 1024
    size = li.stat().st_size if li.exists() else 0
    return int(min(max(size // (4 * mb), 8), 32))


def _data_fingerprint(sf_dir: str) -> str:
    """sf_dir + (mtime_ns, size) of the bucketed sources: regenerating
    testdata in place (a documented driver workflow) changes the
    fingerprint, so cached session-catalog tables can't serve stale
    data — the new tag simply creates fresh tables."""
    import pathlib

    parts = [sf_dir]
    for t in ("lineitem", "orders"):
        f = pathlib.Path(sf_dir) / f"{t}.parquet"
        st = f.stat() if f.exists() else None
        parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}" if st else f"{t}:absent")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def ensure_orderkey_bucketed_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int | None = None, base_dir: str | None = None
) -> tuple[str, str]:
    """(lineitem_table, orders_table) bucketed on the order key for
    ``sf_dir``, creating them on first use. Names are keyed on the
    DATA fingerprint (sf_dir + source file mtime/size), so different
    scale factors coexist in one session catalog and an in-place
    testdata regeneration gets fresh tables instead of stale cache.
    ``n_buckets`` defaults to :func:`auto_bucket_count`.

    Lifetime: tables live in the session catalog; their parquet lives
    in a mkdtemp dir that persists until the OS tempdir is cleaned —
    deliberate for a bench/driver session (the one-time write is the
    point of the layout), bounded by the handful of (sf, generation)
    pairs a session touches.
    """
    from ..catalog import table

    if n_buckets is None:
        n_buckets = auto_bucket_count(sf_dir)
    # bucket count is part of the identity: an A/B of two layouts of the
    # same data must not collide on one cached table
    tag = f"{_data_fingerprint(sf_dir)}_{n_buckets}"
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
