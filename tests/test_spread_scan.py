"""Focused tests for catalog.table(spread=) — the guide-§2.5
unsplittable-input fix (r14 optimization round).

The local testdata parquet files carry ONE row group, so every scan is a
single non-empty task regardless of split size; spread redistributes the
rows right after the read so per-row-compute-heavy pipelines can use the
cores — and must be a NO-OP whenever the input can already feed them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import _parse_bytes, scan_slices, table
from tests.conftest import SF_SMOKE


def test_parse_bytes_forms():
    assert _parse_bytes("2097152") == 2097152
    assert _parse_bytes("128m") == 128 * 1024**2
    assert _parse_bytes("134217728b") == 134217728
    assert _parse_bytes("1g") == 1024**3


def test_scan_slices_single_row_group_file():
    # every testdata file is written as one row group → one slice,
    # whatever the split size says
    assert scan_slices(SF_SMOKE, "documents", 2 * 1024**2) == 1
    assert scan_slices(SF_SMOKE, "lineitem", 2 * 1024**2) == 1


def test_scan_slices_directory_assumed_well_split(tmp_path):
    # a directory table (or missing path) must NOT trigger spread
    assert scan_slices(str(tmp_path), "nope", 2 * 1024**2) >= 1 << 30


def test_spread_adds_exchange_and_preserves_content(spark):
    plain = table(spark, SF_SMOKE, "documents")
    rr = table(spark, SF_SMOKE, "documents", spread=True)
    keyed = table(spark, SF_SMOKE, "documents", spread=("doc_id",))
    plan_rr = rr._jdf.queryExecution().executedPlan().toString()
    plan_keyed = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan_rr
    assert "hashpartitioning(doc_id" in plan_keyed
    # content identical, parallelism unlocked
    assert rr.rdd.getNumPartitions() > 1
    assert sorted(r.doc_id for r in rr.select("doc_id").collect()) == sorted(
        r.doc_id for r in plain.select("doc_id").collect()
    )


def test_spread_keyed_satisfies_downstream_groupby(spark):
    # a groupBy on the spread key must need no second exchange
    df = table(spark, SF_SMOKE, "documents", spread=("doc_id",))
    agg = df.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:2000]


def test_spread_noop_when_input_feeds_cores(spark):
    # force the session's view of the input to "well-split" by dropping
    # the parallelism floor below the slice count
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        df = table(spark, SF_SMOKE, "documents", spread=True)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "spread must be a no-op when slices >= target"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
