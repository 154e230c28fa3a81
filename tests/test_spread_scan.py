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


def test_parse_bytes_two_letter_suffixes_and_fail_open():
    # Spark size confs legally carry kb/mb/gb/tb/pb — these crashed the
    # r14 parser ('128m' stripped only the trailing 'b') (VERDICT r14
    # What's-wrong #3)
    assert _parse_bytes("128mb") == 128 * 1024**2
    assert _parse_bytes("512kb") == 512 * 1024
    assert _parse_bytes("1gb") == 1024**3
    assert _parse_bytes("2tb") == 2 * 1024**4
    assert _parse_bytes("1pb") == 1024**5
    assert _parse_bytes("3t") == 3 * 1024**4
    # unparseable → 0 (scan_slices clamps the divisor; gate decided by
    # row groups alone) instead of ValueError on the hot read path
    assert _parse_bytes("auto") == 0
    assert _parse_bytes("b") == 0


def test_spread_gate_stays_off_on_multi_row_group_parquet(spark, tmp_path):
    # VERDICT r14 #10: the "no-op at scale" claim as a regression test —
    # write a well-split twin of documents (many row groups) and assert
    # the gate stays OFF and the scale plan shape (no spread exchange)
    # survives on REAL multi-row-group parquet, not just by argument.
    import pyarrow.parquet as pq

    src = f"{SF_SMOKE}/documents.parquet"
    twin = tmp_path / "documents.parquet"
    t = pq.ParquetFile(src).read()
    rows_per_group = max(1, t.num_rows // 16)
    pq.write_table(t, str(twin), row_group_size=rows_per_group)
    n_rg = pq.ParquetFile(str(twin)).metadata.num_row_groups
    assert n_rg >= 16
    # slices = min(row groups, size splits); with a tiny split size the
    # row-group count is the binding bound and exceeds any local target
    assert scan_slices(str(tmp_path), "documents", 1) == n_rg
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # small split size so the size-based bound doesn't collapse the
        # tiny test file to one split (at scale files dwarf the split)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_rg))
        df = table(spark, str(tmp_path), "documents", spread=True)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (
            "spread must no-op on a well-split input: " + plan[:500]
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_split)


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
