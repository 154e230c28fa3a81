"""File-level skipping on manifest tables
(`operators/layout.py::file_column_stats` / `prune_file_list` /
`read_table(prune=)`). The registry gate (layout_manifest_prune_read)
hash-checks the end-to-end read; these tests pin the stats mechanics —
footer-derived min/max, sidecar caching, conservative handling of
stat-less files, prune-to-empty schema preservation."""

from __future__ import annotations

import json
import pathlib

import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.operators import layout
from dbt_slabbing_spark.operators.layout import (
    ensure_manifest,
    file_column_stats,
    prune_file_list,
    read_table,
)


@pytest.fixture()
def ranged_table(spark, tmp_path):
    """3 files with disjoint known v-ranges + 1 file whose v is all
    NULL (footer has no usable min/max)."""
    import shutil

    work = tmp_path / "t"
    work.mkdir()
    slices = [(0, 10), (10, 20), (20, 30)]
    for i, (lo, hi) in enumerate(slices):
        df = spark.createDataFrame(
            [(j, float(j)) for j in range(lo, hi)], "k int, v double"
        ).coalesce(1)
        staging = tmp_path / f"s{i}"
        df.write.parquet(str(staging))
        part = sorted(staging.glob("*.parquet"))[0]
        shutil.move(str(part), str(work / f"f{i}.parquet"))
    nulls = spark.createDataFrame(
        [(99, None), (98, None)], "k int, v double"
    ).coalesce(1)
    staging = tmp_path / "sn"
    nulls.write.parquet(str(staging))
    shutil.move(str(sorted(staging.glob("*.parquet"))[0]), str(work / "fnull.parquet"))
    ensure_manifest(work)
    return work


def test_footer_stats_match_data(ranged_table):
    stats = file_column_stats(ranged_table, ["f0.parquet", "f2.parquet"], "v")
    assert stats["f0.parquet"] == (0.0, 9.0)
    assert stats["f2.parquet"] == (20.0, 29.0)


def test_statless_file_is_conservatively_kept(ranged_table):
    live = ensure_manifest(ranged_table)
    kept = prune_file_list(ranged_table, live, "v", 12.0, 14.0)
    # overlap keeps f1; the all-null file has no stats -> kept too
    assert set(kept) == {"f1.parquet", "fnull.parquet"}


def test_pruned_filtered_read_equals_unpruned(spark, ranged_table):
    full = (
        read_table(spark, ranged_table)
        .filter(F.col("v").between(8.0, 22.0))
        .collect()
    )
    pruned = (
        read_table(spark, ranged_table, prune=("v", 8.0, 22.0))
        .filter(F.col("v").between(8.0, 22.0))
        .collect()
    )
    assert sorted(r["k"] for r in pruned) == sorted(r["k"] for r in full)


def test_statless_file_survives_any_prune(spark, ranged_table):
    # a range beyond every statted file still keeps the all-null file
    # (file-level stats can't prove its rows are out of range) — the
    # row filter on top then excludes them, per the superset contract
    df = read_table(spark, ranged_table, prune=("v", 1000.0, 2000.0))
    assert df.count() == 2  # fnull.parquet only
    assert df.filter(F.col("v").between(1000.0, 2000.0)).count() == 0


def test_prune_to_empty_keeps_schema(spark, tmp_path):
    import shutil

    work = tmp_path / "t2"
    work.mkdir()
    df = spark.createDataFrame([(1, 5.0)], "k int, v double").coalesce(1)
    staging = tmp_path / "s"
    df.write.parquet(str(staging))
    shutil.move(str(sorted(staging.glob("*.parquet"))[0]), str(work / "f.parquet"))
    ensure_manifest(work)
    out = read_table(spark, work, prune=("v", 1000.0, 2000.0))
    assert out.count() == 0
    assert set(out.columns) == {"k", "v"}


def test_prune_to_empty_keeps_merged_schema(spark, tmp_path):
    """ADVICE r10: the prune-to-empty branch used to bind its schema
    from the FIRST live file only; under merge_schema=True on a
    schema-evolved table that dropped columns added by later files."""
    import shutil

    work = tmp_path / "t3"
    work.mkdir()
    for i, (schema, row) in enumerate(
        [("k int, v double", (1, 5.0)), ("k int, v double, extra string", (2, 6.0, "x"))]
    ):
        staging = tmp_path / f"s{i}"
        spark.createDataFrame([row], schema).coalesce(1).write.parquet(str(staging))
        shutil.move(
            str(sorted(staging.glob("*.parquet"))[0]), str(work / f"f{i}.parquet")
        )
    ensure_manifest(work)
    out = read_table(spark, work, merge_schema=True, prune=("v", 1000.0, 2000.0))
    assert out.count() == 0
    assert set(out.columns) == {"k", "v", "extra"}


def test_non_json_native_stats_are_conservative(spark, tmp_path):
    """ADVICE r10: timestamp footer min/max are datetime objects —
    non-JSON-native. They must map to entry=None ("may contain
    anything": the file is always kept) instead of crashing the
    sidecar write with TypeError."""
    import datetime
    import shutil

    work = tmp_path / "t4"
    work.mkdir()
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "k int, ts timestamp"
    ).coalesce(1)
    staging = tmp_path / "sts"
    df.write.parquet(str(staging))
    shutil.move(str(sorted(staging.glob("*.parquet"))[0]), str(work / "f.parquet"))
    ensure_manifest(work)
    stats = file_column_stats(work, ["f.parquet"], "ts")
    assert stats == {"f.parquet": None}
    # conservative prune keeps the file; the sidecar stays valid JSON
    assert prune_file_list(work, ["f.parquet"], "ts", 0, 0) == ["f.parquet"]
    sidecar = work / layout._STATS
    assert json.loads(sidecar.read_text())["ts"]["f.parquet"] is None


def test_corrupt_footer_is_statless_not_fatal(ranged_table):
    """ADVICE r10: a corrupt parquet footer raises ArrowInvalid (a
    ValueError subclass the old `except OSError` missed) — it must map
    to entry=None, not crash read_table(prune=)."""
    bad = ranged_table / "fbad.parquet"
    bad.write_bytes(b"PAR1 this is not a real parquet footer")
    stats = file_column_stats(ranged_table, ["fbad.parquet"], "v")
    assert stats == {"fbad.parquet": None}
    assert prune_file_list(ranged_table, ["fbad.parquet"], "v", 0.0, 1.0) == [
        "fbad.parquet"
    ]


def test_sidecar_cache_serves_second_call(ranged_table, monkeypatch):
    live = ensure_manifest(ranged_table)
    file_column_stats(ranged_table, live, "v")  # populate sidecar
    sidecar = pathlib.Path(ranged_table) / layout._STATS
    assert sidecar.exists()
    cached = json.loads(sidecar.read_text())["v"]
    assert cached["f1.parquet"] == [10.0, 19.0]

    import pyarrow.parquet as pq

    def boom(*a, **k):  # any footer re-read would blow up
        raise AssertionError("footer re-read despite warm cache")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    stats = file_column_stats(ranged_table, live, "v")
    assert stats["f0.parquet"] == (0.0, 9.0)
    assert stats["fnull.parquet"] is None


def test_missing_column_is_statless(ranged_table):
    stats = file_column_stats(ranged_table, ["f0.parquet"], "no_such_col")
    assert stats["f0.parquet"] is None


def test_prune_requires_manifest(spark, tmp_path):
    d = tmp_path / "plain"
    spark.range(3).write.parquet(str(d))
    with pytest.raises(ValueError, match="prune= requires"):
        read_table(spark, str(d), prune=("id", 0, 1))


def test_vacuum_drops_stats_entries(spark, ranged_table):
    import os
    import time

    live = ensure_manifest(ranged_table)
    file_column_stats(ranged_table, live, "v")  # warm sidecar
    orphan = pathlib.Path(ranged_table) / "orphan.parquet"
    # give the orphan footer stats too, then age it past the grace
    import shutil

    shutil.copy(str(pathlib.Path(ranged_table) / "f0.parquet"), str(orphan))
    file_column_stats(ranged_table, ["orphan.parquet"], "v")
    old = time.time() - 3600.0
    os.utime(orphan, (old, old))
    removed = layout.vacuum_orphans(ranged_table)
    assert removed == ["orphan.parquet"]
    cache = json.loads((pathlib.Path(ranged_table) / layout._STATS).read_text())
    assert "orphan.parquet" not in cache["v"]
    assert "f0.parquet" in cache["v"]  # live entries survive
