"""Metadata-only column rename (column mapping): `rename_column` maps
a logical name onto the frozen physical column in one manifest commit —
no data file is rewritten — and every reader/writer translates at the
scan/write boundary, so renames compose with appends, DELETE (both
modes), MERGE, stats pruning, bloom lookups and CDF."""

from __future__ import annotations

import json
import pathlib

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.layout import (
    _MANIFEST,
    add_constraint,
    append_files,
    create_bloom_index,
    delete_rows,
    manifest_versions,
    merge_rows,
    prune_file_list,
    prune_files_bloom,
    read_changes,
    read_table,
    rename_column,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_table(spark, tmp_path):
    target = str(tmp_path / "events")
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    for i in range(4):
        append_files(
            spark, target, ev.filter(F.col("user_id") % 4 == i).coalesce(1)
        )
    rows = {r["event_id"]: r for r in ev.collect()}
    return target, rows


def _identity(target):
    return {
        f.name: (f.stat().st_ino, f.stat().st_mtime_ns)
        for f in pathlib.Path(target).glob("*.parquet")
    }


def test_rename_is_metadata_only(spark, events_table):
    target, rows = events_table
    before = _identity(target)
    st = rename_column(target, "event_type", "kind")
    assert st["physical"] == "event_type"
    assert _identity(target) == before  # zero files touched
    got = read_table(spark, target)
    assert "kind" in got.columns and "event_type" not in got.columns
    assert {r["event_id"]: r["kind"] for r in got.collect()} == {
        k: r["event_type"] for k, r in rows.items()
    }


def test_rename_then_append_keeps_physical_schema(spark, events_table):
    target, rows = events_table
    rename_column(target, "event_type", "kind")
    extra = spark.createDataFrame(
        [(-1, 9, "fresh", 1.0)],
        "event_id bigint, user_id bigint, kind string, value double",
    )
    append_files(spark, target, extra.coalesce(1))
    # every file — including the new one — physically carries the
    # FROZEN name: no schema fork across rename generations
    doc = json.loads((pathlib.Path(target) / _MANIFEST).read_text())
    names = set()
    for n in doc["files"]:
        names |= set(pq.ParquetFile(str(pathlib.Path(target) / n)).schema_arrow.names)
    assert "event_type" in names and "kind" not in names
    got = read_table(spark, target)
    assert got.filter(F.col("kind") == "fresh").count() == 1
    assert got.count() == len(rows) + 1


def test_rename_composes_with_delete_and_merge(spark, events_table):
    target, rows = events_table
    rename_column(target, "event_type", "kind")
    st = delete_rows(spark, target, "kind = 'click'", mode="dv")
    dead = {k for k, r in rows.items() if r["event_type"] == "click"}
    assert st["rows_deleted"] == len(dead)
    some = next(iter(set(rows) - dead))
    src = spark.createDataFrame(
        [(some, 7, "merged", 42.0)],
        "event_id bigint, user_id bigint, kind string, value double",
    )
    merge_rows(spark, target, src, on="event_id")
    out = {r["event_id"]: r for r in read_table(spark, target).collect()}
    assert set(out) == set(rows) - dead
    assert out[some]["kind"] == "merged"


def test_rename_keeps_stats_prune_and_bloom(spark, events_table):
    target, rows = events_table
    create_bloom_index(spark, target, "user_id")
    rename_column(target, "user_id", "uid")
    live = sorted(
        json.loads((pathlib.Path(target) / _MANIFEST).read_text())["files"]
    )
    # stats prune translates the logical name to the physical footer key
    lo = min(r["user_id"] for r in rows.values())
    assert prune_file_list(target, live, "uid", lo, lo)  # non-crashing, keeps some
    # the bloom config + sidecar were re-keyed with the rename
    probe = lo
    kept = prune_files_bloom(spark, target, live, "uid", probe)
    assert len(kept) == 1
    got = read_table(spark, target, point=("uid", probe)).filter(
        F.col("uid") == probe
    )
    assert got.count() == len([1 for r in rows.values() if r["user_id"] == probe])


def test_rename_chains_and_guards(spark, events_table):
    target, _rows = events_table
    rename_column(target, "event_type", "kind")
    rename_column(target, "kind", "etype")  # chain keeps ONE physical
    doc = json.loads((pathlib.Path(target) / _MANIFEST).read_text())
    assert doc["column_map"] == {"etype": "event_type"}
    assert "etype" in read_table(spark, target).columns
    with pytest.raises(ValueError, match="already exists"):
        rename_column(target, "value", "etype")
    with pytest.raises(ValueError, match="same name"):
        rename_column(target, "value", "value")
    add_constraint(spark, target, "v_nonneg", "value >= 0")
    with pytest.raises(ValueError, match="constraint"):
        rename_column(target, "value", "amount")


def test_rename_only_commit_diffs_empty(spark, events_table):
    """CDF across a rename-only commit: row content is unchanged, so
    the row-level diff is EMPTY (names are table-level metadata)."""
    target, _rows = events_table
    v0 = manifest_versions(target)[-1]
    rename_column(target, "event_type", "kind")
    v1 = manifest_versions(target)[-1]
    assert read_changes(spark, target, v0, v1).count() == 0


def test_drop_column_metadata_only(spark, events_table):
    from dbt_slabbing_spark.operators.layout import drop_column

    target, rows = events_table
    before = _identity(target)
    st = drop_column(target, "event_type")
    assert st["physical"] == "event_type"
    assert _identity(target) == before  # zero files touched
    got = read_table(spark, target)
    assert "event_type" not in got.columns
    assert got.count() == len(rows)
    with pytest.raises(ValueError, match="already dropped"):
        drop_column(target, "event_type")
    # appends may omit the dropped column; reads stay unified
    extra = spark.createDataFrame(
        [(-1, 9, 1.0)], "event_id bigint, user_id bigint, value double"
    )
    append_files(spark, target, extra.coalesce(1))
    assert read_table(spark, target, merge_schema=True).count() == len(rows) + 1


def test_drop_renamed_column_resolves_physical(spark, events_table):
    from dbt_slabbing_spark.operators.layout import drop_column

    target, _rows = events_table
    rename_column(target, "event_type", "kind")
    st = drop_column(target, "kind")
    assert st["physical"] == "event_type"
    got = read_table(spark, target)
    assert "kind" not in got.columns and "event_type" not in got.columns


def test_drop_column_guards(spark, events_table):
    from dbt_slabbing_spark.operators.layout import drop_column

    target, _rows = events_table
    add_constraint(spark, target, "v_nonneg", "value >= 0")
    with pytest.raises(ValueError, match="constraint"):
        drop_column(target, "value")
    create_bloom_index(spark, target, "user_id")
    with pytest.raises(ValueError, match="bloom"):
        drop_column(target, "user_id")
