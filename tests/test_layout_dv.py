"""Deletion-vector (merge-on-read DELETE) coverage for the manifest
table layer: `delete_rows(mode="dv")`, the DV-applied scan every
consumer shares (`_scan_with_dv`), DV materialization on rewrite
(compact/COW-delete/merge), time travel over DV commits, vacuum
protection of referenced DV parquets, and the `read_changes` fast-path
guard (a DV commit changes rows without changing the file list)."""

from __future__ import annotations

import json
import pathlib

import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.layout import (
    _MANIFEST,
    append_files,
    compact_table,
    delete_rows,
    merge_rows,
    read_changes,
    read_table,
    vacuum_orphans,
)
from tests.conftest import SF_SMOKE


def _manifest(target) -> dict:
    return json.loads((pathlib.Path(target) / _MANIFEST).read_text())


def _identity(target) -> dict:
    return {
        f.name: (f.stat().st_ino, f.stat().st_mtime_ns)
        for f in pathlib.Path(target).glob("*.parquet")
    }


@pytest.fixture()
def events_table(spark, tmp_path):
    """A 4-file manifest table of events rows + the expected content."""
    target = str(tmp_path / "events")
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    for i in range(4):
        append_files(
            spark, target, ev.filter(F.col("event_id") % 4 == i).coalesce(1)
        )
    rows = {r["event_id"]: r for r in ev.collect()}
    return target, rows


def _ids(df) -> set:
    return {r["event_id"] for r in df.select("event_id").collect()}


def test_dv_delete_rewrites_nothing(spark, events_table):
    target, rows = events_table
    before = _identity(target)
    dead = {k for k, r in rows.items() if r["event_type"] == "click"}
    assert dead and len(dead) < len(rows)

    st = delete_rows(spark, target, "event_type = 'click'", mode="dv")
    assert st["rows_before"] == len(rows)
    assert st["rows_deleted"] == len(dead)
    assert st["n_files_rewritten"] == 0
    assert st["n_dv_files_added"] == 1

    after = _identity(target)
    doc = _manifest(target)
    # every pre-existing data file untouched (same inode+mtime), the
    # live list unchanged, exactly one new DV parquet on disk
    assert {n: after[n] for n in before} == before
    assert sorted(doc["files"]) == sorted(before)
    new = set(after) - set(before)
    assert len(new) == 1 and next(iter(new)).startswith("dv-")
    assert set(doc["dv"]) <= set(doc["files"])

    got = _ids(read_table(spark, target))
    assert got == set(rows) - dead


def test_dv_second_delete_unions(spark, events_table):
    target, rows = events_table
    delete_rows(spark, target, "event_type = 'click'", mode="dv")
    st2 = delete_rows(spark, target, "event_type = 'view'", mode="dv")
    dead = {
        k for k, r in rows.items() if r["event_type"] in ("click", "view")
    }
    views = {k for k, r in rows.items() if r["event_type"] == "view"}
    assert st2["rows_deleted"] == len(views)
    assert _ids(read_table(spark, target)) == set(rows) - dead
    # a file hit by both deletes carries BOTH DV parquets
    doc = _manifest(target)
    assert any(len(v) == 2 for v in doc["dv"].values())


def test_dv_delete_already_dead_rows_not_recounted(spark, events_table):
    """Re-running the same predicate deletes zero rows (existing DVs
    are applied to the matching scan) and publishes no commit."""
    target, _rows = events_table
    delete_rows(spark, target, "event_type = 'click'", mode="dv")
    v = _manifest(target)["version"]
    st = delete_rows(spark, target, "event_type = 'click'", mode="dv")
    assert st["rows_deleted"] == 0
    assert st["n_dv_files_added"] == 0
    assert _manifest(target)["version"] == v
    assert list(pathlib.Path(target).glob("dv-*"))  # first DV stays


def test_dv_time_travel_restores_rows(spark, events_table):
    target, rows = events_table
    v_before = _manifest(target)["version"]
    delete_rows(spark, target, "event_type = 'click'", mode="dv")
    assert _ids(read_table(spark, target, version=v_before)) == set(rows)
    # and the post-delete version still excludes them
    v_after = _manifest(target)["version"]
    dead = {k for k, r in rows.items() if r["event_type"] == "click"}
    assert _ids(read_table(spark, target, version=v_after)) == set(rows) - dead


def test_dv_read_changes_reports_row_deletes(spark, events_table):
    """A DV commit keeps the file list identical — the file-level fast
    path is blind to it and MUST NOT claim an empty change set."""
    target, rows = events_table
    v0 = _manifest(target)["version"]
    delete_rows(spark, target, "event_type = 'click'", mode="dv")
    v1 = _manifest(target)["version"]
    ch = read_changes(spark, target, v0, v1).collect()
    dead = {k for k, r in rows.items() if r["event_type"] == "click"}
    assert {r["event_id"] for r in ch if r["_change_type"] == "delete"} == dead
    assert not [r for r in ch if r["_change_type"] == "insert"]


def test_dv_compaction_materializes(spark, events_table):
    target, rows = events_table
    delete_rows(spark, target, "event_type = 'click'", mode="dv")
    dead = {k for k, r in rows.items() if r["event_type"] == "click"}
    compact_table(spark, target, target_file_bytes=1 << 30)
    doc = _manifest(target)
    assert "dv" not in doc  # deletes materialized, mapping cleared
    assert _ids(read_table(spark, target)) == set(rows) - dead
    # the now-unreferenced DV parquet is vacuumable garbage
    removed = vacuum_orphans(target, grace_seconds=0.0)
    assert any(n.startswith("dv-") for n in removed)
    assert _ids(read_table(spark, target)) == set(rows) - dead


def test_dv_vacuum_protects_referenced_dv(spark, events_table):
    target, rows = events_table
    delete_rows(spark, target, "event_type = 'click'", mode="dv")
    removed = vacuum_orphans(target, grace_seconds=0.0)
    assert not any(n.startswith("dv-") for n in removed)
    dead = {k for k, r in rows.items() if r["event_type"] == "click"}
    assert _ids(read_table(spark, target)) == set(rows) - dead


def test_dv_cow_delete_applies_and_clears(spark, events_table):
    """A copy-on-write DELETE on a DV'd table counts live rows only and
    materializes the rewritten files' DVs (their entries drop)."""
    target, rows = events_table
    st1 = delete_rows(spark, target, "event_type = 'click'", mode="dv")
    live_after_dv = st1["rows_after"]
    st2 = delete_rows(spark, target, "event_type = 'view'")  # cow
    views = {k for k, r in rows.items() if r["event_type"] == "view"}
    assert st2["rows_before"] == live_after_dv
    assert st2["rows_deleted"] == len(views)
    dead = {
        k for k, r in rows.items() if r["event_type"] in ("click", "view")
    }
    assert _ids(read_table(spark, target)) == set(rows) - dead
    # files rewritten by the COW pass shed their DV entries
    doc = _manifest(target)
    for n in doc.get("dv", {}):
        assert n in doc["files"]


def test_dv_merge_respects_dead_rows(spark, events_table):
    """MERGE on a DV'd table: a dead row neither matches nor survives
    the rewrite (no resurrection)."""
    target, rows = events_table
    some_click = next(
        k for k, r in rows.items() if r["event_type"] == "click"
    )
    delete_rows(spark, target, "event_type = 'click'", mode="dv")
    src = spark.createDataFrame(
        [(some_click, 7, "merged", 42.0), (-5, 999, "inserted", 1.0)],
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    st = merge_rows(spark, target, src, on="event_id")
    # the dead click row is NOT a live match: its key INSERTS fresh
    assert st["rows_updated"] == 0
    assert st["rows_inserted"] == 2
    out = {r["event_id"]: r for r in read_table(spark, target).collect()}
    assert out[some_click]["event_type"] == "merged"
    assert out[-5]["event_type"] == "inserted"
    dead = {
        k for k, r in rows.items() if r["event_type"] == "click"
    } - {some_click}
    assert set(out) == (set(rows) - dead - {some_click}) | {some_click, -5}


def test_dv_delete_matching_nothing_is_noop(spark, events_table):
    target, _rows = events_table
    v = _manifest(target)["version"]
    st = delete_rows(spark, target, "event_type = 'no_such_type'", mode="dv")
    assert st["rows_deleted"] == 0 and st["n_dv_files_added"] == 0
    assert _manifest(target)["version"] == v
    assert not list(pathlib.Path(target).glob("dv-*"))


def test_dv_read_with_prune_still_exact(spark, events_table):
    """File skipping composes with DVs: prune keeps a superset of
    files, the DV anti-join still drops dead rows from kept files."""
    target, rows = events_table
    delete_rows(spark, target, "event_type = 'click'", mode="dv")
    lo = min(r["user_id"] for r in rows.values())
    got = _ids(
        read_table(spark, target, prune=("user_id", lo, lo + 5)).filter(
            F.col("user_id").between(lo, lo + 5)
        )
    )
    want = {
        k
        for k, r in rows.items()
        if lo <= r["user_id"] <= lo + 5 and r["event_type"] != "click"
    }
    assert got == want


def test_dv_over_inline_cap_takes_anti_join(spark, events_table, monkeypatch):
    """DVs past the inline cap switch from the NOT-IN literal filter
    to the broadcast anti-join — same answer, different plan branch."""
    from dbt_slabbing_spark.operators import layout

    target, rows = events_table
    monkeypatch.setattr(layout, "_DV_INLINE_CAP", 3)  # force the branch
    dead = {k for k, r in rows.items() if r["event_type"] in ("click", "view")}
    assert len(dead) > 3
    st = delete_rows(
        spark, target, "event_type IN ('click', 'view')", mode="dv"
    )
    assert st["rows_deleted"] == len(dead)
    assert _ids(read_table(spark, target)) == set(rows) - dead
    # the executed plan really contains the anti-join, not the INSET
    plan = read_table(spark, target)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "INSET" not in plan
