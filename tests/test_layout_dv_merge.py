"""Merge-on-read MERGE via deletion vectors (`merge_rows(mode="dv")`):
zero data-file rewrites, row-identical to the copy-on-write twin,
crash windows leave only vacuum-able orphans, OPTIMIZE materializes,
and CDF pairs pre/post images across the DV+append shape."""

from __future__ import annotations

import json
import pathlib

import pytest
from pyspark.sql import functions as F

import dbt_slabbing_spark.operators.layout as L
from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.layout import (
    _MANIFEST,
    append_files,
    compact_table,
    delete_rows,
    manifest_versions,
    merge_rows,
    read_changes,
    read_table,
    vacuum_orphans,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def twin_tables(spark, tmp_path):
    ev = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    targets = []
    for sub in ("dv", "cow"):
        t = str(tmp_path / sub)
        for i in range(4):
            append_files(
                spark, t, ev.filter(F.col("user_id") % 4 == i).coalesce(1)
            )
        targets.append(t)
    updates = ev.filter(F.col("event_id") % 5 == 0).withColumn(
        "value", F.col("value") + 1000.0
    )
    inserts = (
        ev.filter(F.col("event_id") % 5 == 2)
        .withColumn("event_id", F.col("event_id") + 1_000_000_000)
    )
    src = updates.unionByName(inserts)
    return targets[0], targets[1], ev, src


def _data_file_identity(target):
    return {
        f.name: (f.stat().st_ino, f.stat().st_mtime_ns)
        for f in pathlib.Path(target).glob("append-*.parquet")
    }


def test_dv_merge_zero_rewrites_and_matches_cow(spark, twin_tables):
    t_dv, t_cow, ev, src = twin_tables
    ident_before = _data_file_identity(t_dv)
    st = merge_rows(spark, t_dv, src, on="event_id", mode="dv")
    merge_rows(spark, t_cow, src, on="event_id", mode="cow")
    # the original data files are byte-untouched
    assert _data_file_identity(t_dv) == ident_before
    assert st["n_files_rewritten"] == 0
    assert st["n_dv_files_added"] == 1
    n_upd = ev.filter(F.col("event_id") % 5 == 0).count()
    n_ins = ev.filter(F.col("event_id") % 5 == 2).count()
    assert st["rows_updated"] == n_upd
    assert st["rows_inserted"] == n_ins
    assert st["rows_after"] == st["rows_before"] + n_ins
    got, twin = read_table(spark, t_dv), read_table(spark, t_cow)
    assert got.exceptAll(twin).count() == 0
    assert twin.exceptAll(got).count() == 0


def test_dv_merge_crash_before_commit_is_invisible(
    spark, twin_tables, monkeypatch
):
    t_dv, _, ev, src = twin_tables
    before = read_table(spark, t_dv).collect()
    real_commit = L._commit_manifest

    def crashing(*a, **kw):
        raise RuntimeError("simulated crash at the commit point")

    monkeypatch.setattr(L, "_commit_manifest", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_rows(spark, t_dv, src, on="event_id", mode="dv")
    monkeypatch.setattr(L, "_commit_manifest", real_commit)
    # staged DV + insert files exist but are invisible orphans
    p = pathlib.Path(t_dv)
    staged = list(p.glob("dv-*.parquet")) + list(p.glob("part-merge-*.parquet"))
    assert staged, "crash should leave staged files on disk"
    doc = json.loads((p / _MANIFEST).read_text())
    assert "dv" not in doc or not doc["dv"]
    after = read_table(spark, t_dv).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
    # vacuum reclaims the orphans
    removed = vacuum_orphans(t_dv, retain_versions=0, grace_seconds=0.0)
    assert {f.name for f in staged} <= set(removed)


def test_dv_merge_conflict_raises_before_publish(
    spark, twin_tables, monkeypatch
):
    t_dv, _, ev, src = twin_tables
    before = read_table(spark, t_dv).count()
    real_commit = L._commit_manifest

    def conflicted(*a, **kw):
        raise L.ManifestConflictError("simulated concurrent commit")

    monkeypatch.setattr(L, "_commit_manifest", conflicted)
    with pytest.raises(L.ManifestConflictError):
        merge_rows(spark, t_dv, src, on="event_id", mode="dv")
    monkeypatch.setattr(L, "_commit_manifest", real_commit)
    assert read_table(spark, t_dv).count() == before


def test_dv_merge_then_optimize_materializes(spark, twin_tables):
    t_dv, _, ev, src = twin_tables
    merge_rows(spark, t_dv, src, on="event_id", mode="dv")
    before = sorted(map(tuple, read_table(spark, t_dv).collect()))
    compact_table(spark, t_dv, target_file_bytes=1 << 30)
    doc = json.loads((pathlib.Path(t_dv) / _MANIFEST).read_text())
    assert not doc.get("dv")  # DVs materialized away
    after = sorted(map(tuple, read_table(spark, t_dv).collect()))
    assert after == before


def test_dv_merge_insert_only_mints_no_dv(spark, twin_tables):
    t_dv, _, ev, src = twin_tables
    inserts_only = ev.filter(F.col("event_id") % 5 == 2).withColumn(
        "event_id", F.col("event_id") + 2_000_000_000
    )
    st = merge_rows(spark, t_dv, inserts_only, on="event_id", mode="dv")
    assert st["rows_updated"] == 0
    assert st["n_dv_files_added"] == 0
    assert not list(pathlib.Path(t_dv).glob("dv-*.parquet"))


def test_dv_merge_composes_with_prior_dv_delete(spark, twin_tables):
    t_dv, t_cow, ev, src = twin_tables
    delete_rows(spark, t_dv, "value >= 150", mode="dv")
    delete_rows(spark, t_cow, "value >= 150", mode="cow")
    merge_rows(spark, t_dv, src, on="event_id", mode="dv")
    merge_rows(spark, t_cow, src, on="event_id", mode="cow")
    got, twin = read_table(spark, t_dv), read_table(spark, t_cow)
    assert got.exceptAll(twin).count() == 0
    assert twin.exceptAll(got).count() == 0


def test_dv_merge_cdf_pairs_update_images(spark, twin_tables):
    t_dv, _, ev, src = twin_tables
    v0 = manifest_versions(t_dv)[-1]
    merge_rows(spark, t_dv, src, on="event_id", mode="dv")
    v1 = manifest_versions(t_dv)[-1]
    ch = read_changes(spark, t_dv, v0, v1, keys=["event_id"])
    by_type = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    n_upd = ev.filter(F.col("event_id") % 5 == 0).count()
    n_ins = ev.filter(F.col("event_id") % 5 == 2).count()
    assert by_type.get("update_preimage", 0) == n_upd
    assert by_type.get("update_postimage", 0) == n_upd
    assert by_type.get("insert", 0) == n_ins
    assert "delete" not in by_type
    # postimages carry the updated value
    post = ch.filter(F.col("_change_type") == "update_postimage")
    assert post.filter(F.col("value") < 1000.0).count() == 0
