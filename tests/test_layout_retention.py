"""Time-based vacuum retention (`vacuum_orphans(retain_hours=)`):
window protection, composition with retain_versions, pre-r13
missing-ts snapshots, and the DESCRIBE HISTORY ts/restorable columns.
"""

from __future__ import annotations

import json
import os
import pathlib
import time

import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.operators.layout import (
    append_files,
    delete_rows,
    manifest_versions,
    read_table,
    restore_table,
    table_snapshots,
    vacuum_orphans,
)


def _backdate(target, hours, versions=None):
    """Set recorded commit ts (all or the given versions) and every
    parquet mtime to `hours` ago."""
    p = pathlib.Path(target)
    mf = p / "_manifest.json"
    doc = json.loads(mf.read_text())
    old = time.time() - hours * 3600
    for h in doc.get("history", []):
        if versions is None or h["version"] in versions:
            h["ts"] = old
    if versions is None or doc["version"] in versions:
        doc["ts"] = old
    mf.write_text(json.dumps(doc))
    for f in p.glob("*.parquet"):
        os.utime(f, (old, old))
    return doc


@pytest.fixture()
def versioned(spark, tmp_path):
    target = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    append_files(spark, target, df.coalesce(2))
    v_full = manifest_versions(target)[-1]
    delete_rows(spark, target, "k < 30", mode="cow")
    return target, v_full


def test_window_protects_then_expires(spark, versioned):
    target, v_full = versioned
    _backdate(target, 48)
    # inside the window: displaced files protected, restore works
    assert vacuum_orphans(target, retain_hours=72, grace_seconds=0) == []
    restore_table(target, v_full, spark=spark)
    assert read_table(spark, target).count() == 100
    # roll forward again and age out
    delete_rows(spark, target, "k < 30", mode="cow")
    _backdate(target, 48)
    removed = vacuum_orphans(target, retain_hours=24, grace_seconds=0)
    assert removed  # displaced pre-delete files reclaimed
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        restore_table(target, v_full, spark=spark)
    # current snapshot always survives
    assert read_table(spark, target).count() == 70


def test_axes_compose_either_protects(spark, versioned):
    """retain_versions protects the last-N versions even when the time
    window has expired (a file survives if EITHER axis protects it)."""
    target, v_full = versioned
    _backdate(target, 48)
    assert (
        vacuum_orphans(
            target, retain_versions=10, retain_hours=1, grace_seconds=0
        )
        == []
    )
    restore_table(target, v_full, spark=spark)
    assert read_table(spark, target).count() == 100


def test_missing_ts_counts_as_old(spark, versioned):
    """Pre-r13 manifests have no ts: their snapshots fall outside any
    time window (prunable) — retain_versions is the pin for them."""
    target, v_full = versioned
    p = pathlib.Path(target)
    doc = json.loads((p / "_manifest.json").read_text())
    for h in doc.get("history", []):
        h.pop("ts", None)
    doc.pop("ts", None)
    (p / "_manifest.json").write_text(json.dumps(doc))
    old = time.time() - 48 * 3600
    for f in p.glob("*.parquet"):
        os.utime(f, (old, old))
    removed = vacuum_orphans(target, retain_hours=1000, grace_seconds=0)
    assert removed  # no ts -> older than any horizon
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        restore_table(target, v_full, spark=spark)


def test_history_ts_and_restorable_columns(spark, versioned):
    target, v_full = versioned
    snaps = {r["version"]: r for r in table_snapshots(spark, target).collect()}
    assert all(r["restorable"] for r in snaps.values())
    now = time.time()
    assert all(
        r["ts"] is not None and abs(r["ts"] - now) < 3600
        for r in snaps.values()
    )
    _backdate(target, 48)
    vacuum_orphans(target, retain_hours=24, grace_seconds=0)
    snaps = {r["version"]: r for r in table_snapshots(spark, target).collect()}
    cur = manifest_versions(target)[-1]
    assert not snaps[v_full]["restorable"]
    assert snaps[cur]["restorable"]


def test_timestamp_as_of_read_and_restore(spark, versioned):
    """TIMESTAMP AS OF resolves to the latest commit <= ts; ISO and
    epoch forms; SQL read + RESTORE forms; too-early ts raises."""
    import time
    from datetime import datetime

    from dbt_slabbing_spark.plans.sql_dml import ManifestSession

    target, v_full = versioned
    # backdate the full snapshot 2h, leave the delete commit current
    _backdate(target, 2, versions=range(0, v_full + 1))
    mid = time.time() - 3600
    assert read_table(spark, target, timestamp=mid).count() == 100
    assert read_table(spark, target, timestamp=time.time()).count() == 70
    iso = datetime.fromtimestamp(mid).isoformat()
    assert read_table(spark, target, timestamp=iso).count() == 100
    with pytest.raises(ValueError, match="no snapshot"):
        read_table(spark, target, timestamp=mid - 24 * 3600)
    with pytest.raises(ValueError, match="not both"):
        read_table(spark, target, version=v_full, timestamp=mid)
    ses = ManifestSession(spark, mode="cow").register("ts_tab", target)
    assert (
        ses.sql(f"SELECT count(*) AS n FROM ts_tab TIMESTAMP AS OF '{iso}'")
        .first()["n"]
        == 100
    )
    ses.sql(f"RESTORE TABLE ts_tab TO TIMESTAMP AS OF '{iso}'")
    assert ses.sql("SELECT count(*) AS n FROM ts_tab").first()["n"] == 100
