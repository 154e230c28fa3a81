"""Streaming ingest + auto-maintenance under contention (VERDICT r11
"Next round #6"): a live foreachBatch writer lands micro-batches in a
manifest table (with periodic DV deletes creating merge-on-read debt)
while `maintain_table` crons CONCURRENTLY in a background thread. The
policy loop must converge: final content exactly right, no lost or
duplicated batches, maintenance actions logged (including
conflict-skips, which are the DESIGN — maintenance always loses to
live writers), DV debt bounded after the final pass."""

from __future__ import annotations

import json
import pathlib
import threading
import time

from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import _ensure_workers_can_import, table
from dbt_slabbing_spark.operators.layout import (
    _MANIFEST,
    ManifestConflictError,
    append_batch_idempotent,
    delete_rows,
    maintain_table,
    read_table,
)
from dbt_slabbing_spark.sources.replay_stream import register_replay_source
from tests.conftest import SF_SMOKE


def test_stream_ingest_with_concurrent_maintenance(spark, tmp_path):
    _ensure_workers_can_import(spark)
    register_replay_source(spark)
    tdir = str(tmp_path / "landing")
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n_source = ev.count()

    deleted = {"n": 0}

    def land(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        append_batch_idempotent(spark, tdir, batch_df, batch_id)
        if batch_id % 5 == 4:
            # periodic DV delete: creates the merge-on-read debt the
            # maintenance loop must materialize away. OCC conflicts
            # with a concurrent maintenance commit are retried — the
            # LIVE WRITER retries and wins, maintenance loses (the
            # intended priority).
            for _ in range(10):
                try:
                    st = delete_rows(spark, tdir, "value >= 450", mode="dv")
                    deleted["n"] += st["rows_deleted"]
                    break
                except ManifestConflictError:
                    continue
            else:
                raise AssertionError("delete lost 10 OCC races in a row")

    stream = (
        spark.readStream.format("parquet_replay")
        .option("path", f"{SF_SMOKE}/events.parquet")
        .option("rows_per_batch", "50")
        .load()
        .select("event_id", "user_id", "event_type", "value")
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(land)
        .start()
    )

    stop = threading.Event()
    passes: list[dict] = []
    errors: list[BaseException] = []

    def maintainer():
        while not stop.is_set():
            try:
                st = maintain_table(
                    spark,
                    tdir,
                    target_file_bytes=1 << 30,
                    min_unclustered=4,
                    max_dv_files=2,
                    retain_versions=0,
                    grace_seconds=600.0,  # in-flight writer/reader shield: must
                    # exceed the longest concurrent query window
                )
                passes.append(st)
            except FileNotFoundError:
                pass  # table not created by the first batch yet
            except BaseException as e:  # noqa: BLE001 — recorded, asserted below
                errors.append(e)
                return
            time.sleep(0.3)

    t = threading.Thread(target=maintainer, daemon=True)
    t.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        stop.set()
        t.join(timeout=60)

    assert not errors, f"maintenance pass crashed: {errors[0]!r}"
    assert passes, "maintenance never ran"

    # the maintenance loop did real work beside the live writer —
    # actions logged across passes (optimize and/or incremental and/or
    # conflict-skips; an all-empty log means the thread never saw the
    # table in a maintainable state, which 20+ batches guarantee here)
    all_actions = [a for st in passes for a in st["actions"]]
    assert all_actions, f"no maintenance actions across {len(passes)} passes"
    assert any(a.startswith("optimize") for a in all_actions)

    # final convergence pass on the quiesced table: DV debt bounded
    final = maintain_table(
        spark, tdir, target_file_bytes=1 << 30, min_unclustered=4,
        max_dv_files=1, retain_versions=0, grace_seconds=0.0,
    )
    doc = json.loads((pathlib.Path(tdir) / _MANIFEST).read_text())
    dv_debt = len({d for lst in doc.get("dv", {}).values() for d in lst})
    assert dv_debt == 0, f"DV debt not materialized away: {dv_debt}"

    # no lost, duplicated, or resurrected rows: every batch landed
    # exactly once and every DV delete's effect survived compaction
    got = read_table(spark, tdir)
    assert got.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0
    assert got.count() == n_source - deleted["n"]
    # rows the periodic delete can never touch are IDENTICAL to source
    low_got = got.filter(F.col("value") < 450)
    low_src = ev.filter(F.col("value") < 450)
    assert low_got.exceptAll(low_src).count() == 0
    assert low_src.exceptAll(low_got).count() == 0
    # surviving high rows are exactly the late arrivals (subset check)
    assert (
        got.filter(F.col("value") >= 450).exceptAll(
            ev.filter(F.col("value") >= 450)
        ).count()
        == 0
    )
