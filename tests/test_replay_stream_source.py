"""Custom streaming Python data source (`sources/replay_stream.py`):
micro-batch replay of a parquet table with explicit offset management.

Pins the three contracts a checkpointable source must honor:
completeness (replayed rows == batch rows, exactly once), rate limiting
(no micro-batch exceeds rows_per_batch), and checkpoint recovery (a
second run resumes from the committed offset, re-emitting nothing).
"""

from __future__ import annotations

import glob
import os
import time

import pytest

from dbt_slabbing_spark.sources.replay_stream import register_replay_source
from tests.conftest import SF_SMOKE


def _events_file() -> str:
    p = f"{SF_SMOKE}/events.parquet"
    if os.path.isdir(p):
        return sorted(glob.glob(p + "/*.parquet"))[0]
    return p


def _count_or_zero(spark, path) -> int:
    try:
        return spark.read.parquet(path).count()
    except Exception:  # noqa: BLE001 — sink dir not created/committed yet
        return 0


def _run_until(q, predicate, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if predicate():
            q.stop()
            q.awaitTermination(30)
            return
        time.sleep(0.5)
    q.stop()
    raise AssertionError("stream did not reach expected state in time")


@pytest.fixture()
def registered(spark):
    register_replay_source(spark)
    return spark


def test_replay_stream_is_complete_and_rate_limited(registered, tmp_path):
    spark = registered
    path = _events_file()
    n_expect = spark.read.parquet(path).count()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("parquet_replay")
        .option("path", path)
        .option("rows_per_batch", "300")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    _run_until(q, lambda: _count_or_zero(spark, out) >= n_expect)
    got = spark.read.parquet(out)
    assert got.count() == n_expect  # every row exactly once
    assert got.select("event_id").distinct().count() == n_expect
    # content equality, not just counts
    batch = spark.read.parquet(path)
    assert got.select("event_id", "user_id", "event_type").exceptAll(
        batch.select("event_id", "user_id", "event_type")
    ).count() == 0
    # rate limit: the per-batch numInputRows never exceeded the cap
    sizes = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    assert sizes and max(sizes) <= 300


def test_replay_stream_resumes_from_checkpoint(registered, tmp_path):
    """Stop mid-replay, restart with the same checkpoint: the second
    run finishes the file without duplicating the first run's rows."""
    spark = registered
    path = _events_file()
    n_expect = spark.read.parquet(path).count()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start(cadence):
        # the first run paces batches 5 s apart so the stop() lands
        # MID-FILE deterministically; the resume run goes full speed
        return (
            spark.readStream.format("parquet_replay")
            .option("path", path)
            .option("rows_per_batch", "250")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=cadence)
            .start()
        )

    q1 = start("5 seconds")
    _run_until(q1, lambda: _count_or_zero(spark, out) >= 250)

    n_after_first = spark.read.parquet(out).count()
    assert 0 < n_after_first < n_expect  # genuinely interrupted mid-file

    q2 = start("0 seconds")
    _run_until(q2, lambda: _count_or_zero(spark, out) >= n_expect)
    got = spark.read.parquet(out)
    assert got.count() == n_expect
    assert got.select("event_id").distinct().count() == n_expect  # no dupes
