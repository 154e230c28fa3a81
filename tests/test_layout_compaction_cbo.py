"""Maintenance + optimizer-statistics coverage: small-files compaction
and ANALYZE TABLE / cost-based-optimizer stats."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.layout import compact_parquet_dir
from tests.conftest import SF_SMOKE


def test_compact_parquet_dir_restores_file_count(spark, tmp_path):
    """A micro-batch-fragmented table compacts to the computed file
    count with identical contents."""
    target = str(tmp_path / "fragmented")
    events = table(spark, SF_SMOKE, "events").select("event_id", "event_type", "value")
    events.repartition(64).write.parquet(target)  # simulate tiny appends
    n_before = len(list(pathlib.Path(target).glob("*.parquet")))
    assert n_before >= 32

    before = {r["event_id"]: (r["event_type"], r["value"]) for r in events.collect()}
    n = compact_parquet_dir(spark, target, target_file_bytes=10 * 1024 * 1024)
    files = list(pathlib.Path(target).glob("*.parquet"))
    assert len(files) == n < n_before

    after_df = spark.read.parquet(target)
    after = {r["event_id"]: (r["event_type"], r["value"]) for r in after_df.collect()}
    assert after == before


def test_analyze_table_stats_reach_the_planner(spark, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS (+ FOR ALL COLUMNS) must surface
    rowCount in the optimized plan's statistics and per-column distinct
    counts in the catalog — the inputs the cost-based optimizer uses for
    join reordering and broadcast decisions at scale."""
    # external table location: keep the warehouse out of the repo cwd
    table(spark, SF_SMOKE, "nation").write.mode("overwrite").option(
        "path", str(tmp_path / "cbo_nation")
    ).saveAsTable("_cbo_nation")
    try:
        spark.sql("ANALYZE TABLE _cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")
        # plan-level rowCount is only propagated when the CBO is on
        spark.conf.set("spark.sql.cbo.enabled", "true")
        stats = spark.table("_cbo_nation")._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined(), "ANALYZE did not record rowCount"
        assert int(str(stats.rowCount().get())) == 25
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESCRIBE EXTENDED _cbo_nation n_nationkey"
            ).collect()
        }
        assert desc.get("distinct_count") == "25", desc
        # CBO consumes them without breaking results
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        try:
            n = (
                spark.table("_cbo_nation")
                .join(table(spark, SF_SMOKE, "region"), F.expr("n_regionkey = r_regionkey"))
                .count()
            )
            assert n == 25
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    finally:
        spark.sql("DROP TABLE IF EXISTS _cbo_nation")


def test_compact_swap_failure_recoverable_and_live_restored(spark, tmp_path, monkeypatch):
    """Kill the swap at its worst instant (live dir already moved to
    .old, staging→live rename fails): compact_parquet_dir must restore
    the live directory with the ORIGINAL data and leave the staging
    dir (full new data) on disk for retry — the full dataset exists in
    some directory at every instant (see the swap contract in the
    docstring; on object stores this is a table-format metadata commit
    instead)."""
    import pathlib as _pl

    target = str(tmp_path / "frag")
    events = table(spark, SF_SMOKE, "events").select("event_id", "value")
    events.repartition(16).write.parquet(target)
    before = {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()}

    real_rename = _pl.Path.rename

    def failing_rename(self, dst):
        if str(self).endswith(".compacting"):
            raise OSError("injected: swap interrupted")
        return real_rename(self, dst)

    monkeypatch.setattr(_pl.Path, "rename", failing_rename)
    try:
        compact_parquet_dir(spark, target, target_file_bytes=10 * 1024 * 1024)
        raised = False
    except OSError:
        raised = True
    monkeypatch.undo()
    assert raised

    # live directory is back with the original data
    assert {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()} == before
    # staging survives with the complete NEW data, ready for retry
    staging = pathlib.Path(target + ".compacting")
    assert staging.is_dir()
    assert {
        r["event_id"]: r["value"] for r in spark.read.parquet(str(staging)).collect()
    } == before

    # ...and a retry after the transient failure completes the swap
    n = compact_parquet_dir(spark, target, target_file_bytes=10 * 1024 * 1024)
    assert len(list(pathlib.Path(target).glob("*.parquet"))) == n
    assert not pathlib.Path(target + ".old").exists()
    assert {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()} == before


def test_delete_rows_rewrites_only_affected_files(spark, tmp_path):
    """Targeted deletion (the GDPR DELETE): matching rows disappear,
    stats are exact, and files with NO matching rows are carried over
    BYTE-IDENTICAL (copied, not rewritten) — the rewrite cost is
    O(affected files), not O(table)."""
    import hashlib
    import pathlib

    from dbt_slabbing_spark.operators.layout import delete_rows

    target = str(tmp_path / "events")
    events = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "event_type", "value")
    # range-partition by user_id so the predicate is file-localized —
    # the layout-prunes-deletes story (a z-ordered/bucketed key at scale)
    events.repartitionByRange(8, "user_id").write.parquet(target)

    before = {r["event_id"]: (r["user_id"], r["event_type"]) for r in events.collect()}
    victims = {k for k, (u, _t) in before.items() if 3 <= u <= 4}
    assert victims  # non-vacuous

    def digests():
        return {
            f.name: hashlib.md5(f.read_bytes()).hexdigest()
            for f in pathlib.Path(target).glob("*.parquet")
        }

    pre = digests()
    stats = delete_rows(spark, target, "user_id >= 3 AND user_id <= 4")
    assert stats["rows_before"] == len(before)
    assert stats["rows_deleted"] == len(victims)
    assert stats["rows_after"] == len(before) - len(victims)
    assert 0 < stats["n_files_rewritten"] < stats["n_files_total"]

    post = digests()
    untouched_pre = {n: h for n, h in pre.items() if n in post}
    # every carried-over original file is byte-identical
    assert untouched_pre and all(post[n] == h for n, h in untouched_pre.items())
    assert len(pre) - len(untouched_pre) == stats["n_files_rewritten"]

    after = {r["event_id"] for r in spark.read.parquet(target).collect()}
    assert after == set(before) - victims

    # no-match predicate: zero rewrites, directory untouched
    stats2 = delete_rows(spark, target, "user_id < 0")
    assert stats2["rows_deleted"] == 0 and stats2["n_files_rewritten"] == 0
    assert digests() == post
