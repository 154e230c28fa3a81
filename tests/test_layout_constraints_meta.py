"""CHECK constraints (`add_constraint` / `drop_constraint` /
per-write enforcement) and metadata tables (`table_snapshots` /
`table_files`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.layout import (
    ConstraintViolationError,
    add_constraint,
    append_files,
    compact_table,
    delete_rows,
    drop_constraint,
    merge_rows,
    read_table,
    stage_append,
    table_files,
    table_snapshots,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def base(spark, tmp_path):
    target = str(tmp_path / "events")
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    append_files(spark, target, ev.coalesce(2))
    return target, ev


def _row(*vals):
    return vals


def test_constraint_blocks_bad_append_entirely(spark, base):
    target, _ev = base
    add_constraint(spark, target, "value_nonneg", "value >= 0")
    n0 = read_table(spark, target).count()
    bad = spark.createDataFrame(
        [(-1, 1, "x", -5.0), (-2, 1, "x", 3.0)],
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    with pytest.raises(ConstraintViolationError, match="value_nonneg"):
        append_files(spark, target, bad.coalesce(1))
    # the write is rejected WHOLE: the valid row didn't land either
    assert read_table(spark, target).count() == n0
    good = spark.createDataFrame(
        [(-3, 1, "x", 3.0)],
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    append_files(spark, target, good.coalesce(1))
    assert read_table(spark, target).count() == n0 + 1


def test_constraint_null_passes_and_gates_all_writers(spark, base):
    target, _ev = base
    add_constraint(spark, target, "value_nonneg", "value >= 0")
    nullish = spark.createDataFrame(
        [(-4, 1, "x", None)],
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    append_files(spark, target, nullish.coalesce(1))  # NULL passes CHECK
    bad = spark.createDataFrame(
        [(-5, 1, "x", -1.0)],
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    with pytest.raises(ConstraintViolationError):
        stage_append(spark, target, bad.coalesce(1), audit_id="c1")
    with pytest.raises(ConstraintViolationError):
        merge_rows(spark, target, bad, on="event_id")


def test_constraint_rejected_when_existing_rows_violate(spark, base):
    target, _ev = base
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        add_constraint(spark, target, "impossible", "value > 1e12")


def test_constraint_drop_reopens(spark, base):
    target, _ev = base
    add_constraint(spark, target, "value_nonneg", "value >= 0")
    drop_constraint(target, "value_nonneg")
    bad = spark.createDataFrame(
        [(-6, 1, "x", -1.0)],
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    append_files(spark, target, bad.coalesce(1))  # no longer enforced


def test_metadata_tables(spark, base):
    target, ev = base
    append_files(spark, target, ev.limit(5).coalesce(1))
    delete_rows(spark, target, "event_type = 'click'", mode="dv")
    compact_table(spark, target, target_file_bytes=1 << 30)
    snaps = {r["version"]: r for r in table_snapshots(spark, target).collect()}
    # v1 = empty adoption commit, v2/v3 = appends, v4 = DV delete,
    # v5 = compaction
    assert len(snaps) == 5
    assert snaps[1]["n_files"] == 0
    assert snaps[2]["n_added"] == snaps[2]["n_files"] >= 1
    n3 = snaps[3]["n_files"]
    assert snaps[3]["n_added"] == 1 and n3 == snaps[2]["n_files"] + 1
    # DV commit: same files, some with DVs
    assert snaps[4]["n_files"] == n3 and snaps[4]["n_added"] == 0
    assert snaps[4]["n_files_with_dv"] >= 1
    # compaction: files swap, current snapshot DV-free
    assert snaps[5]["is_current"] and snaps[5]["n_files_with_dv"] == 0
    assert snaps[5]["n_removed"] == n3
    files = table_files(spark, target).collect()
    assert len(files) == snaps[5]["n_files"]
    assert all(r["size_bytes"] > 0 and r["has_stats"] for r in files)
    assert all(r["n_dv_files"] == 0 for r in files)


def test_maintain_table_policy_loop(spark, base):
    """maintain_table reads metadata and runs exactly the steps the
    state calls for: incremental clustering for appended stragglers,
    full OPTIMIZE at the DV-debt threshold, vacuum for the displaced
    files — content invariant throughout."""
    import json
    import pathlib

    from dbt_slabbing_spark.operators.layout import (
        _MANIFEST,
        compact_table,
        maintain_table,
    )

    target, ev = base
    want = {r["event_id"] for r in read_table(spark, target).collect()}
    compact_table(spark, target, target_file_bytes=1 << 30, cluster_by=["value"])
    # 2 stragglers: below min_unclustered -> no clustering action
    for i in (1, 2):
        append_files(
            spark,
            target,
            spark.createDataFrame(
                [(-i, i, "late", float(i))],
                "event_id bigint, user_id bigint, event_type string, value double",
            ).coalesce(1),
        )
    st = maintain_table(spark, target, min_unclustered=3, grace_seconds=0.0)
    assert "compact_incremental" not in st["actions"]
    # a third straggler crosses the threshold
    append_files(
        spark,
        target,
        spark.createDataFrame(
            [(-3, 3, "late", 3.0)],
            "event_id bigint, user_id bigint, event_type string, value double",
        ).coalesce(1),
    )
    st = maintain_table(spark, target, min_unclustered=3, grace_seconds=0.0)
    assert st["actions"] == ["compact_incremental"]
    # DV debt: two deletes -> two sidecars -> OPTIMIZE at threshold 2,
    # preserving the clustered layout; vacuum reclaims the displaced
    delete_rows(spark, target, "event_type = 'click'", mode="dv")
    delete_rows(spark, target, "event_type = 'view'", mode="dv")
    st = maintain_table(
        spark, target, max_dv_files=2, min_unclustered=99, grace_seconds=0.0
    )
    assert st["actions"] == ["optimize:dv-materialize"]
    assert st["n_vacuumed"] > 0
    doc = json.loads((pathlib.Path(target) / _MANIFEST).read_text())
    assert "dv" not in doc and "clustered" in doc
    got = {r["event_id"] for r in read_table(spark, target).collect()}
    dead = {
        r["event_id"]
        for r in ev.filter(F.col("event_type").isin("click", "view")).collect()
    }
    assert got == (want - dead) | {-1, -2, -3}
