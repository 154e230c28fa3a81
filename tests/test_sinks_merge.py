"""Sink round-trips (partitioned parquet with pruning, CSV, JSON) and
merge/SCD2 emulation semantics."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.merge import dedup_updates, scd2_apply, upsert
from dbt_slabbing_spark.sinks import HAS_DELTA, write_csv, write_json, write_parquet
from tests.conftest import SF_SMOKE


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmp_path):
    out = str(tmp_path / "orders_parted")
    orders = table(spark, SF_SMOKE, "orders").withColumn("o_year", F.year("o_orderdate"))
    write_parquet(orders, out, partition_by=["o_year"], target_files=4)

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    pruned = back.filter(F.col("o_year") == 1997)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must hit the directory layout, not the row scan
    assert "PartitionFilters: [isnotnull(o_year" in plan, plan[:800]
    assert pruned.count() == orders.filter(F.year("o_orderdate") == 1997).count()


def test_csv_json_roundtrip(spark, tmp_path):
    nation = table(spark, SF_SMOKE, "nation")
    write_csv(nation, str(tmp_path / "nation_csv"))
    write_json(nation, str(tmp_path / "nation_json"))
    csv_back = spark.read.csv(str(tmp_path / "nation_csv"), header=True, inferSchema=True)
    json_back = spark.read.json(str(tmp_path / "nation_json"))
    assert csv_back.count() == 25 and json_back.count() == 25
    assert sorted(r["n_name"] for r in csv_back.collect()) == sorted(r["n_name"] for r in json_back.collect())


def test_upsert_semantics(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")], schema="k int, v string"
    )
    updates = spark.createDataFrame([Row(k=2, v="B2"), Row(k=9, v="NEW")], schema="k int, v string")
    merged = {r["k"]: r["v"] for r in upsert(target, updates, "k").collect()}
    assert merged == {1: "a", 2: "B2", 3: "c", 9: "NEW"}


def test_cdc_compaction_last_wins(spark):
    updates = spark.createDataFrame(
        [Row(k=1, v="old", seq=1), Row(k=1, v="new", seq=2), Row(k=2, v="x", seq=1)],
        schema="k int, v string, seq int",
    )
    got = {r["k"]: r["v"] for r in dedup_updates(updates, "k", "seq").collect()}
    assert got == {1: "new", 2: "x"}


def test_scd2_versions(spark):
    dim = spark.createDataFrame(
        [Row(k=1, seg="GOLD", valid_from=None, valid_to=None, is_current=True)],
        schema="k int, seg string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [
            Row(k=1, seg="SILVER", changed_at="2024-02-01 00:00:00"),  # real change
            Row(k=2, seg="NEW", changed_at="2024-02-02 00:00:00"),     # brand-new key
        ],
        schema="k int, seg string, changed_at string",
    ).withColumn("changed_at", F.col("changed_at").cast("timestamp"))

    out = scd2_apply(dim, changes, "k", "changed_at", ["seg"]).collect()
    by = {(r["k"], r["seg"]): r for r in out}
    assert len(out) == 3
    old = by[(1, "GOLD")]
    assert old["is_current"] is False and str(old["valid_to"]).startswith("2024-02-01")
    assert by[(1, "SILVER")]["is_current"] is True
    assert by[(2, "NEW")]["is_current"] is True


def test_scd2_multi_change_per_key_in_one_batch(spark):
    """A batch with several changes for one key must chain-version them:
    old row closes ONCE at the first real change, intermediate versions
    get valid_to = next change, only the last is is_current, and
    intra-batch no-ops are dropped."""
    dim = spark.createDataFrame(
        [Row(k=1, seg="GOLD", valid_from=None, valid_to=None, is_current=True)],
        schema="k int, seg string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [
            Row(k=1, seg="SILVER", changed_at="2024-02-01 00:00:00"),
            Row(k=1, seg="SILVER", changed_at="2024-02-02 00:00:00"),  # intra-batch no-op
            Row(k=1, seg="BRONZE", changed_at="2024-03-01 00:00:00"),
        ],
        schema="k int, seg string, changed_at string",
    ).withColumn("changed_at", F.col("changed_at").cast("timestamp"))

    out = scd2_apply(dim, changes, "k", "changed_at", ["seg"]).collect()
    assert len(out) == 3, out  # GOLD (closed), SILVER (closed), BRONZE (current)
    by_seg = {r["seg"]: r for r in out}
    assert by_seg["GOLD"]["is_current"] is False
    assert str(by_seg["GOLD"]["valid_to"]).startswith("2024-02-01")
    assert by_seg["SILVER"]["is_current"] is False
    assert str(by_seg["SILVER"]["valid_from"]).startswith("2024-02-01")
    assert str(by_seg["SILVER"]["valid_to"]).startswith("2024-03-01")
    assert by_seg["BRONZE"]["is_current"] is True
    assert str(by_seg["BRONZE"]["valid_to"]).startswith("9999-12-31")
    # exactly one current row per key
    assert sum(1 for r in out if r["is_current"]) == 1


def test_scd2_noop_change_dropped(spark):
    dim = spark.createDataFrame(
        [Row(k=1, seg="GOLD", valid_from=None, valid_to=None, is_current=True)],
        schema="k int, seg string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame([Row(k=1, seg="GOLD", changed_at=None)], schema="k int, seg string, changed_at timestamp")
    out = scd2_apply(dim, changes, "k", "changed_at", ["seg"]).collect()
    assert len(out) == 1 and out[0]["is_current"] is True


def test_delta_gated(spark, tmp_path):
    if HAS_DELTA:
        return  # environment has delta; nothing to gate
    import pytest

    from dbt_slabbing_spark.sinks import merge_into

    with pytest.raises(NotImplementedError):
        merge_into(spark, str(tmp_path), spark.range(1), "id")


def test_snapshot_time_travel(spark, tmp_path):
    """write_snapshot appends immutable v=N directories; read_snapshot
    pins a version (default latest); history lists commits in order."""
    from dbt_slabbing_spark.sinks import read_snapshot, snapshot_history, write_snapshot

    path = str(tmp_path / "dim_versions")
    v0 = write_snapshot(spark.range(3).withColumn("tag", F.lit("a")), path)
    v1 = write_snapshot(spark.range(5).withColumn("tag", F.lit("b")), path)
    assert (v0, v1) == (0, 1)
    assert snapshot_history(spark, path) == [0, 1]

    assert read_snapshot(spark, path).count() == 5  # latest
    old = read_snapshot(spark, path, version=0)
    assert old.count() == 3 and old.select("tag").distinct().collect()[0][0] == "a"

    import pytest

    with pytest.raises(ValueError):
        read_snapshot(spark, path, version=7)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "nowhere"))

    # a half-written (no _SUCCESS) directory is invisible to readers
    import os

    broken = tmp_path / "dim_versions" / "v=2"
    os.makedirs(broken)
    (broken / "part-00000.parquet").write_bytes(b"garbage")
    assert snapshot_history(spark, path) == [0, 1]
    assert read_snapshot(spark, path).count() == 5


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Appended snapshots may ADD columns; mergeSchema reads the union
    schema with nulls for files written before the column existed."""
    path = str(tmp_path / "evolving")
    spark.range(3).selectExpr("id", "id * 2 AS v").write.parquet(path + "/b=0")
    spark.range(3).selectExpr("id", "id * 2 AS v", "'x' AS note").write.parquet(path + "/b=1")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v", "note", "b"}
    assert merged.count() == 6
    assert merged.filter(F.col("note").isNull()).count() == 3


def test_apply_cdc_insert_update_delete(spark):
    """Latest-change-wins CDC with deletes: delete-after-insert removes
    the key, re-insert-after-delete restores it, plain updates replace,
    and untouched keys survive."""
    from dbt_slabbing_spark.operators.merge import apply_cdc

    target = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            ("b", 20, 1, "U"),   # update b
            ("c", 0, 1, "D"),    # delete c ...
            ("c", 30, 2, "I"),   # ... then re-insert → survives as 30
            ("d", 4, 1, "I"),    # new key ...
            ("d", 0, 2, "D"),    # ... deleted in the same batch → gone
        ],
        ["k", "v", "seq", "op"],
    )
    out = {r["k"]: r["v"] for r in apply_cdc(target, changes, "k", "seq").collect()}
    assert out == {"a": 1, "b": 20, "c": 30}


def test_observe_metrics_collected_in_one_pass(spark):
    """df.observe(): data-quality metrics ride along the job (no second
    scan) and must equal an explicit aggregate."""
    from pyspark.sql import functions as F
    from pyspark.sql.observation import Observation

    from dbt_slabbing_spark.catalog import table
    from tests.conftest import SF_SMOKE

    obs = Observation("orders_quality")
    orders = table(spark, SF_SMOKE, "orders")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_cust"),
        F.min("o_totalprice").alias("min_price"),
    )
    n_out = observed.filter(F.col("o_totalprice") > 0).count()
    got = obs.get
    expect = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_cust"),
        F.min("o_totalprice").alias("min_price"),
    ).first()
    assert got["n_rows"] == expect["n_rows"] >= n_out
    assert got["null_cust"] == expect["null_cust"]
    assert got["min_price"] == expect["min_price"]


def test_text_format_roundtrip(spark, tmp_path):
    """text source/sink: one string column per line, newline-delimited;
    roundtrip preserves every line."""
    from pyspark.sql import functions as F

    from dbt_slabbing_spark.catalog import table
    from tests.conftest import SF_SMOKE

    path = str(tmp_path / "docs_text")
    docs = table(spark, SF_SMOKE, "documents").select(
        F.concat_ws("|", F.col("doc_id").cast("string"), F.md5(F.col("text").cast("binary"))).alias(
            "value"
        )
    )
    docs.write.text(path)
    back = spark.read.text(path)
    assert sorted(r["value"] for r in back.collect()) == sorted(
        r["value"] for r in docs.collect()
    )


def test_snapshot_retention_prunes_old_versions(spark, tmp_path):
    """prune_snapshots keeps the newest N versions readable, removes
    the rest, sweeps crashed half-writes behind the horizon, and
    refuses keep_last < 1."""
    import pytest

    from dbt_slabbing_spark.sinks import (
        prune_snapshots,
        read_snapshot,
        snapshot_history,
        write_snapshot,
    )

    p = str(tmp_path / "snap")
    for n in range(5):
        write_snapshot(spark.range(n, n + 3).toDF("id"), p)
    # a crashed half-write: directory without _SUCCESS, older than v=3
    import pathlib

    crashed = pathlib.Path(p) / "v=2"
    (crashed / "_SUCCESS").unlink()

    removed = prune_snapshots(spark, p, keep_last=2)
    assert removed == [0, 1]  # v=2 was uncommitted, not a version
    assert snapshot_history(spark, p) == [3, 4]
    assert not crashed.exists()  # half-write swept
    assert read_snapshot(spark, p, 4).count() == 3
    with pytest.raises(ValueError, match="not in"):
        read_snapshot(spark, p, 0)  # pruned version fails loudly
    with pytest.raises(ValueError, match="keep_last"):
        prune_snapshots(spark, p, keep_last=0)


def test_scd2_apply_matches_python_fold_model(spark):
    """Property (hypothesis): for ANY batch of keyed changes — repeated
    keys, no-ops, ties broken by value, keys new to the dimension —
    scd2_apply's output equals a direct Python fold of dbt snapshot
    semantics. scd2_apply now underpins the snapshot materialization,
    CDC and golden SCD2 gates, so its fold gets the same property-based
    treatment as the reference's lesion fold."""
    from hypothesis import given, settings, strategies as st

    segs = st.sampled_from(["a", "b", "c"])
    change = st.tuples(st.integers(1, 3), st.integers(1, 5), segs)  # key, t, seg

    @settings(max_examples=25, deadline=None)
    @given(st.lists(change, min_size=0, max_size=8), st.lists(st.tuples(st.integers(1, 3), segs), max_size=2, unique_by=lambda t: t[0]))
    def run(changes, dim_rows):
        ts = lambda t: f"2024-01-0{t} 00:00:00"  # noqa: E731
        dim = spark.createDataFrame(
            [(k, s, "2023-12-01 00:00:00", "9999-12-31 00:00:00", True) for k, s in dim_rows],
            "k long, seg string, valid_from string, valid_to string, is_current boolean",
        ).selectExpr("k", "seg", "CAST(valid_from AS TIMESTAMP) valid_from",
                     "CAST(valid_to AS TIMESTAMP) valid_to", "is_current")
        ch = spark.createDataFrame(
            [(k, s, ts(t)) for k, t, s in changes], "k long, seg string, changed_at string"
        ).selectExpr("k", "seg", "CAST(changed_at AS TIMESTAMP) changed_at")
        got = {
            (r["k"], r["seg"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
            for r in scd2_apply(dim, ch, "k", "changed_at", ["seg"]).collect()
        }

        # Python model: per key, order changes by (t, seg); drop no-ops
        # vs the previous SURVIVOR (current dim value for the first);
        # chain-version survivors; close the dim row at the first
        # survivor's time.
        want = set()
        cur = dict(dim_rows)
        by_key = {}
        for k, t, s in sorted(changes, key=lambda c: (c[0], c[1], c[2])):
            by_key.setdefault(k, []).append((t, s))
        survivors = {}
        for k, seq in by_key.items():
            kept = []
            prev = cur.get(k)
            for t, s in seq:
                if s != prev:
                    kept.append((t, s))
                    prev = s
            survivors[k] = kept
        for k, s in dim_rows:
            kept = survivors.get(k, [])
            if kept:
                want.add((k, s, "2023-12-01 00:00:00", ts(kept[0][0]), False))
            else:
                want.add((k, s, "2023-12-01 00:00:00", "9999-12-31 00:00:00", True))
        for k, kept in survivors.items():
            for i, (t, s) in enumerate(kept):
                nxt = kept[i + 1][0] if i + 1 < len(kept) else None
                want.add(
                    (k, s, ts(t), ts(nxt) if nxt else "9999-12-31 00:00:00", nxt is None)
                )
        assert got == want

    run()
