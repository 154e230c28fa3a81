"""SQL DML front-end (`plans/sql_dml.py::ManifestSession`) and the
`update_rows` operator: dispatch correctness, CHECK-constraint and CDF
interaction, per-statement snapshot refresh, grammar rejection."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.layout import (
    ConstraintViolationError,
    add_constraint,
    append_files,
    manifest_versions,
    read_changes,
    read_table,
    update_rows,
)
from dbt_slabbing_spark.plans.sql_dml import ManifestSession, SqlDmlError
from tests.conftest import SF_SMOKE


@pytest.fixture()
def session(spark, tmp_path):
    target = str(tmp_path / "events")
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    append_files(spark, target, ev.coalesce(2))
    ses = ManifestSession(spark, mode="dv").register("tab", target)
    return ses, target, ev


def test_update_rows_cow_dv_parity(spark, tmp_path):
    ev = table(spark, SF_SMOKE, "events").select("event_id", "value")
    outs = {}
    idents = {}
    for mode in ("cow", "dv"):
        t = str(tmp_path / mode)
        append_files(spark, t, ev.coalesce(2))
        idents[mode] = {
            f.name: f.stat().st_mtime_ns
            for f in pathlib.Path(t).glob("append-*.parquet")
        }
        st = update_rows(
            spark, t, "event_id % 3 = 0", {"value": "value * 10"}, mode=mode
        )
        assert st["rows_updated"] == ev.filter(F.col("event_id") % 3 == 0).count()
        assert st["rows_after"] == st["rows_before"]
        outs[mode] = sorted(map(tuple, read_table(spark, t).collect()))
    assert outs["cow"] == outs["dv"]
    # dv mode's original data files are byte-untouched
    t_dv = pathlib.Path(str(tmp_path / "dv"))
    assert {
        f.name: f.stat().st_mtime_ns
        for f in t_dv.glob("append-*.parquet")
    } == idents["dv"]
    assert list(t_dv.glob("dv-*.parquet"))


def test_update_rows_set_sees_preimage(spark, tmp_path):
    """SQL UPDATE: all SET expressions evaluate against the pre-update
    row — SET a = b, b = a swaps."""
    t = str(tmp_path / "swap")
    append_files(
        spark, t, spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    )
    update_rows(spark, t, "true", {"a": "b", "b": "a"}, mode="cow")
    assert read_table(spark, t).collect()[0].asDict() == {"a": 2.0, "b": 1.0}


def test_update_rows_respects_constraints(spark, tmp_path):
    t = str(tmp_path / "cons")
    append_files(
        spark, t, spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    )
    add_constraint(spark, t, "v_pos", "v > 0")
    for mode in ("cow", "dv"):
        with pytest.raises(ConstraintViolationError):
            update_rows(spark, t, "k = 1", {"v": "-1.0"}, mode=mode)
    # nothing committed
    assert read_table(spark, t).filter(F.col("v") < 0).count() == 0


def test_sql_insert_respects_constraints(spark, session):
    ses, target, ev = session
    add_constraint(spark, target, "value_pos", "value >= 0")
    with pytest.raises(ConstraintViolationError):
        ses.sql("INSERT INTO tab VALUES (99999999, 1, 'bad', -5.0)")
    assert (
        read_table(spark, target).filter(F.col("event_id") == 99999999).count()
        == 0
    )
    ses.sql("INSERT INTO tab VALUES (99999998, 1, 'good', 5.0)")
    assert ses.sql("SELECT * FROM tab WHERE event_id = 99999998").count() == 1


def test_sql_update_emits_cdf_images(spark, session):
    ses, target, ev = session
    v0 = manifest_versions(target)[-1]
    st = ses.sql("UPDATE tab SET value = value + 1000 WHERE event_type = 'error'")
    v1 = manifest_versions(target)[-1]
    n_err = ev.filter(F.col("event_type") == "error").count()
    assert st["rows_updated"] == n_err
    ch = read_changes(spark, target, v0, v1, keys=["event_id"])
    by = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by.get("update_preimage", 0) == n_err
    assert by.get("update_postimage", 0) == n_err


def test_sql_select_sees_each_mutation(spark, session):
    ses, target, ev = session
    n0 = ses.sql("SELECT * FROM tab").count()
    ses.sql("DELETE FROM tab WHERE event_type = 'click'")
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert ses.sql("SELECT * FROM tab").count() == n0 - n_click
    ses.sql("INSERT INTO tab (event_id, user_id, event_type, value) "
            "VALUES (77777777, 7, 'click', 1.5)")
    assert (
        ses.sql("SELECT count(*) AS n FROM tab WHERE event_type = 'click'")
        .collect()[0]["n"]
        == 1
    )


def test_sql_merge_via_subquery(spark, session):
    ses, target, ev = session
    st = ses.sql(
        """MERGE INTO tab USING (
               SELECT event_id, user_id, 'promoted' AS event_type, value
               FROM tab WHERE event_type = 'signup'
           ) s ON tab.event_id = s.event_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *"""
    )
    n_signup = ev.filter(F.col("event_type") == "signup").count()
    assert st["rows_updated"] == n_signup
    assert st["rows_inserted"] == 0
    got = read_table(spark, target)
    assert got.filter(F.col("event_type") == "signup").count() == 0
    assert got.filter(F.col("event_type") == "promoted").count() == n_signup


def test_sql_grammar_rejections(spark, session):
    ses, target, ev = session
    with pytest.raises(SqlDmlError, match="unknown manifest table"):
        ses.sql("DELETE FROM nope WHERE 1=1")
    with pytest.raises(SqlDmlError, match="identical column names"):
        ses.sql(
            "MERGE INTO tab USING tab s ON tab.event_id = s.user_id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    # delete-only MERGE is now a supported clause (r13); a clause
    # without THEN is still a named rejection
    with pytest.raises(SqlDmlError, match="without THEN"):
        ses.sql(
            "MERGE INTO tab USING tab s ON tab.event_id = s.event_id "
            "WHEN MATCHED DELETE"
        )
    with pytest.raises(SqlDmlError, match="bad SET assignment"):
        ses.sql("UPDATE tab SET 5 = value")


def test_sql_dml_cow_mode_matches_dv(spark, tmp_path):
    ev = table(spark, SF_SMOKE, "events").select("event_id", "value")
    outs = {}
    for mode in ("cow", "dv"):
        t = str(tmp_path / f"m_{mode}")
        append_files(spark, t, ev.coalesce(2))
        ses = ManifestSession(spark, mode=mode).register(f"t_{mode}", t)
        ses.sql(f"UPDATE t_{mode} SET value = value * 2 WHERE event_id % 2 = 0")
        ses.sql(f"DELETE FROM t_{mode} WHERE value > 500")
        outs[mode] = sorted(map(tuple, read_table(spark, t).collect()))
    assert outs["cow"] == outs["dv"]


def test_sql_time_travel_version_as_of(spark, session):
    ses, target, ev = session
    from dbt_slabbing_spark.operators.layout import manifest_versions

    v0 = manifest_versions(target)[-1]
    n0 = ses.sql("SELECT * FROM tab").count()
    ses.sql("DELETE FROM tab WHERE event_type = 'view'")
    n_view = ev.filter(F.col("event_type") == "view").count()
    assert ses.sql("SELECT * FROM tab").count() == n0 - n_view
    # the pinned snapshot still sees the pre-delete table
    assert (
        ses.sql(f"SELECT * FROM tab VERSION AS OF {v0}").count() == n0
    )
    got = ses.sql(
        f"SELECT count(*) AS n FROM tab VERSION AS OF {v0} "
        "WHERE event_type = 'view'"
    ).collect()[0]["n"]
    assert got == n_view
    # unknown table names pass through to Spark's own resolution
    spark.range(3).createOrReplaceTempView("not_managed")
    assert ses.sql("SELECT * FROM not_managed").count() == 3


def test_sql_maintenance_verbs(spark, session):
    ses, target, ev = session
    ses.sql("DELETE FROM tab WHERE event_type = 'click'")  # dv mode: debt
    hist = ses.sql("DESCRIBE HISTORY tab")
    assert hist.count() >= 2  # create + delete at least
    st = ses.sql("OPTIMIZE tab ZORDER BY (value)")
    assert st["n_files_after"] >= 1
    # optimize materialized the DVs; vacuum (default grace) reclaims
    # nothing yet because displaced files are fresh — RETAIN syntax
    # parses and the call is safe beside the snapshot we just made
    out = ses.sql("VACUUM tab RETAIN 2 VERSIONS")
    assert out["n_vacuumed"] == 0
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert ses.sql("SELECT * FROM tab").count() == ev.count() - n_click


def test_update_rows_composes_with_column_mapping(spark, tmp_path):
    """UPDATE after a metadata-only rename: SET references the LOGICAL
    name, rewritten/appended files keep the frozen PHYSICAL name."""
    import pyarrow.parquet as pq

    from dbt_slabbing_spark.operators.layout import rename_column

    t = str(tmp_path / "updren")
    append_files(
        spark, t, spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    )
    rename_column(t, "v", "amount")
    update_rows(spark, t, "k = 1", {"amount": "amount + 5"}, mode="cow")
    update_rows(spark, t, "k = 2", {"amount": "amount + 5"}, mode="dv")
    assert sorted(map(tuple, read_table(spark, t).collect())) == [
        (1, 15.0), (2, 25.0),
    ]
    phys = {
        c
        for f in pathlib.Path(t).glob("part-update-*.parquet")
        for c in pq.read_schema(str(f)).names
    }
    assert phys == {"k", "v"}  # physical schema never forks


def test_sql_insert_overwrite_full_refresh(spark, session):
    ses, target, ev = session
    n0 = ses.sql("SELECT * FROM tab").count()
    v0 = manifest_versions(target)[-1]
    st = ses.sql(
        "INSERT OVERWRITE tab "
        "SELECT event_id, user_id, event_type, value FROM tab "
        "WHERE event_type = 'purchase'"
    )
    n_purchase = ev.filter(F.col("event_type") == "purchase").count()
    assert st["rows_after"] == n_purchase
    assert ses.sql("SELECT * FROM tab").count() == n_purchase
    # the pre-overwrite snapshot survives: restorable in one commit
    ses.sql(f"RESTORE TABLE tab TO VERSION AS OF {v0}")
    assert ses.sql("SELECT * FROM tab").count() == n0
    # constraints gate the overwrite too
    from dbt_slabbing_spark.operators.layout import add_constraint

    add_constraint(spark, target, "v_pos", "value >= 0")
    with pytest.raises(ConstraintViolationError):
        ses.sql("INSERT OVERWRITE tab VALUES (1, 1, 'bad', -1.0)")
    assert ses.sql("SELECT * FROM tab").count() == n0  # rejected whole


def test_run_models_manifest_materialization(spark, tmp_path):
    from dbt_slabbing_spark.operators.layout import manifest_versions, read_table
    from dbt_slabbing_spark.plans.model_runner import run_models

    ev = table(spark, SF_SMOKE, "events").select("event_id", "event_type", "value")
    models = {
        "stg": "SELECT event_type, value FROM {{ source('events') }} "
               "WHERE value < 200",
        "mart": "SELECT event_type, count(*) AS n FROM {{ ref('stg') }} "
                "GROUP BY event_type",
    }
    out1 = run_models(
        spark, models, {"events": ev},
        materialize="manifest", base_dir=str(tmp_path),
    )
    assert (tmp_path / "stg" / "_manifest.json").exists()
    assert (tmp_path / "mart" / "_manifest.json").exists()
    n_types = out1["mart"].count()
    # re-run = full refresh: new version per model, same content
    out2 = run_models(
        spark, models, {"events": ev},
        materialize="manifest", base_dir=str(tmp_path),
    )
    assert out2["mart"].count() == n_types
    assert len(manifest_versions(str(tmp_path / "mart"))) >= 2
    got = {r["event_type"]: r["n"] for r in read_table(
        spark, str(tmp_path / "mart")).collect()}
    want = {
        r["event_type"]: r["n"]
        for r in ev.filter(F.col("value") < 200)
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_describe_detail(spark, session):
    ses, target, ev = session
    row = ses.sql("DESCRIBE DETAIL tab").collect()[0]
    assert row["location"] == target
    assert row["n_files"] >= 1 and row["size_bytes"] > 0
    assert row["n_dv_files"] == 0 and row["cluster_by"] is None
    assert row["ts"] is not None
    ses.sql("DELETE FROM tab WHERE event_id % 5 = 0")  # dv-mode session
    row = ses.sql("DESCRIBE DETAIL tab").collect()[0]
    assert row["n_dv_files"] == 1
    with pytest.raises(SqlDmlError, match="unsupported DESCRIBE form"):
        ses.sql("DESCRIBE EXTENDED tab")


def test_create_or_replace_and_if_not_exists(spark, tmp_path, session):
    ses, target, ev = session
    ses.base_dir = str(tmp_path)
    ses.sql("CREATE TABLE ctas1 AS SELECT 1 AS k, 'a' AS tag")
    assert ses.sql("SELECT * FROM ctas1").count() == 1
    # IF NOT EXISTS on an existing table: clean no-op
    st = ses.sql("CREATE TABLE IF NOT EXISTS ctas1 AS SELECT 2 AS k, 'b' AS tag")
    assert st == {"table": "ctas1", "created": False}
    assert ses.sql("SELECT * FROM ctas1").first()["k"] == 1
    # OR REPLACE: one-commit full refresh, history preserved
    from dbt_slabbing_spark.operators.layout import manifest_versions

    path = ses.tables["ctas1"]
    v_before = manifest_versions(path)[-1]
    ses.sql(
        "CREATE OR REPLACE TABLE ctas1 AS "
        "SELECT id AS k, 'b' AS tag FROM range(5)"
    )
    assert ses.sql("SELECT * FROM ctas1").count() == 5
    assert (
        ses.sql(f"SELECT * FROM ctas1 VERSION AS OF {v_before}").first()["k"]
        == 1
    )
    # plain CREATE on an existing table still rejects
    with pytest.raises(SqlDmlError, match="already exists"):
        ses.sql("CREATE TABLE ctas1 AS SELECT 3 AS k")
    with pytest.raises(SqlDmlError, match="exclusive"):
        ses.sql("CREATE OR REPLACE TABLE IF NOT EXISTS ctas1 AS SELECT 3 AS k")
