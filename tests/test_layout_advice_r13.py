"""Round-13 ADVICE regressions: restore-vs-constraint invariant, meta
column name collisions, and SQL front-end ANSI semantics.

1. `restore_table` to a version predating an ADD CONSTRAINT must
   re-validate the restored snapshot and reject if current CHECK
   constraints would be violated (the invariant every write path and
   add_constraint's rebase carefully preserve).
2. `update_rows` must not drop a user column that merely STARTS with a
   meta-column prefix (e.g. '_filename') from cow rewrites.
3. `INSERT` with a value not castable to the target column type must
   error (ANSI), not silently become NULL and sail past CHECK
   constraints.
4. `INSERT OVERWRITE t (subset_cols)` must NULL-fill the unspecified
   target columns, not narrow the table schema.
5. `UPDATE ... SET v = (scalar subquery WITH a WHERE)` and string
   literals containing ' WHERE ' must not mis-split the statement.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.layout import (
    ConstraintViolationError,
    add_constraint,
    append_files,
    delete_rows,
    manifest_versions,
    read_table,
    restore_table,
    update_rows,
)
from dbt_slabbing_spark.plans.sql_dml import ManifestSession, SqlDmlError
from tests.conftest import SF_SMOKE


def test_restore_past_add_constraint_rejected(spark, tmp_path):
    """v1 holds negative values; DELETE purges them; ADD CONSTRAINT
    pins value >= 0. RESTORE to v1 would smuggle the violating rows
    back in — it must reject BEFORE committing anything."""
    target = str(tmp_path / "t")
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") - 5).alias("value")
    )
    append_files(spark, target, df.coalesce(2))  # 5 negative rows
    dirty = manifest_versions(target)[-1]
    delete_rows(spark, target, "value < 0")  # clean
    clean = manifest_versions(target)[-1]
    add_constraint(spark, target, "nonneg", "value >= 0")
    with pytest.raises(
        ConstraintViolationError, match=f"restore to version {dirty}"
    ):
        restore_table(target, dirty, spark=spark)
    # nothing was committed: table still at the clean snapshot
    assert read_table(spark, target).filter("value < 0").count() == 0
    # restoring to the already-valid version still works
    st = restore_table(target, clean, spark=spark)
    assert st["restored_version"] == clean
    assert read_table(spark, target).count() == 15


def test_update_rows_keeps_user_column_with_meta_prefix(spark, tmp_path):
    """'_filename' is DATA (only the exact names _file/__dv_name/
    __dv_pos are scan metadata) — a cow UPDATE rewrite must keep it."""
    target = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("value"),
        F.concat(F.lit("doc-"), F.col("id")).alias("_filename"),
    )
    append_files(spark, target, df.coalesce(1))
    st = update_rows(spark, target, "k >= 5", {"value": "value * 2"}, mode="cow")
    assert st["rows_updated"] == 5
    out = read_table(spark, target)
    assert "_filename" in out.columns
    assert out.filter(F.col("_filename").isNull()).count() == 0
    assert out.filter("k = 7").select("value").first()[0] == 14.0


@pytest.fixture()
def session(spark, tmp_path):
    target = str(tmp_path / "events")
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    append_files(spark, target, ev.coalesce(2))
    return ManifestSession(spark, mode="cow").register("tab", target), ev


def test_insert_uncastable_value_errors(spark, session):
    ses, ev = session
    n0 = ses.sql("SELECT count(*) AS n FROM tab").first()["n"]
    with pytest.raises(SqlDmlError, match="not castable"):
        ses.sql(
            "INSERT INTO tab (event_id, user_id, event_type, value) "
            "VALUES ('abc', 1, 'click', 1.0)"
        )
    # rejected before any commit
    assert ses.sql("SELECT count(*) AS n FROM tab").first()["n"] == n0
    # castable strings still insert (implicit ANSI cast)
    ses.sql(
        "INSERT INTO tab (event_id, user_id, event_type, value) "
        "VALUES ('123456789', 1, 'click', 1.0)"
    )
    assert ses.sql("SELECT count(*) AS n FROM tab").first()["n"] == n0 + 1


def test_insert_overwrite_subset_null_fills(spark, session):
    ses, ev = session
    before_cols = set(ses.sql("SELECT * FROM tab").columns)
    ses.sql(
        "INSERT OVERWRITE tab (event_id, user_id) VALUES (1, 10), (2, 20)"
    )
    out = ses.sql("SELECT * FROM tab")
    assert set(out.columns) == before_cols  # schema NOT narrowed
    rows = {r["event_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["event_type"] is None and rows[1]["value"] is None
    assert rows[2]["user_id"] == 20


def test_update_where_inside_scalar_subquery_and_literal(spark, session):
    ses, ev = session
    # scalar subquery with its own WHERE inside the SET expression:
    # the statement-level WHERE is the SECOND, top-level one
    ses.sql(
        "UPDATE tab SET value = (SELECT max(value) FROM tab WHERE "
        "event_type = 'click') WHERE event_id = 0"
    )
    mx = ev.filter("event_type = 'click'").agg(F.max("value")).first()[0]
    got = ses.sql("SELECT value FROM tab WHERE event_id = 0").first()[0]
    assert got == pytest.approx(mx)
    # string literal containing ' WHERE ' must not split the statement
    ses.sql(
        "UPDATE tab SET event_type = 'a WHERE b' WHERE event_id = 1"
    )
    assert (
        ses.sql("SELECT event_type FROM tab WHERE event_id = 1").first()[0]
        == "a WHERE b"
    )
    # and a statement with NO top-level WHERE updates everything
    ses.sql("UPDATE tab SET user_id = user_id")
    assert ses.sql("SELECT count(*) AS n FROM tab").first()["n"] == ev.count()


def test_add_column_metadata_only(spark, tmp_path):
    """ALTER TABLE ADD COLUMN: typed NULL everywhere until written,
    real values win once written, survives mutations, time travel to
    pre-add versions lacks it, dropped added names stay dropped."""
    from dbt_slabbing_spark.operators.layout import (
        add_column,
        append_files,
        delete_rows,
        drop_column,
        manifest_versions,
        merge_rows,
        read_table,
    )

    t = str(tmp_path / "t")
    append_files(
        spark, t, spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    )
    v_pre = manifest_versions(t)[-1]
    add_column(t, "score", "double")
    out = read_table(spark, t)
    assert out.schema["score"].dataType.typeName() == "double"
    assert out.filter(F.col("score").isNotNull()).count() == 0
    # time travel applies CURRENT schema metadata (same convention as
    # rename/drop): the pre-add snapshot shows the column as all-NULL
    tt = read_table(spark, t, version=v_pre)
    assert "score" in tt.columns
    assert tt.filter(F.col("score").isNotNull()).count() == 0
    # a write carrying the column: real values win, NULLs elsewhere
    append_files(
        spark,
        t,
        spark.createDataFrame([(3, 30.0, 9.5)], "k long, v double, score double"),
    )
    vals = {r["k"]: r["score"] for r in read_table(spark, t).collect()}
    assert vals == {1: None, 2: None, 3: 9.5}
    # mutations see and preserve the added column (merge images too)
    merge_rows(
        spark,
        t,
        spark.createDataFrame([(1,)], "k long"),
        on="k",
        when_matched_update={"score": "100.0"},
        when_not_matched_insert=False,
    )
    vals = {r["k"]: r["score"] for r in read_table(spark, t).collect()}
    assert vals[1] == 100.0 and vals[3] == 9.5
    delete_rows(spark, t, "score IS NULL AND k = 2")
    assert read_table(spark, t).count() == 2
    # duplicate / collision guards
    with pytest.raises(ValueError, match="already exists"):
        add_column(t, "v", "int")
    drop_column(t, "score")
    assert "score" not in read_table(spark, t).columns
    with pytest.raises(ValueError, match="dropped physical name"):
        add_column(t, "score", "int")
    # bad type string rejects before any commit
    with pytest.raises(Exception):
        add_column(t, "x", "not_a_type!!")
