"""Zero-copy shallow clone (`clone_table`) and the SQL DDL dispatch
(`ManifestSession`: CTAS / ALTER TABLE / DROP TABLE)."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.layout import (
    ConstraintViolationError,
    append_files,
    clone_table,
    compact_table,
    delete_rows,
    read_table,
    vacuum_orphans,
)
from dbt_slabbing_spark.plans.sql_dml import ManifestSession, SqlDmlError
from tests.conftest import SF_SMOKE


@pytest.fixture()
def src_table(spark, tmp_path):
    target = str(tmp_path / "src")
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    for i in range(3):
        append_files(spark, target, ev.filter(F.col("user_id") % 3 == i).coalesce(1))
    return target, ev


def _ident(path):
    return {
        f.name: (f.stat().st_ino, f.stat().st_mtime_ns)
        for f in pathlib.Path(path).glob("*.parquet")
    }


def test_clone_is_zero_copy_and_divergent(spark, src_table, tmp_path):
    src, ev = src_table
    dst = str(tmp_path / "dst")
    before = _ident(src)
    st = clone_table(src, dst)
    assert st["n_bytes_copied"] == 0
    # bytes shared: same inodes on both sides
    for n, (ino, _) in before.items():
        assert (pathlib.Path(dst) / n).stat().st_ino == ino
    # clone-side mutations never touch the source
    delete_rows(spark, dst, "event_type = 'click'", mode="dv")
    compact_table(spark, dst, target_file_bytes=1 << 30)
    vacuum_orphans(dst, retain_versions=0, grace_seconds=0.0)
    assert _ident(src) == before
    assert read_table(spark, src).count() == ev.count()
    assert (
        read_table(spark, dst).count()
        == ev.filter(F.col("event_type") != "click").count()
    )
    # source-side mutations never touch the clone
    n_clone = read_table(spark, dst).count()
    delete_rows(spark, src, "event_type = 'error'", mode="cow")
    vacuum_orphans(src, retain_versions=0, grace_seconds=0.0)
    assert read_table(spark, dst).count() == n_clone


def test_clone_carries_dv_and_guards(spark, src_table, tmp_path):
    src, ev = src_table
    delete_rows(spark, src, "event_type = 'signup'", mode="dv")
    dst = str(tmp_path / "dst2")
    clone_table(src, dst)
    # the clone sees the same DV-applied content
    assert (
        read_table(spark, dst).filter(F.col("event_type") == "signup").count()
        == 0
    )
    assert read_table(spark, dst).count() == read_table(spark, src).count()
    with pytest.raises(ValueError, match="already a table"):
        clone_table(src, dst)
    with pytest.raises(ValueError, match="must be a manifest table"):
        clone_table(str(tmp_path / "nope"), str(tmp_path / "dst3"))


def test_sql_ddl_roundtrip(spark, src_table, tmp_path):
    src, ev = src_table
    ses = ManifestSession(spark, base_dir=str(tmp_path)).register("raw", src)
    ses.sql(
        "CREATE TABLE mart AS "
        "SELECT event_id, event_type AS kind, value FROM raw WHERE value < 200"
    )
    assert (pathlib.Path(tmp_path) / "mart" / "_manifest.json").exists()
    ses.sql("ALTER TABLE mart ADD CONSTRAINT v_pos CHECK (value >= 0)")
    with pytest.raises(ConstraintViolationError):
        ses.sql("INSERT INTO mart VALUES (1, 'bad', -1.0)")
    ses.sql("ALTER TABLE mart RENAME COLUMN kind TO category")
    ses.sql("ALTER TABLE mart DROP COLUMN event_id")
    assert set(ses.sql("SELECT * FROM mart").columns) == {"category", "value"}
    n = ev.filter(F.col("value") < 200).count()
    assert ses.sql("SELECT * FROM mart").count() == n
    # constraint still enforced after the column-mapping commits
    with pytest.raises(ConstraintViolationError):
        ses.sql("INSERT INTO mart (category, value) VALUES ('bad', -2.0)")
    ses.sql("DROP TABLE mart PURGE")
    assert not (pathlib.Path(tmp_path) / "mart").exists()
    with pytest.raises(SqlDmlError, match="unknown manifest table"):
        ses.sql("DELETE FROM mart")


def test_sql_ddl_guards(spark, src_table, tmp_path):
    src, ev = src_table
    ses = ManifestSession(spark).register("raw", src)
    with pytest.raises(SqlDmlError, match="base_dir"):
        ses.sql("CREATE TABLE t2 AS SELECT 1 AS x")
    with pytest.raises(SqlDmlError, match="unsupported ALTER"):
        ses.sql("ALTER TABLE raw SET TBLPROPERTIES ('a'='b')")
    with pytest.raises(SqlDmlError, match="already exists"):
        ManifestSession(spark, base_dir=str(tmp_path)).register(
            "raw", src
        ).sql("CREATE TABLE raw AS SELECT 1 AS x")


def test_restore_table_roundtrip(spark, src_table, tmp_path):
    """RESTORE: snapshot n becomes current via one NEW metadata commit;
    history preserved (the restore is restorable away); DVs of the
    restored snapshot come back; vacuumed snapshots refuse."""
    from dbt_slabbing_spark.operators.layout import (
        manifest_versions,
        restore_table,
        vacuum_orphans,
    )

    src, ev = src_table
    v1 = manifest_versions(src)[-1]
    n1 = read_table(spark, src).count()
    delete_rows(spark, src, "event_type = 'click'", mode="dv")
    v2 = manifest_versions(src)[-1]
    n2 = read_table(spark, src).count()
    append_files(
        spark, src,
        spark.createDataFrame(
            [(10_000_001, 1, "late", 1.0)],
            "event_id long, user_id long, event_type string, value double",
        ),
    )
    st = restore_table(src, v1)
    assert st["restored_version"] == v1
    assert read_table(spark, src).count() == n1  # clicks resurrected
    # history intact: restore the DV snapshot back
    restore_table(src, v2)
    assert read_table(spark, src).count() == n2
    assert (
        read_table(spark, src).filter(F.col("event_type") == "click").count()
        == 0
    )
    # a vacuumed boundary refuses cleanly
    compact_table(spark, src, target_file_bytes=1 << 30)
    vacuum_orphans(src, retain_versions=0, grace_seconds=0.0)
    with pytest.raises(FileNotFoundError, match="already vacuumed"):
        restore_table(src, v1)


def test_sql_restore_and_shallow_clone_verbs(spark, src_table, tmp_path):
    from dbt_slabbing_spark.operators.layout import manifest_versions

    src, ev = src_table
    ses = ManifestSession(spark, base_dir=str(tmp_path)).register("raw", src)
    v1 = manifest_versions(src)[-1]
    n1 = ses.sql("SELECT * FROM raw").count()
    ses.sql("DELETE FROM raw WHERE event_type = 'signup'")
    st = ses.sql(f"RESTORE TABLE raw TO VERSION AS OF {v1}")
    assert st["restored_version"] == v1
    assert ses.sql("SELECT * FROM raw").count() == n1
    st2 = ses.sql("CREATE TABLE branch SHALLOW CLONE raw")
    assert st2["n_bytes_copied"] == 0
    ses.sql("DELETE FROM branch WHERE event_type = 'signup'")
    assert ses.sql("SELECT * FROM raw").count() == n1  # source untouched
    assert (
        ses.sql("SELECT * FROM branch").count()
        == n1 - ev.filter(F.col("event_type") == "signup").count()
    )
