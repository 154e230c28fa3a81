"""SQL front-end hardening: the dispatcher must REJECT near-miss
statements with a clean SqlDmlError naming what it can't parse — never
silently mis-dispatch into the wrong mutation. ≥20 adversarial
statements across every verb family, plus positive controls proving
the awkward-but-legal forms (newlines, subqueries, quoted literals)
still dispatch correctly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.layout import append_files, read_table
from dbt_slabbing_spark.plans.sql_dml import ManifestSession, SqlDmlError
from tests.conftest import SF_SMOKE


@pytest.fixture()
def ses(spark, tmp_path):
    target = str(tmp_path / "events")
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    append_files(spark, target, ev.coalesce(2))
    ev.limit(5).createOrReplaceTempView("fuzz_src")
    return ManifestSession(spark, mode="cow", base_dir=str(tmp_path)).register(
        "tab", target
    )


# (statement, fragment the rejection message must contain)
ADVERSARIAL = [
    # unknown / quoted / qualified identifiers
    ('DELETE FROM "tab" WHERE 1=1', "unsupported DELETE form"),
    ("DELETE FROM db.tab WHERE 1=1", "unsupported DELETE form"),
    ("UPDATE `tab` SET value = 1", "unsupported UPDATE form"),
    ("INSERT INTO 'tab' VALUES (1)", "unsupported INSERT form"),
    ("DELETE FROM nope WHERE 1=1", "unknown manifest table"),
    # multi-statement smuggling
    ("UPDATE tab SET value = 1; DROP TABLE tab", "one statement at a time"),
    ("DELETE FROM tab; DELETE FROM tab", "one statement at a time"),
    # unsupported verbs that MUST not fall through to spark.sql
    ("TRUNCATE TABLE tab", "unsupported statement TRUNCATE"),
    ("COPY tab FROM 'x.csv'", "unsupported statement COPY"),
    # INSERT near-misses
    ("INSERT INTO tab", "unsupported INSERT form"),
    ("INSERT INTO tab (event_id VALUES (1)", "unsupported INSERT form"),
    ("INSERT OVERWRITE tab SET value = 1", "unsupported INSERT form"),
    # UPDATE near-misses
    ("UPDATE tab u v SET value = 1", "unsupported UPDATE form"),
    ("UPDATE tab SET 5 = value", "bad SET assignment"),
    ("UPDATE tab SET value value WHERE 1=1", "bad SET assignment"),
    # MERGE near-misses: every rejection names the unsupported clause
    (
        "MERGE INTO tab USING fuzz_src ON tab.event_id = fuzz_src.event_id",
        "MERGE without WHEN clauses",
    ),
    (
        "MERGE INTO tab USING fuzz_src ON tab.event_id = fuzz_src.event_id "
        "WHEN MATCHED UPDATE SET *",
        "without THEN",
    ),
    (
        "MERGE INTO tab USING fuzz_src ON tab.event_id = fuzz_src.event_id "
        "WHEN MATCHED THEN INSERT *",
        "unsupported WHEN MATCHED action",
    ),
    (
        "MERGE INTO tab USING fuzz_src ON tab.event_id = fuzz_src.event_id "
        "WHEN NOT MATCHED THEN INSERT (event_id) VALUES (1, 2)",
        "count mismatch",
    ),
    (
        "MERGE INTO tab USING fuzz_src ON tab.event_id = fuzz_src.event_id "
        "WHEN NOT MATCHED BY SOURCE THEN INSERT *",
        "unsupported WHEN NOT MATCHED BY SOURCE action",
    ),
    (
        "MERGE INTO tab USING fuzz_src ON tab.event_id = fuzz_src.event_id "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
        "no source row",
    ),
    (
        "MERGE INTO tab USING fuzz_src ON tab.event_id = fuzz_src.event_id "
        "WHEN MATCHED THEN UPDATE SET * WHEN MATCHED THEN DELETE",
        "needs an AND condition",
    ),
    (
        "MERGE INTO tab USING fuzz_src ON tab.event_id = fuzz_src.event_id "
        "WHEN MATCHED AND 1=1 THEN DELETE WHEN MATCHED AND 2=2 THEN DELETE",
        "duplicate WHEN MATCHED DELETE",
    ),
    (
        "MERGE INTO tab USING fuzz_src "
        "ON tab.event_id = fuzz_src.user_id "
        "WHEN MATCHED THEN DELETE",
        "identical column names",
    ),
    (
        "MERGE INTO tab USING fuzz_src ON tab.event_id < fuzz_src.event_id "
        "WHEN MATCHED THEN DELETE",
        "equi-joins",
    ),
    # DDL / maintenance near-misses
    ("CREATE TABLE t2 (k INT)", "unsupported CREATE form"),
    ("ALTER TABLE tab ALTER COLUMN c TYPE INT", "unsupported ALTER form"),
    ("DROP TABLE tab CASCADE", "unsupported DROP form"),
    ("OPTIMIZE tab FULL", "unsupported OPTIMIZE form"),
    ("OPTIMIZE tab ZORDER event_id", "unsupported OPTIMIZE form"),
    ("VACUUM tab RETAIN 3 DAYS", "unsupported VACUUM form"),
    ("RESTORE TABLE tab TO VERSION 3", "RESTORE form"),
]


def test_adversarial_statements_reject_cleanly(spark, ses):
    assert len(ADVERSARIAL) >= 20
    baseline = sorted(
        map(tuple, ses.sql("SELECT * FROM tab").collect())
    )
    for stmt, fragment in ADVERSARIAL:
        with pytest.raises(SqlDmlError, match=fragment):
            ses.sql(stmt)
    # zero mutations landed across all 28 rejections
    assert (
        sorted(map(tuple, ses.sql("SELECT * FROM tab").collect())) == baseline
    )


def test_awkward_but_legal_forms_still_dispatch(spark, ses):
    # newlines everywhere
    st = ses.sql("DELETE\nFROM\n  tab\nWHERE\n  value\n  >\n  1000000")
    assert st["rows_deleted"] == 0
    # quoted literal containing a verb and a semicolon
    ses.sql("UPDATE tab SET event_type = 'x; DROP TABLE tab' WHERE value < 0")
    # trailing semicolon + trailing whitespace
    n = ses.sql("SELECT count(*) AS n FROM tab ;  ").first()["n"]
    assert n > 0
    # VALUES with function calls and commas inside parens
    ses.sql(
        "INSERT INTO tab (event_id, user_id, event_type, value) "
        "VALUES (99999991, 7, concat('a', 'b'), round(1.234, 2))"
    )
    row = ses.sql(
        "SELECT event_type, value FROM tab WHERE event_id = 99999991"
    ).first()
    assert row["event_type"] == "ab" and row["value"] == pytest.approx(1.23)
    # TIMESTAMP AS OF predating every commit: clean named error, no
    # mutation (a supported form with an unsatisfiable operand)
    with pytest.raises(ValueError, match="no snapshot"):
        ses.sql("RESTORE TABLE tab TO TIMESTAMP AS OF '2020-01-01'")
