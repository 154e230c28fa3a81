"""Rich MERGE clause engine (`merge_rows` clause params + the SQL
dispatcher's full MERGE grammar): semantics, CDF classification,
constraint gating, crash windows, and clause-order reproduction.
"""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

import dbt_slabbing_spark.operators.layout as L
from dbt_slabbing_spark.operators.layout import (
    ConstraintViolationError,
    add_constraint,
    append_files,
    manifest_versions,
    merge_rows,
    read_changes,
    read_table,
)
from dbt_slabbing_spark.plans.sql_dml import ManifestSession, SqlDmlError


@pytest.fixture()
def base(spark, tmp_path):
    target = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, float(i), "old") for i in range(20)], "k long, v double, tag string"
    )
    append_files(spark, target, df.coalesce(4))
    src = spark.createDataFrame(
        [(3, 100.0, "src"), (4, -1.0, "src"), (30, 50.0, "new"), (31, -5.0, "new")],
        "k long, v double, tag string",
    )
    return target, src


CLAUSES = dict(
    when_matched_delete="s.v < 0",  # k=4 dies
    when_matched_update={"v": "t.v + s.v", "tag": "'upd'"},  # k=3 -> 103
    when_not_matched_insert="s.v > 0",  # k=30 in, k=31 out
    when_not_matched_by_source_delete="t.k >= 18",  # k=18,19 die
)


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_clause_semantics(spark, base, mode):
    target, src = base
    st = merge_rows(spark, target, src, on="k", mode=mode, **CLAUSES)
    assert st["rows_updated"] == 1
    assert st["rows_deleted"] == 3
    assert st["rows_inserted"] == 1
    assert st["rows_after"] == 18
    if mode == "dv":
        assert st["n_files_rewritten"] == 0
    rows = {r["k"]: r for r in read_table(spark, target).collect()}
    assert set(rows) == set(range(18)) - {4} | {30}
    assert rows[3]["v"] == 103.0 and rows[3]["tag"] == "upd"
    assert rows[30]["tag"] == "new"
    assert rows[5]["v"] == 5.0 and rows[5]["tag"] == "old"  # unclaimed matched?  # noqa: E501 -- k=5 is unmatched-by-source and survives (not >= 18)


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_cdf_classifies_merge_deletes_and_updates(spark, base, mode):
    target, src = base
    v0 = manifest_versions(target)[-1]
    merge_rows(spark, target, src, on="k", mode=mode, **CLAUSES)
    v1 = manifest_versions(target)[-1]
    ch = read_changes(spark, target, v0, v1, keys=["k"]).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], set()).add(r["k"])
    # delete-by-merge rows classify as deletes; updates pair pre/post
    assert by_type["delete"] == {4, 18, 19}
    assert by_type["update_preimage"] == {3}
    assert by_type["update_postimage"] == {3}
    assert by_type["insert"] == {30}
    post = [r for r in ch if r["_change_type"] == "update_postimage"][0]
    assert post["v"] == 103.0


def test_matched_row_claimed_by_no_clause_survives_untouched(spark, base):
    """Files holding ONLY unclaimed rows must not be rewritten (cow)."""
    target, src = base
    # delete-only merge: only k=4 dies; k=3/30/31 match no clause
    st = merge_rows(
        spark, target, src, on="k", mode="cow",
        when_matched_update=None, when_matched_delete="s.v < 0",
        when_not_matched_insert=False,
    )
    assert st["rows_deleted"] == 1 and st["rows_updated"] == 0
    assert st["rows_inserted"] == 0
    # only the one file holding k=4 is rewritten
    assert st["n_files_rewritten"] == 1
    assert read_table(spark, target).count() == 19


def test_constraints_gate_images_not_raw_source(spark, base):
    """A delete-only merge with a constraint-violating source column
    must pass (nothing violating lands); an UPDATE producing violating
    images must reject before commit."""
    target, src = base
    add_constraint(spark, target, "vpos", "v >= 0")
    # source has v<0 rows, but delete-only merges land nothing
    st = merge_rows(
        spark, target, src, on="k", mode="cow",
        when_matched_update=None, when_matched_delete="s.v < 0",
        when_not_matched_insert=False,
    )
    assert st["rows_deleted"] == 1
    n = read_table(spark, target).count()
    # an update whose IMAGES violate the constraint rejects atomically
    with pytest.raises(ConstraintViolationError):
        merge_rows(
            spark, target, src, on="k", mode="cow",
            when_matched_update={"v": "0.0 - abs(t.v) - 1.0"},
            when_not_matched_insert=False,
        )
    assert read_table(spark, target).count() == n
    assert read_table(spark, target).filter("v < 0").count() == 0


def test_crash_window_staged_files_invisible(spark, base, monkeypatch):
    """Crash after staging but before commit: staged merge files are
    invisible orphans; the table reads at the old snapshot."""
    target, src = base
    before = sorted(map(tuple, read_table(spark, target).collect()))
    orig = L._commit_manifest

    def boom(*a, **kw):
        raise RuntimeError("simulated crash at commit point")

    monkeypatch.setattr(L, "_commit_manifest", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_rows(spark, target, src, on="k", mode="cow", **CLAUSES)
    monkeypatch.setattr(L, "_commit_manifest", orig)
    # staged part-merge files exist on disk but are not referenced
    p = pathlib.Path(target)
    orphans = list(p.glob("part-merge-*.parquet"))
    assert orphans  # staging happened
    assert sorted(map(tuple, read_table(spark, target).collect())) == before
    # and the retried merge succeeds
    st = merge_rows(spark, target, src, on="k", mode="cow", **CLAUSES)
    assert st["rows_after"] == 18


def test_sql_update_first_statement_order(spark, base):
    """UPDATE-before-DELETE statement order: rows satisfying BOTH
    conditions go to the UPDATE clause (first wins)."""
    target, src = base
    ses = ManifestSession(spark, mode="cow").register("mtab", target)
    src.createOrReplaceTempView("mchg")
    st = ses.sql(
        "MERGE INTO mtab USING mchg ON mtab.k = mchg.k "
        "WHEN MATCHED AND mchg.v < 200 THEN UPDATE SET tag = 'low' "
        "WHEN MATCHED THEN DELETE"
    )
    # matched keys: 3 (v=100 -> update-first claims it), 4 (v=-1 -> update)
    assert st["rows_updated"] == 2 and st["rows_deleted"] == 0
    rows = {r["k"]: r["tag"] for r in read_table(spark, target).collect()}
    assert rows[3] == "low" and rows[4] == "low"


def test_sql_merge_rejections_name_the_clause(spark, base):
    target, src = base
    ses = ManifestSession(spark, mode="cow").register("mtab", target)
    src.createOrReplaceTempView("mchg")
    cases = {
        "WHEN MATCHED THEN INSERT *": "unsupported WHEN MATCHED action",
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (1)": "count mismatch",
        "WHEN NOT MATCHED THEN INSERT ROW": "unsupported WHEN NOT MATCHED",
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *": "no source row",
        "WHEN MATCHED THEN UPDATE SET v = 1 WHEN MATCHED THEN DELETE": (
            "needs an AND condition"
        ),
    }
    for clause, msg in cases.items():
        with pytest.raises(SqlDmlError, match=msg):
            ses.sql(f"MERGE INTO mtab USING mchg ON mtab.k = mchg.k {clause}")
    # table untouched by all rejections
    assert read_table(spark, target).count() == 20


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_not_matched_by_source_update(spark, base, mode):
    """Delta's WHEN NOT MATCHED BY SOURCE THEN UPDATE (mark-stale):
    assignments see target columns only; delete clause wins first;
    CDF pairs the stale rows as updates."""
    target, src = base
    v0 = manifest_versions(target)[-1]
    st = merge_rows(
        spark, target, src, on="k", mode=mode,
        when_matched_update=None,
        when_not_matched_insert=False,
        when_not_matched_by_source_delete="t.k < 2",
        when_not_matched_by_source_update={"tag": "'stale'", "v": "t.v + 0.5"},
        when_not_matched_by_source_update_condition="t.k >= 18",
    )
    assert st["rows_deleted"] == 2  # k=0,1
    assert st["rows_updated"] == 2  # k=18,19
    rows = {r["k"]: r for r in read_table(spark, target).collect()}
    assert 0 not in rows and 1 not in rows
    assert rows[18]["tag"] == "stale" and rows[18]["v"] == 18.5
    assert rows[3]["tag"] == "old"  # matched but no matched clause
    ch = read_changes(
        spark, target, v0, manifest_versions(target)[-1], keys=["k"]
    )
    by = {}
    for r in ch.collect():
        by.setdefault(r["_change_type"], set()).add(r["k"])
    assert by["delete"] == {0, 1}
    assert by["update_preimage"] == {18, 19}
    assert by["update_postimage"] == {18, 19}


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_insert_column_list_values(spark, base, mode):
    """WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs): the insert
    row builds from source-side expressions, unlisted target columns
    NULL-fill; the column list must include the join keys."""
    target, src = base
    st = merge_rows(
        spark, target, src, on="k", mode=mode,
        when_matched_update=None,
        when_not_matched_insert="s.v > 0",
        when_not_matched_insert_values={"k": "s.k", "v": "s.v * 2"},
    )
    assert st["rows_inserted"] == 1  # k=30 (v=50); k=31 filtered
    rows = {r["k"]: r for r in read_table(spark, target).collect()}
    assert rows[30]["v"] == 100.0 and rows[30]["tag"] is None
    with pytest.raises(ValueError, match="join keys"):
        merge_rows(
            spark, target, src, on="k",
            when_matched_update=None,
            when_not_matched_insert_values={"v": "s.v"},
        )
    with pytest.raises(ValueError, match="unknown target columns"):
        merge_rows(
            spark, target, src, on="k",
            when_matched_update=None,
            when_not_matched_insert_values={"k": "s.k", "nope": "1"},
        )


def test_sql_insert_column_list_and_update_alias(spark, base):
    target, src = base
    ses = ManifestSession(spark, mode="cow").register("mtab", target)
    src.createOrReplaceTempView("mchg")
    st = ses.sql(
        "MERGE INTO mtab USING mchg ON mtab.k = mchg.k "
        "WHEN NOT MATCHED AND mchg.v > 0 THEN "
        "INSERT (k, v) VALUES (mchg.k, mchg.v * 2)"
    )
    assert st["rows_inserted"] == 1 and st["rows_updated"] == 0
    rows = {r["k"]: r for r in read_table(spark, target).collect()}
    assert rows[30]["v"] == 100.0 and rows[30]["tag"] is None
    # count mismatch is a named rejection
    with pytest.raises(SqlDmlError, match="count mismatch"):
        ses.sql(
            "MERGE INTO mtab USING mchg ON mtab.k = mchg.k "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (mchg.k)"
        )
    # UPDATE with a table alias; literal containing the alias survives
    ses.sql("UPDATE mtab AS u SET u.tag = 'u.kept' WHERE u.k = 2")
    assert rows_tag(ses, 2) == "u.kept"


def rows_tag(ses, k):
    return ses.sql(f"SELECT tag FROM mtab WHERE k = {k}").first()[0]
