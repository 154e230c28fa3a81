"""Property-based model check for the DV/COW mutation surface: a
random sequence of append / DV-delete / COW-delete / OPTIMIZE ops,
applied both to a real manifest table and to a pure-Python dict model,
must agree on the full row set after EVERY op — the same fold-model
style as the streaming hypothesis tests, aimed at the interaction
space (DV over DV, COW over DV, compaction materialization, count
bookkeeping) that example tests can only sample."""

from __future__ import annotations

import shutil

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbt_slabbing_spark.operators.layout import (
    append_files,
    compact_table,
    delete_rows,
    read_table,
)

# op encodings: ("append", [ids]) / ("del", mode, residue) — delete
# rows with id % 3 == residue — / ("compact",) / ("rename",) — flips
# the id column's logical name back and forth (column mapping)
_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(
                st.integers(min_value=0, max_value=60),
                min_size=1,
                max_size=8,
                unique=True,
            ),
        ),
        st.tuples(
            st.just("del"),
            st.sampled_from(["dv", "cow"]),
            st.integers(min_value=0, max_value=2),
        ),
        st.tuples(st.just("compact")),
        st.tuples(st.just("rename")),
    ),
    min_size=2,
    max_size=6,
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("dv_model")


@given(ops=_ops)
@settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_mutation_sequence_matches_model(spark, workdir, ops):
    target = str(workdir / "t")
    shutil.rmtree(target, ignore_errors=True)
    # ids get a per-append generation suffix so re-appended ids stay
    # distinguishable rows (multiset semantics via unique keys)
    from dbt_slabbing_spark.operators.layout import rename_column

    model: dict[int, int] = {}  # key -> id
    gen = 0
    created = False
    id_col = "id"  # current LOGICAL name of the id column
    for op in ops:
        if op[0] == "append":
            _, ids = op
            batch = [(gen * 1000 + i, i) for i in ids]
            gen += 1
            df = spark.createDataFrame(batch, f"key bigint, {id_col} bigint")
            append_files(spark, target, df.coalesce(1))
            model.update({k: i for k, i in batch})
            created = True
        elif not created:
            continue  # empty-table reads have no schema; ops wait
        elif op[0] == "del":
            _, mode, residue = op
            st_ = delete_rows(
                spark, target, f"{id_col} % 3 = {residue}", mode=mode
            )
            expected_dead = {k for k, i in model.items() if i % 3 == residue}
            assert st_["rows_deleted"] == len(expected_dead)
            assert st_["rows_before"] == len(model)
            for k in expected_dead:
                model.pop(k)
            assert st_["rows_after"] == len(model)
        elif op[0] == "rename":
            new = "ident" if id_col == "id" else "id"
            rename_column(target, id_col, new)
            id_col = new
        else:
            compact_table(spark, target, target_file_bytes=1 << 30)
        got = {
            (r["key"], r[id_col])
            for r in read_table(spark, target).collect()
        }
        assert got == set(model.items()), f"after {op}"


def test_model_smoke_requires_table(spark, workdir):
    """delete on a never-appended table adopts an empty one (no crash,
    zero counts)."""
    target = str(workdir / "empty")
    shutil.rmtree(target, ignore_errors=True)
    st_ = delete_rows(spark, target, "id % 3 = 0", mode="dv")
    assert st_ == {
        "rows_before": 0,
        "rows_deleted": 0,
        "rows_after": 0,
        "n_files_total": 0,
        "n_files_rewritten": 0,
        "n_dv_files_added": 0,
    }
