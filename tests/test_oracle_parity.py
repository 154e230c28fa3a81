"""Differential testing: every corpus query with an oracle must match
DuckDB bit-for-bit at sf0.001 (the driver re-runs the same gate at
sf0.01). Oracle-less queries get a smoke run (schema + runnable).
"""

from __future__ import annotations

import pytest

from dbt_slabbing_spark.queries import registry
from tests.canonical import assert_frames_match
from tests.conftest import SF_SMOKE

_REG = registry()
_WITH_ORACLE = sorted(n for n, q in _REG.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _REG.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    q = _REG[name]
    spark_pdf = q.fn(spark, SF_SMOKE).toPandas()
    oracle_pdf = duck.sql(q.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_smoke(spark, name):
    q = _REG[name]
    df = q.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    # every oracle key must exist in queries()
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
