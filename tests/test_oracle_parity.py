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


def test_rounding_normalizes_negative_zero_on_both_engines(spark, duck):
    """Spark's round() (BigDecimal) has no signed zero; DuckDB's double
    round keeps it, so a tiny negative rounds to 0.0 vs -0.0 and the
    driver's value hash diverges (found at sf0.1 in fn_array_suite).
    dround/sql_round end with `+ 0.0` — the IEEE idiom mapping -0.0 to
    +0.0 — so both engines emit positive zero."""
    import math

    from dbt_slabbing_spark.rounding import dround, sql_round

    [row] = (
        spark.range(1)
        .select(dround(__import__("pyspark.sql.functions", fromlist=["lit"]).lit(-0.00004), 4).alias("z"))
        .collect()
    )
    assert math.copysign(1.0, row["z"]) == 1.0
    oz = duck.sql(f"SELECT {sql_round('CAST(-0.00004 AS DOUBLE)', 4)} AS z").fetchone()[0]
    assert math.copysign(1.0, oz) == 1.0
    # and the raw DuckDB idiom WITHOUT the normalization really does
    # produce the hazard the rule defends against
    raw = duck.sql(
        "SELECT round(CAST(-0.00004 AS DOUBLE) * 10000.0) / 10000.0 AS z"
    ).fetchone()[0]
    assert math.copysign(1.0, raw) == -1.0
