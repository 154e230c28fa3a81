"""Pins the r14 fused-percentile re-plan of agg_approx_percentiles: one
array-percentage GK sketch / one exact buffer must return exactly the
same per-percentage values as the 12 single-percentage aggregates they
replaced (same sketch, same exact algorithm — only the buffer count
changed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.queries import registry
from tests.conftest import SF_SMOKE

PS = [0.25, 0.50, 0.75, 0.95]


def test_fused_percentiles_match_singletons(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    col = "l_extendedprice"
    lo_hi = [max(p - 0.005, 0.0) for p in PS] + [min(p + 0.005, 1.0) for p in PS]
    fused = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(col, F.lit(PS), 10000).alias("_a"),
            F.percentile(col, F.lit(lo_hi)).alias("_b"),
        )
        .collect()
    )
    single_aggs = [F.percentile_approx(col, F.lit(p), 10000).alias(f"_a{i}") for i, p in enumerate(PS)]
    single_aggs += [F.percentile(col, F.lit(q)).alias(f"_b{i}") for i, q in enumerate(lo_hi)]
    single = {r["l_returnflag"]: r for r in li.groupBy("l_returnflag").agg(*single_aggs).collect()}
    assert len(fused) > 1
    for r in fused:
        s = single[r["l_returnflag"]]
        for i in range(len(PS)):
            assert r["_a"][i] == s[f"_a{i}"]
        for i in range(len(lo_hi)):
            assert r["_b"][i] == s[f"_b{i}"]


def test_exact_distribution_engine_twin_equals_oracle_form(spark):
    from dbt_slabbing_spark.queries.advanced_sql import _DIST_SQL, _DIST_SQL_ENGINE

    table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("_pct_li")
    ref = spark.sql(_DIST_SQL.format(lineitem="_pct_li")).toPandas()
    opt = spark.sql(_DIST_SQL_ENGINE.format(lineitem="_pct_li")).toPandas()
    ref = ref.sort_values("l_returnflag").reset_index(drop=True)
    opt = opt.sort_values("l_returnflag").reset_index(drop=True)
    assert len(ref) > 1
    assert ref.equals(opt[ref.columns])


def test_gate_still_all_true(spark):
    rows = registry()["agg_approx_percentiles"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 1
    for r in rows:
        assert all(r[c] for c in r.asDict() if c.endswith("_ok")), r
