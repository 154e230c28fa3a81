"""sql_recursive_reachability's engine SQL carries a depth-bound-derived
semi-join prefilter (r14 optimization); this pins its equivalence to the
unfiltered statement of the semantics (the oracle's form) so a future
edit to either twin can't silently diverge."""

from __future__ import annotations

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.queries.advanced_sql import _REACH_SQL, _REACH_SQL_ENGINE
from tests.conftest import SF_SMOKE


def test_prefiltered_reachability_equals_unfiltered(spark):
    table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("_reach_li")
    table(spark, SF_SMOKE, "supplier").createOrReplaceTempView("_reach_supp")
    kw = dict(supplier="_reach_supp", lineitem="_reach_li")
    ref = spark.sql(_REACH_SQL.format(**kw)).toPandas()
    opt = spark.sql(_REACH_SQL_ENGINE.format(**kw)).toPandas()
    assert len(ref) > 1  # non-vacuous: the BFS actually reaches nodes
    ref = ref.sort_values("node").reset_index(drop=True)
    opt = opt.sort_values("node").reset_index(drop=True)
    assert ref.equals(opt)
