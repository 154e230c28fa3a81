"""sql_recursive_reachability's engine path carries a depth-bound-derived
semi-join prefilter (r14) and, since r15, materializes the prefiltered
edge relation once per call (the UnionLoop joins a LocalRelation instead
of re-running the edge build every iteration); this pins the full engine
path's equivalence to the unfiltered statement of the semantics (the
oracle's form) so a future edit to either twin can't silently diverge."""

from __future__ import annotations

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.queries.advanced_sql import (
    _REACH_EDGES_SQL,
    _REACH_SQL,
    _REACH_SQL_ENGINE,
    sql_recursive_reachability,
)
from tests.conftest import SF_SMOKE


def test_prefiltered_reachability_equals_unfiltered(spark):
    table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("_reach_li")
    table(spark, SF_SMOKE, "supplier").createOrReplaceTempView("_reach_supp")
    ref = spark.sql(
        _REACH_SQL.format(supplier="_reach_supp", lineitem="_reach_li")
    ).toPandas()
    # the engine path exactly as the registered query runs it: prefiltered
    # edges materialized once, recursion over the LocalRelation
    edges = spark.sql(
        _REACH_EDGES_SQL.format(supplier="_reach_supp", lineitem="_reach_li")
    )
    spark.createDataFrame(edges.collect(), edges.schema).createOrReplaceTempView(
        "_reach_edges"
    )
    opt = spark.sql(
        _REACH_SQL_ENGINE.format(supplier="_reach_supp", edges="_reach_edges")
    ).toPandas()
    assert len(ref) > 1  # non-vacuous: the BFS actually reaches nodes
    ref = ref.sort_values("node").reset_index(drop=True)
    opt = opt.sort_values("node").reset_index(drop=True)
    assert ref.equals(opt)


def test_registered_query_fn_matches_unfiltered(spark):
    # belt-and-braces: the actual registered fn (which does its own view
    # registration + materialization) equals the unfiltered semantics
    table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("_reach_li")
    table(spark, SF_SMOKE, "supplier").createOrReplaceTempView("_reach_supp")
    ref = (
        spark.sql(_REACH_SQL.format(supplier="_reach_supp", lineitem="_reach_li"))
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    got = (
        sql_recursive_reachability(spark, SF_SMOKE)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert ref.equals(got)
