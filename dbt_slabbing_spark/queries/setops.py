"""Set operations: UNION [ALL], INTERSECT, EXCEPT, unionByName."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import register


@register(
    "setop_union_all_parties",
    """
    SELECT 'customer' AS side, c_nationkey AS nationkey, c_name AS name FROM customer
    UNION ALL
    SELECT 'supplier' AS side, s_nationkey AS nationkey, s_name AS name FROM supplier
    """,
    "UNION ALL of two aligned projections (multiset preserved)",
    tags=("setop",),
)
def setop_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("nationkey"), F.col("c_name").alias("name")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_nationkey").alias("nationkey"), F.col("s_name").alias("name")
    )
    return c.unionAll(s)


@register(
    "setop_intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    "INTERSECT (distinct semantics)",
    tags=("setop",),
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    "EXCEPT (distinct anti set)",
    tags=("setop",),
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "setop_union_by_name",
    """
    SELECT nationkey, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    "unionByName (schema aligned by column name, not position) + agg",
    tags=("setop", "agg"),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"), F.lit("c").alias("tag"))
    s = table(spark, sf_dir, "supplier").select(F.lit("s").alias("tag"), F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "setop_intersect_except_all",
    """
    WITH a AS (SELECT l_returnflag FROM lineitem WHERE l_quantity <= 25),
         b AS (SELECT l_returnflag FROM lineitem WHERE l_linestatus = 'F')
    SELECT 'intersect_all' AS op, l_returnflag, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT l_returnflag FROM a INTERSECT ALL SELECT l_returnflag FROM b)
    GROUP BY l_returnflag
    UNION ALL
    SELECT 'except_all', l_returnflag, CAST(count(*) AS BIGINT)
    FROM (SELECT l_returnflag FROM a EXCEPT ALL SELECT l_returnflag FROM b)
    GROUP BY l_returnflag
    """,
    "multiset set ops: INTERSECT ALL keeps min(multiplicity), EXCEPT "
    "ALL subtracts multiplicities — distinct-based set ops lose these "
    "counts entirely",
    tags=("setop", "multiset"),
)
def setop_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") <= 25).select("l_returnflag")
    b = li.filter(F.col("l_linestatus") == "F").select("l_returnflag")
    inter = (
        a.intersectAll(b)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "l_returnflag", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "l_returnflag", "n")
    )
    return inter.unionByName(exc)
