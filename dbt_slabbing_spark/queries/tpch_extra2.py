"""Fourth wave: the remaining TPC-H shapes q2/q9/q11/q16/q20/q21,
re-anchored on the testdata schema (no partsupp table — lineitem is the
part↔supplier link; no commit/receipt dates — lateness is ship date vs
order date). What is preserved is the OPERATOR shape:

- q2: correlated min-subquery join-back (decorrelated to a window min)
- q9: multi-join profit expression aggregated by nation × year
- q11: group aggregate filtered against a scalar-subquery fraction of
  the global total (value concentration)
- q16: count-distinct with a NOT IN anti-join on the counted key
- q20: nested IN subqueries (HAVING-filtered semi-join chain)
- q21: EXISTS + correlated NOT EXISTS self-joins, decorrelated into a
  single per-order aggregate pass

Scale notes: only the truly bounded dims (nation: 25 rows, region: 5)
carry an explicit ``F.broadcast`` hint. part/supplier/customer grow
linearly with the fact tables in TPC-H, so a hard-coded broadcast OOMs
executors at the 100 TB design point; those joins are left to
``autoBroadcastJoinThreshold`` (file-size stats pick broadcast at test
SF) and AQE's runtime broadcast conversion at scale. lineitem is only
shuffled on its aggregation key; q21 computes the per-order
supplier/late-supplier counts in ONE groupBy over the late-flagged join
instead of two correlated scans of lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from . import dround, register


@register(
    "q2_min_unit_cost_supplier",
    """
    WITH unit_costs AS (
        SELECT l_partkey, l_suppkey, s_name,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY l_partkey, l_suppkey, s_name
    )
    SELECT p_partkey, l_suppkey AS s_suppkey, s_name,
           round(unit_cost * 100.0) / 100.0 + 0.0 AS unit_cost
    FROM unit_costs uc
    JOIN part ON uc.l_partkey = p_partkey
    WHERE p_size <= 10
      AND unit_cost = (SELECT min(uc2.unit_cost) FROM unit_costs uc2
                       WHERE uc2.l_partkey = uc.l_partkey)
    """,
    "TPC-H Q2-style: cheapest supplier per part in a region "
    "(correlated min subquery, decorrelated to a window min in Spark)",
    tags=("join", "subquery", "window"),
)
def q2_min_unit_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("_uc")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(table(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(table(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name")
    )
    costs = (
        li.join(supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name")
        .agg(F.min("_uc").alias("unit_cost"))
    )
    # Correlated `min per part` decorrelates to a partition window — one
    # shuffle on l_partkey instead of a second scan + re-aggregation.
    best = F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    part = table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select("p_partkey")
    return (
        costs.withColumn("_best", best)
        .filter(F.col("unit_cost") == F.col("_best"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            dround("unit_cost", 2).alias("unit_cost"),
        )
    )


@register(
    "q9_product_type_profit",
    """
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
           round((sum(l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity))
                 * 100.0) / 100.0 + 0.0 AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(l_shipdate)
    """,
    "TPC-H Q9-style: profit (revenue minus retail-price cost proxy) by "
    "supplier nation and ship year, part-name substring filter",
    tags=("join", "agg"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    li = table(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .join(table(spark, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(dround(F.sum(profit), 2).alias("profit"))
    )


@register(
    "q11_part_value_concentration",
    """
    WITH pv AS (
        SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
        FROM lineitem
        WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        )
        GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, round(value * 100.0) / 100.0 + 0.0 AS value
    FROM pv
    WHERE value > (SELECT sum(value) * 0.001 FROM pv)
    """,
    "TPC-H Q11-style: parts whose shipped value exceeds a scalar-subquery "
    "fraction of the regional total",
    tags=("subquery", "agg"),
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    asia_supp = (
        table(spark, sf_dir, "supplier")
        .join(table(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(table(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem")
    pv = (
        li.join(asia_supp, li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    # Scalar subquery as a 1-row broadcast; the shared pv lineage lets
    # AQE reuse the aggregation exchange instead of rescanning lineitem.
    threshold = pv.agg((F.sum("value") * 0.001).alias("_thr"))
    return (
        pv.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("_thr"))
        .select(F.col("l_partkey").alias("partkey"), dround("value", 2).alias("value"))
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
    "TPC-H Q16-style: distinct supplier counts per part attribute, with a "
    "NOT IN anti-join excluding negative-balance suppliers",
    tags=("join", "agg", "subquery"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    # s_suppkey is non-null, so NOT IN is a plain anti-join (no null trap).
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .join(bad_supp, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_heavy_part_shippers",
    """
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_3', 'NATION_5')
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red%' AND l_shipdate >= TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 50
      )
    """,
    "TPC-H Q20-style: suppliers in given nations that shipped a heavy "
    "volume of matching parts (nested IN with HAVING)",
    tags=("join", "subquery", "having"),
)
def q20_heavy_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    heavy = (
        li.join(red_parts, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 50)
        .select("l_suppkey")
    )
    nations = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_3", "NATION_5")
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(nations), supp.s_nationkey == F.col("n_nationkey"), "left_semi")
        .join(heavy, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_sole_late_supplier",
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders     ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    """,
    "TPC-H Q21-style: late lines of the SOLE late supplier in "
    "multi-supplier finished orders (EXISTS + correlated NOT EXISTS, "
    "decorrelated to one per-order aggregate)",
    tags=("join", "subquery", "agg"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    # shuffle_hash on the orders side = STRATEGY pin, round 4: without
    # it the stats-less static planner BROADCASTS the F-filtered orders
    # slice at sf0.1 (file-size stats) — orders is a fact, so that
    # collect-to-driver is an OOM at the 100 TB design point. Shuffled
    # hash keeps the exchange topology (both sides hash(l_orderkey),
    # which the two stacked aggregates below reuse — group keys are
    # supersets, so lineitem still shuffles exactly once) and, unlike
    # the merge alternative, needs NO sort of either side; the build
    # side is the 2-column pre-filtered orders partition, bounded by
    # shuffle-partition sizing + AQE skew splitting at scale.
    flagged = li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")).alias("late"),
    )
    # EXISTS(other supplier) ⇔ n_supp > 1; NOT EXISTS(other late
    # supplier) given l1 is late ⇔ n_late_supp = 1. Two stacked
    # aggregates replace both correlated scans AND the round-2 join-back
    # of the late lines onto the per-order counts: when exactly one
    # supplier is late, max(when(any_late, suppkey)) IS that supplier
    # and sum(when(any_late, late_cnt)) IS its late-line count, so the
    # per-order frame already carries everything the final rollup needs.
    # Both groupBys reuse the join's hash(l_orderkey) partitioning (their
    # keys are supersets), so lineitem is shuffled exactly once — and no
    # count_distinct Expand doubles the aggregation input.
    per_supp = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("any_late"),
        F.sum(F.col("late").cast("long")).alias("late_cnt"),
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("any_late").cast("long")).alias("n_late_supp"),
        F.max(F.when(F.col("any_late"), F.col("l_suppkey"))).alias("sole_late_supp"),
        F.sum(F.when(F.col("any_late"), F.col("late_cnt"))).alias("late_lines"),
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(supp, F.col("sole_late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").cast("long").alias("numwait"))
    )
