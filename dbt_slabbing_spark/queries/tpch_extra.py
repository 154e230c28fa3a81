"""Third wave: adapted TPC-H query shapes q4/q8/q12/q13/q14/q18/q19/q22
(the testdata schema has no partsupp table, so the q2/q9/q11/q16 shapes
are re-anchored on the tables that exist; what's preserved is the
OPERATOR shape — EXISTS aggs, market-share ratios, disjunctive range
predicates, scalar-subquery anti-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import dround, register


@register(
    "q4_late_shipment_orders",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4-style: EXISTS-filtered aggregate (orders with a late lineitem)",
    tags=("join", "subquery", "agg"),
)
def q4_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round((sum(CASE WHEN n_name = 'NATION_3' THEN volume ELSE 0 END) / sum(volume)) * 1000000.0)
               / 1000000.0 AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n_name
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    GROUP BY o_year
    """,
    "TPC-H Q8-style: supplier-nation market share within a region by year",
    tags=("join", "agg", "ratio"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    df = (
        li.join(table(spark, sf_dir, "orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(table(spark, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(table(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(table(spark, sf_dir, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        df.select(F.year("o_orderdate").alias("o_year"), volume.alias("volume"), "n_name")
        .groupBy("o_year")
        .agg(
            dround(
                F.sum(F.when(F.col("n_name") == "NATION_3", F.col("volume")).otherwise(0.0)) / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q12_shipmode_priority_classes",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
               AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
               AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    "TPC-H Q12-style: CASE-bucketed counts by priority class",
    tags=("join", "agg", "case"),
)
def q12_shipmode_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    "TPC-H Q13-style: distribution of per-customer order counts (incl. zero)",
    tags=("join", "agg"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue_ratio",
    """
    SELECT round((100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount))) * 10000.0) / 10000.0 + 0.0 AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
    "TPC-H Q14-style: promo revenue percentage (conditional ratio aggregate)",
    tags=("join", "agg", "ratio"),
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(table(spark, sf_dir, "part"), li.l_partkey == F.col("p_partkey"))
        .agg(
            dround(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev), 4
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_volume_orders",
    """
    SELECT c_custkey, o_orderkey, round((total_qty) * 100.0) / 100.0 + 0.0 AS total_qty
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, sum(l_quantity) AS total_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_custkey, o_orderkey
        HAVING sum(l_quantity) > 150
    )
    """,
    "TPC-H Q18-style: large-volume orders (HAVING over a join aggregate)",
    tags=("join", "agg", "having"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
        .select("c_custkey", "o_orderkey", dround(F.col("_q"), 2).alias("total_qty"))
    )


@register(
    "q19_disjunctive_ranges",
    """
    SELECT round((sum(l_extendedprice * (1 - l_discount))) * 100.0) / 100.0 + 0.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    "TPC-H Q19-style: disjunction of conjunctive range predicates across the join",
    tags=("join", "filter"),
)
def q19_disjunctive_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return joined.filter(cond).agg(
        dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "q22_dormant_rich_customers",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
           round((sum(c_acctbal)) * 100.0) / 100.0 + 0.0 AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2001-01-01'
      )
    GROUP BY c_mktsegment
    """,
    "TPC-H Q22-style: scalar subquery threshold + anti-join + aggregate",
    tags=("subquery", "agg"),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    # Scalar subquery decorrelated: the threshold is a 1-row broadcast,
    # not a driver-side collect.
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"), dround(F.sum("c_acctbal"), 2).alias("total_bal"))
    )
