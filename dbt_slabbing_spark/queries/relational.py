"""Relational core: scans, filters, projections, equi-joins of every
flavor, and the TPC-H-style headline queries from BASELINE.md.

Spark-first notes (100 TB):
- Only the BOUNDED dims (``region``: 5 rows, ``nation``: 25 rows) carry
  an explicit ``F.broadcast`` hint. ``customer``/``supplier``/``part``
  scale linearly with the facts, so a hard-coded broadcast OOMs at the
  100 TB design point; their strategy is left to
  ``autoBroadcastJoinThreshold`` (file-size stats → broadcast at test
  SF) and AQE's runtime broadcast conversion at scale.
- Filters are expressed directly on scan columns so Catalyst pushes them
  into the parquet reader (verify: ``PushedFilters`` in ``.explain``).
- Top-k uses ``orderBy(...).limit(k)`` which Spark executes as
  TakeOrderedAndProject — no global sort of the fact table.

The corpus mirrors the capability inventory in SURVEY.md §2.6 (the
reference itself has no relational queries beyond its two pipelines —
see SURVEY.md §2.1-2.5; those are covered by ``pipelines/``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import dround, register

# ---------------------------------------------------------------------------
# headline TPC-H-style queries (BASELINE.md §2)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round((sum(l_quantity)) * 100.0) / 100.0 + 0.0                                        AS sum_qty,
           round((sum(l_extendedprice)) * 100.0) / 100.0 + 0.0                                   AS sum_base_price,
           round((sum(l_extendedprice * (1 - l_discount))) * 100.0) / 100.0 + 0.0                AS sum_disc_price,
           round((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0) / 100.0 + 0.0 AS sum_charge,
           round((avg(l_quantity)) * 10000.0) / 10000.0 + 0.0      AS avg_qty,
           round((avg(l_extendedprice)) * 10000.0) / 10000.0 + 0.0 AS avg_price,
           round((avg(l_discount)) * 10000.0) / 10000.0 + 0.0      AS avg_disc,
           count(*)                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1-style pricing summary: filter + 2-key groupBy + 8 aggregates",
    tags=("agg", "headline"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dround(F.sum("l_quantity"), 2).alias("sum_qty"),
        dround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        dround(F.sum(disc_price), 2).alias("sum_disc_price"),
        dround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        dround(F.avg("l_quantity"), 4).alias("avg_qty"),
        dround(F.avg("l_extendedprice"), 4).alias("avg_price"),
        dround(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round((sum(l_extendedprice * (1 - l_discount))) * 100.0) / 100.0 + 0.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3-style: 3-table join + agg + deterministic top-10",
    tags=("join", "agg", "headline"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-3 shape: aggregate lineitem revenue per order key BEFORE the
    # joins. The group key contains the join key, so the aggregation is
    # pushed below the join losslessly — the map-side partial agg then
    # shrinks lineitem's shuffle ~4× (lines → orders) and the join fans
    # out pre-reduced rows. No join hints: customer/orders sizes scale
    # with SF, so strategy is left to the threshold planner locally and
    # AQE's runtime sizes at 100 TB.
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    osel = orders.join(cust, orders.o_custkey == cust.c_custkey).drop("o_custkey", "c_custkey")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    rev = li.groupBy("l_orderkey").agg(
        dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    # merge hint = STRATEGY, not a size bet: without it the stats-less
    # static planner broadcasts the pre-aggregated fact side (a driver
    # round-trip of every order key — measured +200 ms locally, an OOM
    # at scale). Sort-merge reuses rev's hash(l_orderkey) partitioning
    # (sort only, no new exchange) and can never blow a build side up.
    return (
        rev.join(osel.hint("merge"), rev.l_orderkey == osel.o_orderkey)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier",
    """
    SELECT n_name,
           round((sum(l_extendedprice * (1 - l_discount))) * 100.0) / 100.0 + 0.0 AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    "TPC-H Q5-style: 6-table join (broadcast dims) + agg",
    tags=("join", "agg", "headline"),
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    # Fact-to-fact join (lineitem ⋈ orders) shuffles on the order key;
    # every dimension hop is a broadcast — one shuffle total.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT round((sum(l_extendedprice * l_discount)) * 100.0) / 100.0 + 0.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6-style: pure pushed-down filter + single agg (scan-bound)",
    tags=("filter", "agg"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# join flavors (SURVEY §2.6: inner/left/right/full/semi/anti)
# ---------------------------------------------------------------------------


@register(
    "join_inner_segment_counts",
    """
    SELECT c_mktsegment, count(*) AS n_orders,
           round((sum(o_totalprice)) * 100.0) / 100.0 + 0.0 AS total_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    "inner equi-join fact→broadcast dim + agg",
    tags=("join",),
)
def join_inner_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dround(F.sum("o_totalprice"), 2).alias("total_value"))
    )


@register(
    "join_left_order_counts",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round((coalesce(sum(o_totalprice), 0.0)) * 100.0) / 100.0 + 0.0 AS total_value
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    "left outer join preserving customers with zero orders",
    tags=("join",),
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_value"),
        )
    )


@register(
    "join_semi_active_customers",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    """,
    "left-semi join (EXISTS): customers with an order since 2000",
    tags=("join", "subquery"),
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    recent = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_dormant_customers",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2001-01-01'
    )
    """,
    "left-anti join (NOT EXISTS): customers with no orders since 2001",
    tags=("join", "subquery"),
)
def join_anti_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    recent = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "join_full_outer_nation_presence",
    """
    WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    "full outer join of two aggregated sides with null back-fill",
    tags=("join", "agg"),
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.c_nk == s.s_nk, "full_outer").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "subquery_orders_above_cust_avg",
    """
    SELECT o_orderkey, o_custkey, round((o_totalprice) * 100.0) / 100.0 + 0.0 AS o_totalprice
    FROM orders
    JOIN (SELECT o_custkey AS ck, avg(o_totalprice) AS avg_price
          FROM orders GROUP BY o_custkey) a
      ON o_custkey = a.ck
    WHERE o_totalprice > 1.5 * a.avg_price
    """,
    "decorrelated scalar subquery: orders 50% above their customer's average",
    tags=("subquery", "agg", "join"),
)
def subquery_orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    avg_per_cust = orders.groupBy(F.col("o_custkey").alias("ck")).agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        orders.join(avg_per_cust, orders.o_custkey == avg_per_cust.ck)
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", dround("o_totalprice", 2).alias("o_totalprice"))
    )


# ---------------------------------------------------------------------------
# sort / limit / distinct
# ---------------------------------------------------------------------------


@register(
    "sort_limit_top_orders",
    """
    SELECT o_orderkey, round((o_totalprice) * 100.0) / 100.0 + 0.0 AS o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    "global top-k (TakeOrderedAndProject — no full sort at scale)",
    tags=("sort",),
)
def sort_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", dround("o_totalprice", 2).alias("o_totalprice"), "o_orderpriority")
    )


@register(
    "distinct_flag_status",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "distinct projection (partial-agg dedup before shuffle)",
    tags=("distinct",),
)
def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "sql_api_priority_stats",
    """
    SELECT o_orderpriority, count(*) AS n,
           round((min(o_totalprice)) * 100.0) / 100.0 + 0.0 AS min_price,
           round((max(o_totalprice)) * 100.0) / 100.0 + 0.0 AS max_price
    FROM orders
    WHERE o_orderstatus <> 'P'
    GROUP BY o_orderpriority
    """,
    "spark.sql() text-SQL surface over registered views",
    tags=("sql", "agg"),
)
def sql_api_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exercises the SQL-text front end (the "dbt SQL → Spark SQL" path):
    # identical semantics to the DataFrame API, same Catalyst plan.
    table(spark, sf_dir, "orders").createOrReplaceTempView("_rel_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               round((min(o_totalprice)) * 100.0) / 100.0 + 0.0 AS min_price,
               round((max(o_totalprice)) * 100.0) / 100.0 + 0.0 AS max_price
        FROM _rel_orders
        WHERE o_orderstatus <> 'P'
        GROUP BY o_orderpriority
        """
    )
