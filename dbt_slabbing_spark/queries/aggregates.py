"""Aggregation surface: distinct aggs, multi-level grouping (rollup /
cube / grouping sets), filtered aggregation, exact percentiles, pivot.

Type-parity notes vs the DuckDB oracle (driver hashes schema + values):
- DuckDB ``sum(INTEGER)`` returns HUGEINT → oracle casts to BIGINT.
- DuckDB ``grouping()`` returns BIGINT, Spark returns byte → both cast INT.
- exact ``percentile``/``quantile_cont`` use the same linear
  interpolation in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import dround, register


@register(
    "agg_count_distinct",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    "exact distinct aggregation (expand+two-phase agg under the hood)",
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_customers"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "agg_stats_moments",
    """
    SELECT l_returnflag,
           round((stddev_samp(l_quantity)) * 10000.0) / 10000.0 AS sd_qty,
           round((var_samp(l_quantity)) * 10000.0) / 10000.0    AS var_qty,
           round((quantile_cont(l_quantity, 0.5)) * 10000.0) / 10000.0 AS median_qty,
           round((min(l_quantity)) * 100.0) / 100.0 AS min_qty,
           round((max(l_quantity)) * 100.0) / 100.0 AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    "statistical aggregates incl. exact interpolated median",
    tags=("agg",),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dround(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        dround(F.var_samp("l_quantity"), 4).alias("var_qty"),
        dround(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        dround(F.min("l_quantity"), 2).alias("min_qty"),
        dround(F.max("l_quantity"), 2).alias("max_qty"),
    )


@register(
    "agg_rollup_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           CAST(count(*) AS BIGINT) AS n,
           round((sum(l_quantity)) * 100.0) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "ROLLUP with grouping() indicators (subtotal + grand-total rows)",
    tags=("agg", "grouping"),
)
def agg_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "agg_cube_priority_status",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round((sum(o_totalprice)) * 100.0) / 100.0 AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    "CUBE over two dimensions",
    tags=("agg", "grouping"),
)
def agg_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dround(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "agg_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
    "explicit GROUPING SETS (SQL-text path; no DataFrame equivalent)",
    tags=("agg", "grouping", "sql"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("_agg_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM _agg_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


@register(
    "agg_filtered_counts",
    """
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)    AS n_errors,
           round((sum(value) FILTER (WHERE event_type = 'purchase')) * 100.0) / 100.0     AS purchase_value
    FROM events GROUP BY user_id
    """,
    "conditional/filtered aggregation",
    tags=("agg",),
)
def agg_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.sum(F.when(is_purchase, 1).otherwise(0)).cast("bigint").alias("n_purchases"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("bigint").alias("n_errors"),
        dround(F.sum(F.when(is_purchase, F.col("value"))), 2).alias("purchase_value"),
    )


@register(
    "agg_histogram_buckets",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY bucket
    """,
    "value bucketing + counts (histogram primitive)",
    tags=("agg",),
)
def agg_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_pivot_status",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
    "pivot: one column per o_orderstatus value",
    tags=("agg", "pivot"),
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("status_f"),
        F.coalesce("O", F.lit(0)).alias("status_o"),
        F.coalesce("P", F.lit(0)).alias("status_p"),
    )


@register(
    "agg_collect_list_sorted",
    """
    SELECT c_nationkey, list(c_custkey ORDER BY c_custkey) AS custkeys
    FROM customer
    WHERE c_acctbal > 9000
    GROUP BY c_nationkey
    """,
    "deterministic collect_list (sorted — collect order is undefined in Spark)",
    tags=("agg", "array"),
)
def agg_collect_list_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(F.sort_array(F.collect_list("c_custkey")).alias("custkeys"))
    )


@register(
    "agg_approx_distinct",
    None,  # HLL sketches differ across engines — rows-only check.
    "approx_count_distinct (HLL) — no cross-engine oracle by design",
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
    )


@register(
    "agg_approx_percentiles",
    None,  # GK sketches differ across engines — bounded-error pytest instead.
    "percentile_approx (Greenwald-Khanna quantile sketch) per group — "
    "the mergeable 100 TB path where exact median cannot scale",
    tags=("agg", "approx"),
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    qs = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)), 10000
    )
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(qs.alias("price_quartiles"))
    )
