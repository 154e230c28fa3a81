"""Window-function surface: ranking, top-k per group, lag/lead, running
aggregates, row frames, range frames, first/last values.

Determinism policy: any window whose ORDER BY can tie uses a unique
tiebreaker column when the function is order-sensitive (row_number,
ntile, running sums); rank/dense_rank are left with genuine ties (their
semantics make tied output deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from . import dround, register


@register(
    "window_topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, round((o_totalprice) * 100.0) / 100.0 + 0.0 AS o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    "top-3 orders per customer (the scalable per-group top-k)",
    tags=("window",),
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: spread=("o_custkey",) (guide §2.5) — on a single-row-group
    # input the pre-shuffle Sort+WindowGroupLimit(Partial) pass runs as
    # ONE task over the whole fact; hash-spreading on the window
    # partition key replaces the window's own exchange (same key, same
    # count) so the sort+rank run 16-way instead. Same exchange count,
    # rows shuffled raw instead of WGL-pruned — which only matters when
    # the input couldn't feed the cores anyway; on a well-split input
    # the spread is a no-op and the partial WGL prune (the 100 TB story:
    # ≤k rows per group cross the wire) is back in the plan. A/B at
    # sf0.1: 438 → 225 ms interleaved (265 → 214 ms on a quiet box).
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        table(spark, sf_dir, "orders", spread=("o_custkey",))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", dround("o_totalprice", 2).alias("o_totalprice"), "rn")
    )


@register(
    "window_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           round((sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0) / 100.0 + 0.0 AS running_total
    FROM orders
    """,
    "running total per customer (rows frame, unique order)",
    tags=("window",),
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", dround(F.sum("o_totalprice").over(w), 2).alias("running_total"))
    )


@register(
    "window_lag_lead_gaps",
    """
    SELECT user_id, event_id,
           epoch_ms(ts) - epoch_ms(lag(ts) OVER w)  AS gap_ms,
           lead(event_type) OVER w                  AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "lag/lead: inter-event gap and next event type per user",
    tags=("window",),
)
def window_lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    return (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            (ms - F.unix_millis(F.lag("ts").over(w))).alias("gap_ms"),
            F.lead("event_type").over(w).alias("next_type"),
        )
    )


@register(
    "window_range_hourly_sum",
    """
    SELECT user_id, event_id,
           round((sum(value) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts)
               RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)) * 100.0) / 100.0 + 0.0 AS hour_sum
    FROM events
    """,
    "range frame: trailing 1-hour sum per user (numeric range key)",
    tags=("window",),
)
def window_range_hourly_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn("_ms", F.unix_millis("ts"))
    w = Window.partitionBy("user_id").orderBy("_ms").rangeBetween(-3600000, 0)
    return ev.select("user_id", "event_id", dround(F.sum("value").over(w), 2).alias("hour_sum"))


@register(
    "window_rank_dense_percent",
    """
    SELECT p_brand, p_partkey,
           CAST(rank()       OVER w AS INT) AS price_rank,
           CAST(dense_rank() OVER w AS INT) AS price_dense_rank,
           round((percent_rank() OVER w) * 10000.0) / 10000.0 + 0.0  AS price_pct_rank
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
    """,
    "rank/dense_rank/percent_rank with genuine ties",
    tags=("window",),
)
def window_rank_dense_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        table(spark, sf_dir, "part")
        .select(
            "p_brand",
            "p_partkey",
            F.rank().over(w).cast("int").alias("price_rank"),
            F.dense_rank().over(w).cast("int").alias("price_dense_rank"),
            dround(F.percent_rank().over(w), 4).alias("price_pct_rank"),
        )
    )


@register(
    "window_ntile_quartiles",
    """
    SELECT quartile, CAST(count(*) AS BIGINT) AS n,
           round((min(c_acctbal)) * 100.0) / 100.0 + 0.0 AS lo,
           round((max(c_acctbal)) * 100.0) / 100.0 + 0.0 AS hi
    FROM (
        SELECT c_acctbal,
               CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
        FROM customer
    ) GROUP BY quartile
    """,
    "ntile bucketing (total order → deterministic) + re-aggregation",
    tags=("window", "agg"),
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile WITHOUT a global window (VERDICT r9 "What's wrong
    #1": `ntile(4) OVER (ORDER BY ...)` with no PARTITION BY shipped
    the whole customer table through one task). The distributed
    re-expression: global rank via the range-partitioned ordering
    kernel, then the exact SQL NTILE bucket formula — with n rows and
    k=4 buckets the first n%4 buckets hold ⌈n/k⌉ rows and the rest
    ⌊n/k⌋, so

        quartile(rn) = ⌈rn / (q+1)⌉                    for rn ≤ r·(q+1)
                     = r + ⌈(rn − r·(q+1)) / q⌉        otherwise
        (q = n div 4, r = n mod 4)

    — NOT the equal-width `1 + (rn−1)·k div n`, which disagrees with
    SQL NTILE whenever k ∤ n (n=6: widths 2,2,1,1 vs 2,1,2,1). The
    total row count attaches as the query's one broadcast scalar; the
    only serial step left is the kernel's O(#partitions) offset
    prefix-sum."""
    from ..operators.ordering import global_row_number

    cust = table(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    ranked = global_row_number(
        cust, [F.col("c_acctbal"), F.col("c_custkey")], out_col="rn"
    )
    tot = cust.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    n, rn = F.col("_n"), F.col("rn")
    q = F.floor(n / 4).cast("long")
    r = (n % 4).cast("long")
    big = r * (q + 1)  # rows living in the size-(q+1) buckets
    quart = (
        F.when(rn <= big, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - big - 1) / F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("quartile", quart)
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.min("c_acctbal"), 2).alias("lo"),
            dround(F.max("c_acctbal"), 2).alias("hi"),
        )
    )


@register(
    "window_first_last_order",
    """
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "first_value/last_value over full-partition frame + windowed count",
    tags=("window",),
)
def window_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n_orders"),
        )
        .distinct()
    )


@register(
    "window_sessionize_batch",
    """
    WITH gapped AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                         > 1800000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    ), sessions AS (
        SELECT user_id, value,
               sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gapped
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events, round((sum(value)) * 100.0) / 100.0 + 0.0 AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
    "batch sessionization: 30-min gap → session ids → per-session agg",
    tags=("window", "agg", "sessionization"),
)
def window_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    prev_ms = F.unix_millis(F.lag("ts").over(order_w))
    gapped = ev.withColumn(
        "is_start",
        F.when(prev_ms.isNull() | ((ms - prev_ms) > 1800000), 1).otherwise(0),
    )
    run_w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    sessions = gapped.withColumn("session_id", F.sum("is_start").over(run_w).cast("bigint"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"), dround(F.sum("value"), 2).alias("session_value")
    )
