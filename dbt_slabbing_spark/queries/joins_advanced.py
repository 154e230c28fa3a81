"""Non-equi joins Spark lacks natively: as-of join and range join.

The as-of Spark implementation is the union + ordered-window carry
(operators/asof.py) — one shuffle on the key, no quadratic pair
explosion. The DuckDB oracle uses its native ASOF JOIN, which gives us
an independent implementation to diff against.

The range join keeps an equality key (user_id) so Spark executes it as
a hash join with the range as a post-filter — never a broadcast
nested-loop over the full fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.asof import asof_join
from . import register


@register(
    "asof_purchase_attribution",
    """
    SELECT v.event_id, v.user_id, p.ts AS purchase_ts,
           CASE WHEN p.ts IS NULL THEN NULL
                ELSE epoch_ms(v.ts) - epoch_ms(p.ts) END AS ms_since_purchase
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
    "as-of join: each view attributed to the user's most recent purchase",
    tags=("join", "asof"),
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("p_ts"))
    joined = asof_join(
        views,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="p_ts",
        value_cols=[],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_time").alias("purchase_ts"),
        F.when(
            F.col("asof_time").isNotNull(),
            F.unix_millis(F.col("ts")) - F.unix_millis(F.col("asof_time")),
        ).alias("ms_since_purchase"),
    )


@register(
    "range_join_error_context",
    """
    SELECT e.event_id, e.user_id,
           CAST(count(c.event_id) AS BIGINT) AS n_preceding_5min
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN events c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts - INTERVAL 5 MINUTE
     AND c.ts < e.ts
    GROUP BY e.event_id, e.user_id
    """,
    "range join: activity count in the 5 minutes before each error (equi key + range filter)",
    tags=("join", "range"),
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    context = ev.select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id"))
    joined = errors.join(
        context,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 5 MINUTE"))
        & (F.col("c_ts") < F.col("e_ts")),
        "left",
    )
    return (
        joined.groupBy("e_id", "e_user")
        .agg(F.count("c_id").alias("n_preceding_5min"))
        .select(F.col("e_id").alias("event_id"), F.col("e_user").alias("user_id"), "n_preceding_5min")
    )
