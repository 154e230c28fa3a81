"""Gate coverage for the dbt-style model runner: a three-model chain
(staging → enriched → mart) whose final mart must hash-match a single
equivalent oracle SQL — proving ref() resolution, DAG order, and view
inlining end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..plans.model_runner import run_models
from . import register

_MODELS = {
    "stg_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice, year(o_orderdate) AS o_year
        FROM {{ source('orders') }}
        WHERE o_orderstatus <> 'P'
    """,
    "stg_customers": """
        SELECT c_custkey, c_mktsegment, c_nationkey
        FROM {{ source('customer') }}
    """,
    "mart_segment_year_revenue": """
        SELECT c_mktsegment, CAST(o_year AS INT) AS o_year,
               CAST(count(*) AS BIGINT) AS n_orders,
               round((sum(o_totalprice)) * 100.0) / 100.0 AS revenue
        FROM {{ ref('stg_orders') }} o
        JOIN {{ ref('stg_customers') }} c ON o.o_custkey = c.c_custkey
        GROUP BY c_mktsegment, o_year
    """,
}


@register(
    "model_chain_segment_revenue",
    """
    SELECT c_mktsegment, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           round((sum(o_totalprice)) * 100.0) / 100.0 AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus <> 'P'
    GROUP BY c_mktsegment, o_year
    """,
    "dbt-style ref() model chain (staging → mart) vs the fused oracle query",
    tags=("sql", "models"),
)
def model_chain_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir)
    built = run_models(spark, _MODELS, {"orders": tables["orders"], "customer": tables["customer"]})
    return built["mart_segment_year_revenue"]


@register(
    "model_incremental_hourly_mart",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round((sum(value)) * 100.0) / 100.0 AS total_value
    FROM events GROUP BY hour, event_type
    """,
    "dbt-style INCREMENTAL materialization driven end-to-end: first "
    "build over the older half of events, then an incremental run over "
    "the full source whose is_incremental() block restricts the scan to "
    "ts >= the mart's high watermark; upsert by (hour|type) key. The "
    "final mart must equal the full recompute (the oracle).",
    tags=("sql", "models", "incremental"),
)
def model_incremental_hourly_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate for plans/model_runner.py::run_incremental (SURVEY §2.6 "dbt
    SQL → Spark SQL" north star; the 100 TB point is that steady-state
    cost tracks the DELTA: the is_incremental predicate prunes the scan
    to rows past max(hour), so history is never re-read).

    Groups strictly below the watermark hour are complete in the first
    build (every row with hour < trunc(max batch-1 ts) has ts < the
    split), and every group at-or-after it is recomputed from the full
    source — so upsert-by-key equals a full recompute exactly.
    """
    import tempfile

    from ..catalog import table
    from ..plans.model_runner import run_incremental

    events = table(spark, sf_dir, "events")
    bounds = events.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    split = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2

    model = """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round((sum(value)) * 100.0) / 100.0 AS total_value,
               concat(CAST(date_trunc('hour', ts) AS STRING), '|', event_type) AS _key
        FROM {{ source('events') }}
        {% if is_incremental() %}
        WHERE ts >= (SELECT max(hour) FROM {{ this }})
        {% endif %}
        GROUP BY date_trunc('hour', ts), event_type
    """
    target = tempfile.mkdtemp(prefix="dbt_slabbing_incr_") + "/hourly_mart"
    run_incremental(
        spark, model, target,
        sources={"events": events.filter(F.col("ts") < F.lit(split))},
        unique_key="_key",
    )
    final = run_incremental(spark, model, target, sources={"events": events}, unique_key="_key")
    return final.drop("_key")
