"""Gate coverage for the dbt-style model runner: a three-model chain
(staging → enriched → mart) whose final mart must hash-match a single
equivalent oracle SQL — proving ref() resolution, DAG order, and view
inlining end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
