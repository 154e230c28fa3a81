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
               round((sum(o_totalprice)) * 100.0) / 100.0 + 0.0 AS revenue
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
           round((sum(o_totalprice)) * 100.0) / 100.0 + 0.0 AS revenue
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
           round((sum(value)) * 100.0) / 100.0 + 0.0 AS total_value
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
               round((sum(value)) * 100.0) / 100.0 + 0.0 AS total_value,
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


@register(
    "model_snapshot_customer_segments",
    """
    WITH src1 AS (
        SELECT c_custkey AS id, c_mktsegment AS segment
        FROM customer WHERE c_custkey % 3 <> 0
    ),
    src2 AS (
        SELECT c_custkey AS id,
               CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' ELSE c_mktsegment END AS segment
        FROM customer
    ),
    seed AS (  -- run-1 versions; closed at t2 iff the key changed in src2
        SELECT s1.id, s1.segment,
               CAST('2024-01-01 00:00:00' AS TIMESTAMP) AS valid_from,
               CASE WHEN s2.id IS NOT NULL AND s2.segment <> s1.segment
                    THEN CAST('2024-02-01 00:00:00' AS TIMESTAMP)
                    ELSE CAST(NULL AS TIMESTAMP) END AS valid_to,
               NOT (s2.id IS NOT NULL AND s2.segment <> s1.segment) AS is_current
        FROM src1 s1 LEFT JOIN src2 s2 USING (id)
    ),
    opened AS (  -- run-2 versions: new keys + changed keys
        SELECT s2.id, s2.segment,
               CAST('2024-02-01 00:00:00' AS TIMESTAMP) AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to,
               TRUE AS is_current
        FROM src2 s2 LEFT JOIN src1 s1 USING (id)
        WHERE s1.id IS NULL OR s1.segment <> s2.segment
    )
    SELECT * FROM seed UNION ALL SELECT * FROM opened
    """,
    "dbt-style SNAPSHOT materialization driven end-to-end: seed run "
    "over 2/3 of customers, second run over all customers with some "
    "segments changed — the SCD2 history (closed + opened versions) "
    "must equal the oracle's direct two-run diff",
    tags=("sql", "models", "snapshot", "scd2"),
)
def model_snapshot_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate for plans/model_runner.py::run_snapshot: two snapshot
    generations over a mutating customer-segment source. The engine
    folds generically (scd2_apply handles any change pattern); the
    oracle states the closed-form two-run outcome — an independent
    derivation, so a fold bug can't hide in a mirrored formula.
    """
    import tempfile

    from ..catalog import table
    from ..plans.model_runner import run_snapshot

    cust = table(spark, sf_dir, "customer")
    src1 = cust.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("id"), F.col("c_mktsegment").alias("segment")
    )
    src2 = cust.select(
        F.col("c_custkey").alias("id"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    )
    target = tempfile.mkdtemp(prefix="dbt_slabbing_snap_") + "/customer_segments"
    run_snapshot(spark, src1, target, "id", ["segment"], "2024-01-01 00:00:00")
    final = run_snapshot(spark, src2, target, "id", ["segment"], "2024-02-01 00:00:00")
    # open versions carry the 9999-12-31 storage sentinel, which
    # overflows pandas ns timestamps in the driver's toPandas — the
    # gate projects open-ended as NULL (oracle states the same)
    return final.withColumn(
        "valid_to", F.when(F.col("is_current"), F.lit(None).cast("timestamp")).otherwise(F.col("valid_to"))
    )


@register(
    "model_schema_tests",
    # dbt's test layer: each built-in test is a SELECT of failing rows;
    # the oracle restates every count in ANSI SQL. The accepted_values
    # row is DELIBERATELY configured to fail (status list missing 'P')
    # so the gate proves failures are counted, not just that clean data
    # passes.
    """
    SELECT model, "column", test, n_failures, n_failures = 0 AS passed
    FROM (
        SELECT 'orders' AS model, 'o_orderkey' AS "column", 'not_null' AS test,
               CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS n_failures
        FROM orders
        UNION ALL
        SELECT 'orders', 'o_orderkey', 'unique',
               CAST(count(*) AS BIGINT) FROM (
                   SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL
                   GROUP BY o_orderkey HAVING count(*) > 1
               )
        UNION ALL
        SELECT 'orders', 'o_orderstatus', 'accepted_values',
               CAST(count(*) FILTER (o_orderstatus IS NOT NULL
                                     AND o_orderstatus NOT IN ('F', 'O')) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders', 'o_custkey', 'relationships',
               CAST(count(*) AS BIGINT) FROM (
                   SELECT o_custkey FROM orders o
                   WHERE o_custkey IS NOT NULL
                     AND NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey)
               )
        UNION ALL
        SELECT 'customer', 'c_custkey', 'unique',
               CAST(count(*) AS BIGINT) FROM (
                   SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL
                   GROUP BY c_custkey HAVING count(*) > 1
               )
    ) t
    """,
    "dbt-style schema tests (not_null / unique / accepted_values / "
    "relationships) over the orders/customer relations — one "
    "aggregation or anti-join per test, one row per test with the "
    "failure count; includes a deliberately-failing accepted_values "
    "spec so failure counting itself is verified",
    tags=("model", "quality", "sql"),
)
def model_schema_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt's data-test layer on Spark (plans/model_runner.py::run_tests):
    a schema.yml-shaped spec, each test one distributed aggregation /
    anti-join, results as the standard (model, column, test,
    n_failures, passed) frame. The failing accepted_values row pins
    that failures COUNT rather than error out — dbt's store_failures
    behavior."""
    from ..catalog import table
    from ..plans.model_runner import run_tests

    tables = {name: table(spark, sf_dir, name) for name in ("orders", "customer")}
    return run_tests(
        spark,
        tables,
        {
            "orders": {
                "o_orderkey": ["unique", "not_null"],
                "o_orderstatus": [{"accepted_values": ["F", "O"]}],
                "o_custkey": [{"relationships": ("customer", "c_custkey")}],
            },
            "customer": {"c_custkey": ["unique"]},
        },
    )
