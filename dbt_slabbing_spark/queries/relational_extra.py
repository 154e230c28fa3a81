"""Second wave of relational coverage: more TPC-H-style joins, the
ordered-fold aggregate over TESTDATA, unpivot, string aggregation,
regexp functions, and array explode/unnest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.text import words
from . import dround, register


@register(
    "q7_nation_trade",
    """
    SELECT supp_nation, cust_nation, l_year,
           round((sum(volume)) * 100.0) / 100.0 + 0.0 AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
          AND n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7-style: bilateral trade volume between two nations by year",
    tags=("join", "agg", "headline"),
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(table(spark, sf_dir, "orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(table(spark, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            F.col("supp_nation").isin("NATION_1", "NATION_2")
            & F.col("cust_nation").isin("NATION_1", "NATION_2")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q10_returned_revenue",
    """
    SELECT c_custkey, c_name, n_name,
           round((sum(l_extendedprice * (1 - l_discount))) * 100.0) / 100.0 + 0.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '2000-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10-style: top customers by returned-item revenue",
    tags=("join", "agg", "headline"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(table(spark, sf_dir, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "agg_last_state_per_user",
    """
    SELECT user_id, event_type AS last_type,
           round((value) * 100.0) / 100.0 + 0.0 AS last_value
    FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    "ordered fold / last-state-wins per key (reference A3 lesion fold, "
    "src/generate_mapping.py:59-92, as a max_by aggregate over TESTDATA)",
    tags=("agg", "fold"),
)
def agg_last_state_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", order_key).alias("last_type"),
        dround(F.max_by("value", order_key), 2).alias("last_value"),
    )


@register(
    "setop_unpivot_price_stats",
    """
    SELECT o_orderpriority, 'min_price' AS stat, round((min(o_totalprice)) * 100.0) / 100.0 + 0.0 AS price
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT o_orderpriority, 'max_price' AS stat, round((max(o_totalprice)) * 100.0) / 100.0 + 0.0 AS price
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT o_orderpriority, 'avg_price' AS stat, round((avg(o_totalprice)) * 10000.0) / 10000.0 + 0.0 AS price
    FROM orders GROUP BY o_orderpriority
    """,
    "unpivot via stack(): wide per-priority stats → long (stat, value) rows",
    tags=("setop", "pivot"),
)
def setop_unpivot_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            dround(F.min("o_totalprice"), 2).alias("min_price"),
            dround(F.max("o_totalprice"), 2).alias("max_price"),
            dround(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'min_price', min_price, 'max_price', max_price, 'avg_price', avg_price) AS (stat, price)",
    )


@register(
    "agg_string_join",
    """
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer
    WHERE c_acctbal > 9500
    GROUP BY c_nationkey
    """,
    "ordered string aggregation (listagg / string_agg)",
    tags=("agg", "string"),
)
def agg_string_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .groupBy("c_nationkey")
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("c_name"))).alias("names"))
    )


@register(
    "fn_regexp_suite",
    r"""
    SELECT c_custkey,
           regexp_extract(c_name, '(\d+)', 1)                      AS name_digits,
           CAST(len(regexp_extract_all(c_name, '[aeiou]')) AS INT) AS vowel_count,
           regexp_replace(c_name, '\d+', '#', 'g')                 AS name_masked,
           regexp_matches(c_name, '^Customer')                     AS is_customer
    FROM customer
    """,
    "regexp functions: extract, count occurrences, global replace, match",
    tags=("scalar", "regexp"),
)
def fn_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = F.col("c_name")
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_extract(name, r"(\d+)", 1).alias("name_digits"),
        F.regexp_count(name, F.lit("[aeiou]")).alias("vowel_count"),
        F.regexp_replace(name, r"\d+", "#").alias("name_masked"),
        name.rlike("^Customer").alias("is_customer"),
    )


@register(
    "text_term_frequencies",
    """
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM (
        SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS token
        FROM documents
    )
    GROUP BY token
    """,
    "explode/unnest: corpus-wide term frequency table",
    tags=("text", "explode"),
)
def text_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .select(F.explode(words(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
