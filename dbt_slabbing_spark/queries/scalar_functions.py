"""Scalar-function surface: string, date/time, math, null-handling,
conditional, JSON extraction, hashing, array functions.

Covers the reference's scalar operators (SURVEY.md §2.5: split/
element_at F8, upper F9, replace F10, CASE classification F1, casts P11)
over TESTDATA columns, plus the full engine surface.

Type parity: DuckDB year()/month()/etc return BIGINT → cast INT both
sides; DuckDB ceil() returns DOUBLE → cast BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import dround, register


@register(
    "fn_string_suite",
    """
    SELECT p_partkey,
           upper(p_brand)                            AS brand_upper,
           CAST(length(p_name) AS INT)               AS name_len,
           substr(p_name, 1, 5)                      AS name_prefix,
           replace(p_type, ' ', '_')                 AS type_snake,
           string_split(p_name, ' ')[1]              AS first_word,
           string_split(p_name, ' ')[-1]             AS last_word,
           concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
           CAST(strpos(p_type, 'BRASS') AS INT)      AS brass_pos,
           trim(lpad(p_brand, 12, ' '))              AS brand_trimmed
    FROM part
    """,
    "string functions: upper/length/substr/replace/split/element_at/concat/instr/pad/trim "
    "(reference F8-F10, src/generate_mapping.py:141,149; src/load_ground_truths.py:69,73)",
    tags=("scalar", "string"),
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = F.split(F.col("p_name"), " ")
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias("brand_size"),
        F.instr(F.col("p_type"), "BRASS").alias("brass_pos"),
        F.trim(F.lpad(F.col("p_brand"), 12, " ")).alias("brand_trimmed"),
    )


@register(
    "fn_date_suite",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)      AS o_year,
           CAST(month(o_orderdate) AS INT)     AS o_month,
           CAST(day(o_orderdate) AS INT)       AS o_day,
           date_trunc('month', o_orderdate)    AS month_start,
           o_orderdate + INTERVAL 30 DAY       AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95
    FROM orders
    """,
    "date/time functions: extract parts, truncation, interval arithmetic, datediff",
    tags=("scalar", "date"),
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = F.col("o_orderdate")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(od).alias("o_year"),
        F.month(od).alias("o_month"),
        F.dayofmonth(od).alias("o_day"),
        F.date_trunc("month", od).alias("month_start"),
        (od + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )


@register(
    "fn_math_suite",
    """
    SELECT o_orderkey,
           round((abs(o_totalprice - 100000)) * 10000.0) / 10000.0 + 0.0   AS abs_dev,
           CAST(ceil(o_totalprice / 1000) AS BIGINT)  AS price_ceil_k,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_floor_k,
           round((sqrt(o_totalprice)) * 10000.0) / 10000.0 + 0.0           AS price_sqrt,
           round((ln(o_totalprice)) * 10000.0) / 10000.0 + 0.0             AS price_ln,
           round((pow(o_totalprice / 100000, 2)) * 10000.0) / 10000.0 + 0.0 AS price_sq,
           CAST(o_orderkey % 7 AS BIGINT)         AS key_mod
    FROM orders WHERE o_totalprice > 0
    """,
    "math functions: abs/ceil/floor/sqrt/ln/pow/mod",
    tags=("scalar", "math"),
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = F.col("o_totalprice")
    return (
        table(spark, sf_dir, "orders")
        .filter(p > 0)
        .select(
            "o_orderkey",
            dround(F.abs(p - 100000), 4).alias("abs_dev"),
            F.ceil(p / 1000).alias("price_ceil_k"),
            F.floor(p / 1000).alias("price_floor_k"),
            dround(F.sqrt(p), 4).alias("price_sqrt"),
            dround(F.log(p), 4).alias("price_ln"),
            dround(F.pow(p / 100000, 2), 4).alias("price_sq"),
            (F.col("o_orderkey") % 7).alias("key_mod"),
        )
    )


@register(
    "fn_null_handling",
    """
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'recovered')        AS type_or_recovered,
           (nullif(event_type, 'error') IS NOT DISTINCT FROM NULL)   AS is_error,
           CASE WHEN value > 50 THEN 'high' WHEN value > 10 THEN 'mid'
                ELSE 'low' END                                       AS value_band
    FROM events
    """,
    "coalesce/nullif/null-safe equality/CASE (reference P4-P5 null traps, "
    "src/generate_mapping.py:124-135)",
    tags=("scalar", "null"),
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    nulled = F.nullif(F.col("event_type"), F.lit("error"))
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.coalesce(nulled, F.lit("recovered")).alias("type_or_recovered"),
        nulled.eqNullSafe(F.lit(None).cast("string")).alias("is_error"),
        F.when(F.col("value") > 50, "high").when(F.col("value") > 10, "mid").otherwise("low").alias("value_band"),
    )


@register(
    "fn_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(count(*) AS BIGINT) AS n,
           round((avg(value)) * 10000.0) / 10000.0 + 0.0 AS avg_value
    FROM events
    GROUP BY k
    """,
    "JSON extraction from events.props (get_json_object / from_json typed path)",
    tags=("scalar", "json"),
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Typed path: from_json with an explicit schema (scales better than
    # repeated get_json_object on wide props — single parse per row).
    ev = table(spark, sf_dir, "events").withColumn("_p", F.from_json("props", "k INT"))
    return (
        ev.groupBy(F.col("_p.k").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"), dround(F.avg("value"), 4).alias("avg_value"))
    )


@register(
    "fn_hash_suite",
    """
    SELECT c_custkey,
           md5(c_name)    AS name_md5,
           sha256(c_name) AS name_sha256
    FROM customer
    """,
    "cryptographic hash functions (dedup keys build on these)",
    tags=("scalar", "hash"),
)
def fn_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
    )


@register(
    "fn_array_suite",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round((list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))) * 10000.0) / 10000.0 + 0.0 AS vec_sum,
           round((CAST(list_max(embedding) AS DOUBLE)) * 10000.0) / 10000.0 + 0.0 AS vec_max,
           round((CAST(embedding[1] AS DOUBLE)) * 10000.0) / 10000.0 + 0.0        AS first_component,
           round((list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 10000.0) / 10000.0 + 0.0 AS sq_norm
    FROM embeddings
    """,
    "array functions: size/aggregate/transform/element access on array<float>",
    tags=("scalar", "array"),
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = F.col("embedding")
    dsum = F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    sq = F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size(emb).alias("dim"),
        dround(dsum, 4).alias("vec_sum"),
        dround(F.array_max(emb).cast("double"), 4).alias("vec_max"),
        dround(F.element_at(emb, 1).cast("double"), 4).alias("first_component"),
        dround(sq, 4).alias("sq_norm"),
    )


@register(
    "fn_case_classification",
    """
    SELECT outcome_class, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT CASE
            WHEN regexp_matches(p_type, 'BRASS|COPPER|NICKEL') THEN 'METAL'
            WHEN regexp_matches(p_type, 'ECONOMY|STANDARD')    THEN 'BASIC'
            ELSE 'OTHER' END AS outcome_class
        FROM part
    ) GROUP BY outcome_class
    """,
    "ordered multi-substring CASE classification (reference F1 outcome "
    "classifier, src/generate_mapping.py:52-55,65-70: benign-list "
    "precedence over malignant-list)",
    tags=("scalar", "case"),
)
def fn_case_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same shape as the reference's BENIGN/MALIGNANT/UNKNOWN classifier:
    # first rlike list wins, order matters.
    cls = (
        F.when(F.col("p_type").rlike("BRASS|COPPER|NICKEL"), "METAL")
        .when(F.col("p_type").rlike("ECONOMY|STANDARD"), "BASIC")
        .otherwise("OTHER")
    )
    return (
        table(spark, sf_dir, "part")
        .select(cls.alias("outcome_class"))
        .groupBy("outcome_class")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "fn_try_error_safe_suite",
    # DuckDB: TRY_CAST + guarded expressions; Spark: the try_* family.
    # Semantics: malformed input → NULL instead of a runtime error — the
    # difference between a 100 TB job dying at hour 9 on one bad row and
    # a null you can quarantine.
    """
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INT)       AS k_int,
           TRY_CAST(event_type AS INT)                              AS type_as_int,
           CASE WHEN value = 0 THEN NULL
                ELSE round((100.0 / value) * 10000.0) / 10000.0 + 0.0 END AS per_value,
           CASE WHEN value >= 0
                THEN round((sqrt(value)) * 10000.0) / 10000.0 + 0.0 END   AS sqrt_value
    FROM events
    """,
    "error-safe evaluation: try_cast on malformed input, try_divide by "
    "zero, guarded sqrt — bad rows become NULLs, not job failures",
    tags=("scalar", "null"),
)
def fn_try_error_safe_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: spread (guide §2.5) — the per-row get_json_object parse ran as
    # one task on the single-row-group input; interleaved noop A/B at
    # sf0.1: 1474 → 308 ms. No-op on well-split inputs.
    ev = table(spark, sf_dir, "events", spread=True)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        F.col("event_type").try_cast("int").alias("type_as_int"),
        dround(F.try_divide(F.lit(100.0), F.nullif(F.col("value"), F.lit(0.0))), 4).alias("per_value"),
        dround(F.when(F.col("value") >= 0, F.sqrt("value")), 4).alias("sqrt_value"),
    )


@register(
    "fn_sql_udf_surface",
    # Oracle inlines the UDF bodies — the gate proves the SQL-UDF
    # indirection is semantically transparent (Catalyst inlines SQL UDFs
    # into the calling plan; they are declarative macros, not a Python
    # boundary, so whole-stage codegen is preserved at any scale).
    """
    WITH tvf AS (
        SELECT sum(i) AS tvf_check FROM (SELECT unnest(range(1, 5)) AS i)
    )
    SELECT CASE WHEN l_extendedprice < 20000 THEN 'low'
                WHEN l_extendedprice < 45000 THEN 'mid'
                ELSE 'high' END AS band,
           CAST(count(*) AS BIGINT) AS n,
           round((sum(l_extendedprice * (1 - l_discount))) * 100.0) / 100.0 + 0.0 AS revenue,
           CAST(any_value(tvf_check) AS BIGINT) AS tvf_check
    FROM lineitem CROSS JOIN tvf
    WHERE l_quantity >= 10
    GROUP BY band
    """,
    "Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN): scalar UDFs in a "
    "grouped aggregate, a SQL table UDF via scalar subquery, and a "
    "parameterized query (named :minqty arg) — all inlined by Catalyst, "
    "no Python boundary",
    tags=("sql", "udf", "function"),
)
def fn_sql_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("_sqludf_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE) RETURNS STRING "
        "RETURN CASE WHEN p < 20000 THEN 'low' WHEN p < 45000 THEN 'mid' ELSE 'high' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ints_to(n INT) RETURNS TABLE(i INT) "
        "RETURN SELECT explode(sequence(1, n))"
    )
    return spark.sql(
        """
        SELECT price_band(l_extendedprice) AS band,
               CAST(count(*) AS BIGINT) AS n,
               round((sum(disc_price(l_extendedprice, l_discount))) * 100.0) / 100.0 + 0.0 AS revenue,
               CAST((SELECT sum(i) FROM ints_to(4)) AS BIGINT) AS tvf_check
        FROM _sqludf_lineitem
        WHERE l_quantity >= :minqty
        GROUP BY band
        """,
        args={"minqty": 10},
    )


@register(
    "fn_collation_suite",
    # The ORACLE is an independent recomputation, not a feature mirror:
    # DuckDB's NOCASE collation affects comparisons but not DISTINCT
    # hashing, so the oracle states the equivalent lower()-normalized
    # form. For ASCII segments the two are identical by definition.
    """
    WITH v AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM customer
    )
    SELECT lower(seg) AS seg_norm,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants
    FROM v GROUP BY lower(seg)
    """,
    "Spark 4 collated strings: GROUP BY under UTF8_LCASE folds case "
    "variants into one group (binary-distinct count preserved per "
    "group); oracle recomputes via lower()-normalization",
    tags=("scalar", "collation"),
)
def fn_collation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation is Spark 4's way to push case/accent-insensitive
    semantics INTO the engine (comparisons, grouping, joins run on
    collation keys — no lower() wrapping at every call site, and the
    optimizer still prunes/pushes on the collated column). The gate
    groups a mixed-case projection under UTF8_LCASE and checks the
    fold against the normalization identity."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("_coll_cust")
    return spark.sql(
        """
        WITH v AS (
            SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                        ELSE lower(c_mktsegment) END AS seg
            FROM _coll_cust
        )
        SELECT lower(min(seg)) AS seg_norm,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants
        FROM v GROUP BY seg COLLATE UTF8_LCASE
        """
    )


@register(
    "fn_bitwise_suite",
    # Bitwise scalar surface: AND/OR/XOR, shifts, popcount, and the
    # bit-trick idioms sketch/bitmap code leans on (lowest-set-bit
    # isolation k & -k, power-of-two test, byte extraction). Exact
    # integer outputs — byte-stable cross-engine by construction.
    """
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT)                  AS low_byte,
           CAST(o_orderkey | 4096 AS BIGINT)                 AS with_flag,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT)        AS key_xor,
           CAST((o_orderkey << 3) & 65535 AS BIGINT)         AS shl3_mask,
           CAST(o_orderkey >> 4 AS BIGINT)                   AS shr4,
           CAST(bit_count(o_orderkey) AS INT)                AS popcount,
           CAST(o_orderkey & (-o_orderkey) AS BIGINT)        AS lowest_set_bit,
           (o_orderkey > 0 AND (o_orderkey & (o_orderkey - 1)) = 0)
                                                             AS is_pow2,
           CAST((o_orderkey >> 8) & 255 AS BIGINT)           AS second_byte
    FROM orders
    """,
    "bitwise functions: AND/OR/XOR, shifts, popcount, lowest-set-bit "
    "and power-of-two idioms",
    tags=("scalar", "bitwise"),
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).cast("bigint").alias("key_xor"),
        F.shiftleft(k, 3).bitwiseAND(F.lit(65535)).cast("bigint").alias("shl3_mask"),
        F.shiftright(k, 4).cast("bigint").alias("shr4"),
        F.bit_count(k).cast("int").alias("popcount"),
        k.bitwiseAND(-k).cast("bigint").alias("lowest_set_bit"),
        ((k > 0) & (k.bitwiseAND(k - 1) == 0)).alias("is_pow2"),
        F.shiftright(k, 8).bitwiseAND(F.lit(255)).cast("bigint").alias("second_byte"),
    )
