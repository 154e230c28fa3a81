"""Corpus entries exercising every Python-function extension point,
each verified against a pure-SQL oracle (the UDF computes something the
oracle can recompute — that's the point: the mechanism is what's under
test, not the math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.python_udfs import (
    ChunkText,
    group_ols_slope,
    grouped_agg_count,
    grouped_agg_median,
    slow_row_udf_upper,
    utf8_byte_len,
)
from . import dround, register


@register(
    "udf_pandas_scalar_bytelen",
    """
    SELECT doc_id, CAST(strlen(text) AS INT) AS byte_len
    FROM documents
    """,
    "Arrow-vectorized scalar pandas_udf (UTF-8 byte length)",
    tags=("udf", "pandas_udf"),
)
def udf_pandas_scalar_bytelen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select("doc_id", utf8_byte_len()("text").alias("byte_len"))


@register(
    "udf_grouped_ols_slope",
    """
    SELECT user_id,
           round((regr_slope(value, epoch_ms(ts) / 3600000.0)) * 10000.0) / 10000.0 + 0.0 AS slope
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    HAVING count(*) >= 2
    """,
    "custom UDAF via applyInPandas (per-group OLS fit) vs closed-form regr_slope",
    tags=("udf", "udaf", "pandas_udf"),
)
def udf_grouped_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", (F.unix_millis("ts") / 3600000.0).alias("hours"), "value")
    )
    with_counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("_n"))
    eligible = ev.join(F.broadcast(with_counts.filter(F.col("_n") >= 2)), "user_id").drop("_n")
    fitted = eligible.groupBy("user_id").applyInPandas(group_ols_slope, schema="user_id bigint, slope double")
    return fitted.select("user_id", dround(F.col("slope"), 4).alias("slope"))


@register(
    "udf_grouped_agg_median",
    """
    SELECT l_returnflag,
           round((median(l_extendedprice)) * 10000.0) / 10000.0 + 0.0 AS median_price,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "GROUPED_AGG pandas UDFs (vectorized UDAFs composed in one .agg()) "
    "vs DuckDB median",
    tags=("udf", "udaf", "pandas_udf"),
)
def udf_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    med, cnt = grouped_agg_median(), grouped_agg_count()
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            dround(med("l_extendedprice"), 4).alias("median_price"),
            cnt("l_extendedprice").alias("n_lines"),
        )
    )


@register(
    "udf_udtf_chunk_text",
    """
    WITH norm AS (
        SELECT doc_id,
               string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS w
        FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           array_to_string(w[i*25 + 1 : i*25 + 25], ' ') AS chunk
    FROM (
        SELECT doc_id, w,
               unnest(range(0, CAST(ceil(len(w) / 25.0) AS BIGINT))) AS i
        FROM norm
    )
    """,
    "Python UDTF (one doc → many token chunks) via LATERAL join",
    tags=("udf", "udtf"),
)
def udf_udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    chunker = udtf(ChunkText, returnType="chunk_idx int, chunk string")
    spark.udtf.register("chunk_text", chunker)
    table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk FROM _udtf_docs d, LATERAL chunk_text(d.text, 25) c"
    )


@register(
    "udf_row_at_a_time_upper",
    "SELECT c_custkey, upper(c_name) AS name_upper FROM customer",
    "row-at-a-time Python UDF (the documented slow path; oracle = built-in upper)",
    tags=("udf", "slow_path"),
)
def udf_row_at_a_time_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    up = slow_row_udf_upper()
    return table(spark, sf_dir, "customer").select("c_custkey", up("c_name").alias("name_upper"))


def _arrow_l2_norms(batches):
    """mapInArrow worker: per-vector L2 norm, sequential-fold accumulation.

    The fold order matters: the cross-engine contract (see
    queries/similarity.py) is "accumulate in double, in list order" —
    numpy's pairwise summation would differ from the oracle's
    ``list_dot_product`` in the last ulp, so the reduction is an
    explicit left fold. 64 elements x batch rows stays cheap; the win
    of mapInArrow over a pandas_udf is zero pandas conversion overhead
    (RecordBatch in, RecordBatch out).
    """
    import pyarrow as pa

    for batch in batches:
        vec_ids = batch.column("vec_id")
        norms = []
        for emb in batch.column("embedding").to_pylist():
            acc = 0.0
            for x in emb:  # float32 widened exactly to double
                acc += x * x
            norms.append(acc**0.5)
        yield pa.RecordBatch.from_arrays(
            [vec_ids, pa.array(norms, type=pa.float64())], ["vec_id", "l2_norm"]
        )


@register(
    "udf_map_in_arrow_norms",
    """
    SELECT vec_id,
           round((sqrt(list_dot_product(dv, dv))) * 1000000.0) / 1000000.0 + 0.0 AS l2_norm
    FROM (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
        FROM embeddings
    )
    """,
    "mapInArrow batch transform (RecordBatch-native L2 norms, no pandas "
    "conversion) vs the oracle's list_dot_product",
    tags=("udf", "arrow"),
)
def udf_map_in_arrow_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = emb.mapInArrow(_arrow_l2_norms, "vec_id bigint, l2_norm double")
    return out.select("vec_id", dround(F.col("l2_norm"), 6).alias("l2_norm"))


@register(
    "udf_udtf_dynamic_schema",
    """
    WITH norm AS (
        SELECT doc_id,
               list_filter(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '),
                           t -> t <> '') AS w
        FROM documents
    )
    SELECT doc_id, w[1] AS word_0, w[2] AS word_1, w[3] AS word_2 FROM norm
    """,
    "Python UDTF with analyze()-computed DYNAMIC schema: the literal "
    "argument n=3 becomes three typed output columns at analysis time",
    tags=("udf", "udtf", "dynamic-schema"),
)
def udf_udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate for functions/python_udfs.py::LeadingWords — the Spark 4
    UDTF ``analyze`` protocol (schema computed from the call site's
    constant argument). Catalyst plans against the concrete 3-column
    schema, so column pruning and codegen behave as if declared."""
    from pyspark.sql.functions import udtf

    from ..functions.python_udfs import LeadingWords

    spark.udtf.register("leading_words", udtf(LeadingWords))
    table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs_dyn")
    return spark.sql(
        "SELECT d.doc_id, w.* FROM _udtf_docs_dyn d, LATERAL leading_words(d.text, 3) w"
    )
