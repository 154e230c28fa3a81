"""Multimodal plumbing queries: binary payload columns with typed
metadata, probed via Arrow-batched ``mapInPandas``.

The payload here is the document text encoded to bytes (no media blobs
ship with TESTDATA); the *plumbing* — binary column, mapInPandas
decoder signature, Arrow batch shape, metadata schema, downstream
relational use — is the real thing, and every derived value is
recomputable by the DuckDB oracle (md5/byte-length arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.multimodal import frame_sample_plan, probe_binary
from . import register


@register(
    "mm_probe_metadata",
    """
    SELECT doc_id,
           CAST(strlen(text) AS INT)          AS byte_len,
           md5(text)                          AS content_md5,
           CAST(strlen(text) % 640 + 1 AS INT) AS fake_width,
           CAST(strlen(text) % 480 + 1 AS INT) AS fake_height,
           CAST(least(strlen(text) // 100 + 1, 8) AS INT) AS n_frames
    FROM documents
    """,
    "binary payload probe via mapInPandas (Arrow batches) → typed metadata",
    tags=("multimodal", "pandas_udf"),
)
def mm_probe_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return probe_binary(docs)


@register(
    "mm_frame_sample_plan",
    """
    WITH meta AS (
        SELECT doc_id,
               CAST(least(strlen(text) // 100 + 1, 8) AS INT) AS n_frames
        FROM documents
    )
    SELECT doc_id, n_frames,
           list_transform(range(0, CAST(n_frames AS BIGINT), 2), x -> CAST(x AS INT)) AS frame_indices
    FROM meta
    """,
    "frame-sampling plan: every 2nd frame index per media row",
    tags=("multimodal",),
)
def mm_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    meta = probe_binary(docs).select("doc_id", "n_frames")
    return frame_sample_plan(meta).select(
        "doc_id", "n_frames", F.col("frame_indices").cast("array<int>").alias("frame_indices")
    )


@register(
    "mm_size_stats_by_source",
    """
    SELECT source,
           CAST(count(*) AS BIGINT)            AS n_payloads,
           CAST(sum(strlen(text)) AS BIGINT)   AS total_bytes,
           CAST(max(strlen(text)) AS INT)      AS max_bytes
    FROM documents GROUP BY source
    """,
    "payload size accounting per source (binary column + relational agg)",
    tags=("multimodal", "agg"),
)
def mm_size_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "source", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
    )
