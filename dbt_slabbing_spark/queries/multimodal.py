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
           array_to_string(list_transform(range(0, CAST(n_frames AS BIGINT), 2),
                                          x -> CAST(x AS VARCHAR)), ',') AS frame_indices_csv
    FROM meta
    """,
    "frame-sampling plan: every 2nd frame index per media row (CSV string "
    "output so the driver canonicalizer never sees an array column)",
    tags=("multimodal",),
)
def mm_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    meta = probe_binary(docs).select("doc_id", "n_frames")
    return frame_sample_plan(meta).select(
        "doc_id",
        "n_frames",
        F.array_join(
            F.transform(F.col("frame_indices"), lambda x: x.cast("string")), ","
        ).alias("frame_indices_csv"),
    )


@register(
    "mm_decode_dimensions",
    # Even doc_ids become a real PNG whose IHDR encodes (len%640+1,
    # len%480+1); odd doc_ids a real PCM WAV at 8 kHz with (len%1000+1)*8
    # frames → duration exactly len%1000+1 ms. The engine builds the
    # actual bytes and parses them back with the dependency-free header
    # decoders (operators/multimodal.py); the oracle recomputes the
    # arithmetic the payloads were built from.
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS media_type,
           CASE WHEN doc_id % 2 = 0 THEN CAST(strlen(text) % 640 + 1 AS INT) END AS width,
           CASE WHEN doc_id % 2 = 0 THEN CAST(strlen(text) % 480 + 1 AS INT) END AS height,
           CASE WHEN doc_id % 2 = 1 THEN CAST(1 AS INT) END AS n_channels,
           CASE WHEN doc_id % 2 = 1 THEN CAST(8000 AS INT) END AS sample_rate,
           CASE WHEN doc_id % 2 = 1 THEN CAST(strlen(text) % 1000 + 1 AS INT) END AS duration_ms
    FROM documents
    """,
    "real header decoders (PNG IHDR / WAV stdlib) over synthesized real "
    "media bytes, Arrow-batched mapInPandas",
    tags=("multimodal", "pandas_udf"),
)
def mm_decode_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.multimodal import probe_media, synth_png, synth_wav

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("_len")
    )

    def synth_batches(batches):
        for pdf in batches:
            payloads = []
            for doc_id, n in zip(pdf["doc_id"], pdf["_len"]):
                n = int(n)
                if doc_id % 2 == 0:
                    payloads.append(synth_png(n % 640 + 1, n % 480 + 1))
                else:
                    payloads.append(synth_wav(8000, (n % 1000 + 1) * 8))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(synth_batches, schema="doc_id bigint, payload binary")
    return probe_media(media)


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


@register(
    "mm_resize_tile_plan",
    # Even doc_ids synthesize a REAL PNG (IHDR = (len%640+1, len%480+1)),
    # the header decoder parses the dims back (mapInPandas, Arrow
    # batches), and the resize/tile plan is pure integer arithmetic the
    # oracle restates from the same length seeds: shorter side -> 224
    # (floor), 224-tile grid (ceil), RGB byte budget. The pixel resize
    # itself is decode_image, dependency-gated; the PLAN (schema, batch
    # shape, byte budget) is what the scheduling layer consumes.
    """
    WITH d AS (
        SELECT doc_id,
               CAST(strlen(text) % 640 + 1 AS INT) AS width,
               CAST(strlen(text) % 480 + 1 AS INT) AS height
        FROM documents WHERE doc_id % 2 = 0
    )
    SELECT doc_id, width, height,
           CAST((width * 224) // least(width, height) AS INT)  AS out_w,
           CAST((height * 224) // least(width, height) AS INT) AS out_h,
           CAST(((width * 224) // least(width, height) + 223) // 224
                * (((height * 224) // least(width, height) + 223) // 224)
                AS INT) AS n_tiles,
           CAST((width * 224) // least(width, height) AS BIGINT)
               * ((height * 224) // least(width, height)) * 3 AS out_bytes
    FROM d
    """,
    "image resize/tile scheduling plan: real PNG headers parsed back "
    "via mapInPandas, then shorter-side-224 output dims, tile grid and "
    "decode byte budget as pure codegen integer arithmetic",
    tags=("multimodal", "plan"),
)
def mm_resize_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.multimodal import probe_media, resize_tile_plan, synth_png

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 0)
        .select(
            "doc_id",
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("_len"),
        )
    )

    def synth_batches(batches):
        for pdf in batches:
            payloads = [
                synth_png(int(n) % 640 + 1, int(n) % 480 + 1)
                for n in pdf["_len"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(synth_batches, schema="doc_id bigint, payload binary")
    dims = probe_media(media).select("doc_id", "width", "height")
    return resize_tile_plan(dims).select(
        "doc_id", "width", "height", "out_w", "out_h", "n_tiles", "out_bytes"
    )
