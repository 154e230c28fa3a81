"""Training-data preparation pipeline over ``documents`` — the
north-star LLM use case end-to-end, composed from the engine's own
operators:

    quality gate (operators/text.py) → language filter (marker langid)
    → exact near-dup removal (normalized md5, keep lowest doc_id)
    → fixed-size token chunking → per-chunk metadata (hash, counts)

Every stage is a pure Column expression / window — the whole pipeline
is ONE Catalyst plan with a single shuffle (the dedup window) plus the
chunk explode. At 100 TB: the quality/langid gates prune before the
shuffle; dedup shuffles on the 128-bit content hash (uniform — no
skew); chunking multiplies rows AFTER dedup, never before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import text as T


def build_training_chunks(
    docs: DataFrame,
    min_tokens: int = 30,
    min_quality: float = 0.5,
    lang: str = "en",
    chunk_tokens: int = 50,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_hash, n_tokens) — packed training chunks."""
    txt = F.col("text")
    gated = docs.filter(
        (T.token_count(txt) >= min_tokens)
        & (T.quality_score(txt) >= min_quality)
        & (T.predicted_lang(txt) == lang)
    )

    content_key = F.md5(T.normalized(txt).cast("binary"))
    w = Window.partitionBy(content_key).orderBy("doc_id")
    deduped = gated.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)

    words = T.words(txt)
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * chunk_tokens + 1, chunk_tokens)),
    )
    exploded = deduped.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "_chunk"))
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.md5(F.col("_chunk").cast("binary")).alias("chunk_hash"),
        F.size(F.split(F.col("_chunk"), " ")).alias("n_tokens"),
    )
