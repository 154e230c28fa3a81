"""Sequence packing for LLM training pipelines: assign documents to
fixed-token-budget training sequences.

Two standard strategies, both deterministic and oracle-verifiable:

- **concat-and-chunk** (GPT-style): concatenate all documents in a
  deterministic order and cut every ``budget`` tokens; a document can
  straddle a cut. Pure window arithmetic — one shuffle, whole-stage
  codegen, no Python.
- **next-fit bin packing**: documents are salted into independent
  buckets (hash of the id), and each bucket packs greedily in id
  order — a doc opens a new pack when it would overflow the budget, so
  documents are never split. The per-bucket fold is sequential state →
  Arrow-batched ``applyInPandas`` per bucket. Buckets are the scale
  unit: 100 TB packs with as many parallel folds as buckets, and the
  result is independent of partitioning because bucket membership and
  intra-bucket order are data-determined.

Reference parity: the reference has no packing operator (SURVEY.md
§2.6); this is a north-star LLM-pipeline extension over ``documents``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def concat_chunk_spans(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc span in the concatenated token stream (id order):
    (id, n_tokens, start_offset, first_chunk, last_chunk, spans_cut).

    ``first_chunk``/``last_chunk`` = which ``budget``-sized training
    sequences the doc lands in; ``spans_cut`` marks stragglers split
    across a boundary (the loss-masking special case downstream).

    The global prefix sum is computed WITHOUT a global single-partition
    window (the classic scale killer): range-partition on the id, sum
    tokens per partition (a partitions-sized table), prefix-sum that
    tiny table, broadcast it back, and run the intra-partition cumsum
    as a per-partition window. Identical result for any contiguous
    range partitioning; every stage is parallel at 100 TB.
    """
    from .ordering import _pin_range_partitioning

    toks = docs.select(F.col(id_col), token_count(F.col(text_col)).alias("n_tokens"))
    # pinned for the same reason as the ordering kernels: psums and the
    # join-back are separate subtrees, and two independent range
    # exchanges may reservoir-sample different split points at scale
    parted = _pin_range_partitioning(
        toks.repartitionByRange(F.col(id_col)).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    psums = parted.groupBy("_pid").agg(F.sum("n_tokens").alias("_psum"))
    w_tiny = (
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )  # partitions-sized table: single-partition window is fine HERE
    offsets = psums.withColumn(
        "_poffset", F.coalesce(F.sum("_psum").over(w_tiny), F.lit(0)).cast("long")
    ).select("_pid", "_poffset")
    w_intra = (
        Window.partitionBy("_pid").orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_poffset") + F.coalesce(F.sum("n_tokens").over(w_intra), F.lit(0))
    out = (
        parted.join(F.broadcast(offsets), "_pid")
        .withColumn("start_offset", start.cast("long"))
        .drop("_pid", "_poffset")
    )
    first = F.floor(F.col("start_offset") / budget).cast("long")
    # empty docs occupy no tokens: pin them to their start boundary
    last = F.floor(
        (F.col("start_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0))) / budget
    ).cast("long")
    return out.select(
        id_col,
        "n_tokens",
        "start_offset",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (first != last).alias("spans_cut"),
    )


def next_fit_packs(
    docs: DataFrame,
    budget: int,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bucket, pack_id, pack_fill_after): greedy next-fit packing
    within hash buckets. A doc larger than the budget gets a pack of
    its own (never split). ``pack_id`` restarts at 0 per bucket."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_buckets).cast("int").alias("bucket"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs, fills = [], []
        pack_id, fill = 0, 0
        for i, tok in enumerate(pdf["n_tokens"]):
            tok = int(tok)
            if i > 0 and fill + tok > budget:
                pack_id += 1
                fill = 0
            fill += tok
            packs.append(pack_id)
            fills.append(fill)
        out = pdf[["doc_id", "bucket", "n_tokens"]].copy()
        out["pack_id"] = pd.Series(packs, dtype="int64")
        out["pack_fill_after"] = pd.Series(fills, dtype="int64")
        return out

    return toks.groupBy("bucket").applyInPandas(
        pack,
        schema="doc_id bigint, bucket int, n_tokens int, pack_id bigint, pack_fill_after bigint",
    )
