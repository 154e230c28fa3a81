"""Sequence-packing corpus entries (training-data pipeline).

Token counts use the same normalized-words definition as the text
suite (``operators/text.py::token_count`` ⟷ the oracle's
``string_split`` expression), already proven cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..operators.packing import concat_chunk_spans, next_fit_packs
from . import register
from .textanalysis import _SQL_STOP_LIST, _SQL_WORDS  # shared oracle fragments

_BUDGET = 256
_N_BUCKETS = 8

_SQL_NTOK = (
    "CASE WHEN regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') = '' THEN 0 "
    "ELSE len(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) END"
)


@register(
    "train_pack_concat_chunks",
    f"""
    WITH toks AS (
        SELECT doc_id, CAST({_SQL_NTOK} AS INT) AS n_tokens FROM documents
    ),
    spans AS (
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS start_offset
        FROM toks
    )
    SELECT doc_id, n_tokens, start_offset,
           CAST(start_offset // {_BUDGET} AS BIGINT) AS first_chunk,
           CAST((start_offset + greatest(n_tokens - 1, 0)) // {_BUDGET} AS BIGINT) AS last_chunk,
           (start_offset // {_BUDGET})
               <> ((start_offset + greatest(n_tokens - 1, 0)) // {_BUDGET}) AS spans_cut
    FROM spans
    """,
    "GPT-style concat-and-chunk packing: every doc's span in the "
    "concatenated token stream, cut every 256 tokens (window arithmetic, "
    "no Python)",
    tags=("training", "packing", "window"),
)
def train_pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return concat_chunk_spans(table(spark, sf_dir, "documents"), budget=_BUDGET)


@register(
    "train_pack_next_fit",
    f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, CAST(doc_id % {_N_BUCKETS} AS INT) AS bucket,
               CAST({_SQL_NTOK} AS INT) AS n_tokens
        FROM documents
    ),
    seq AS (
        SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM toks
    ),
    walk AS (
        SELECT bucket, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS pack_id, CAST(n_tokens AS BIGINT) AS fill
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.bucket, s.rn, s.doc_id, s.n_tokens,
               CASE WHEN w.fill + s.n_tokens > {_BUDGET} THEN w.pack_id + 1
                    ELSE w.pack_id END,
               CASE WHEN w.fill + s.n_tokens > {_BUDGET} THEN CAST(s.n_tokens AS BIGINT)
                    ELSE w.fill + s.n_tokens END
        FROM walk w JOIN seq s ON s.bucket = w.bucket AND s.rn = w.rn + 1
    )
    SELECT doc_id, bucket, n_tokens, pack_id, fill AS pack_fill_after FROM walk
    """,
    "next-fit bin packing into 256-token training sequences within hash "
    "buckets (docs never split): per-bucket sequential fold via Arrow "
    "applyInPandas; the oracle replays the fold with a recursive CTE",
    tags=("training", "packing", "stateful"),
)
def train_pack_next_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return next_fit_packs(
        table(spark, sf_dir, "documents"), budget=_BUDGET, n_buckets=_N_BUCKETS
    )


@register(
    "train_curriculum_order",
    # Curriculum ordering: feed highest-quality documents first. The
    # global position comes from operators/ordering.py::global_row_number
    # (range-partition + broadcast offsets), never a single-partition
    # window; quality is the text-suite heuristic already proven against
    # the oracle (text_quality_scores).
    f"""
    WITH feat AS (
        SELECT doc_id,
               CAST(len(w) AS DOUBLE) AS n_tok,
               CAST(len(list_filter(w, t -> list_contains({_SQL_STOP_LIST}, t))) AS DOUBLE)
                   / CAST(len(w) AS DOUBLE) AS stop_ratio,
               CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
                   / CAST(len(w) AS DOUBLE) AS atl
        -- DuckDB string_split('', ' ') is [''], not []: the empty-doc
        -- guard tests the normalized TEXT (inside the projection, where
        -- text is still in scope), mirroring Spark's token_count > 0
        FROM (SELECT doc_id, {_SQL_WORDS} AS w FROM documents
              WHERE regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') <> '')
    ),
    scored AS (
        SELECT doc_id,
               round(((least(n_tok / 50.0, 1.0)
                      + (1.0 - least(abs(stop_ratio - 0.1), 1.0))
                      + (CASE WHEN atl >= 2.0 AND atl <= 10.0 THEN 1.0 ELSE 0.5 END)
                     ) / 3.0) * 10000.0) / 10000.0 + 0.0 AS quality
        FROM feat
    )
    SELECT doc_id, quality,
           CAST(row_number() OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS position
    FROM scored
    """,
    "curriculum ordering: quality-descending global training positions "
    "via the distributed two-pass row number (no global window)",
    tags=("training", "curriculum", "window"),
)
def train_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.ordering import global_row_number
    from ..operators.text import quality_score, token_count

    # r14: spread (guide §2.5) — the token-count + quality-score maps ran
    # single-task on the single-row-group input (noop A/B: 1244 → 564 ms).
    docs = (
        table(spark, sf_dir, "documents", spread=True)
        .filter(token_count(F.col("text")) > 0)
        .select("doc_id", quality_score(F.col("text")).alias("quality"))
    )
    return global_row_number(
        docs, [F.desc("quality"), F.asc("doc_id")], out_col="position"
    ).select("doc_id", "quality", "position")
