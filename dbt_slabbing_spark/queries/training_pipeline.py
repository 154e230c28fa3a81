"""Gate entry for the end-to-end training-data pipeline: the full
quality → langid → dedup → chunk chain must hash-match one composed
oracle query (each fragment is the same SQL already proven by the
individual text/dedup oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.text import LANG_MARKERS
from ..pipelines.training_data import build_training_chunks
from ..catalog import table
from . import register

_WORDS = "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"
_NTEXT = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_STOP = "['the', 'a', 'of', 'and', 'in', 'to']"


def _oracle() -> str:
    score_cols = ",\n               ".join(
        f"len(list_filter(w, t -> list_contains({list(m)!r}, t))) AS s_{lang}"
        for lang, m in LANG_MARKERS.items()
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_MARKERS) + ")"
    whens = " ".join(f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'" for lang in LANG_MARKERS)
    return f"""
    WITH norm AS (
        SELECT doc_id, {_WORDS} AS w, {_NTEXT} AS ntext FROM documents
    ),
    feat AS (
        SELECT doc_id, w, ntext,
               CAST(len(w) AS DOUBLE) AS n_tok,
               CAST(len(list_filter(w, t -> list_contains({_STOP}, t))) AS DOUBLE)
                   / CAST(len(w) AS DOUBLE) AS stop_ratio,
               CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
                   / CAST(len(w) AS DOUBLE) AS atl,
               {score_cols}
        FROM norm WHERE len(w) > 0
    ),
    scored AS (
        SELECT *,
               round(((least(n_tok / 50.0, 1.0)
                       + (1.0 - least(abs(stop_ratio - 0.1), 1.0))
                       + (CASE WHEN atl >= 2.0 AND atl <= 10.0 THEN 1.0 ELSE 0.5 END)
                      ) / 3.0) * 10000.0) / 10000.0 + 0.0 AS quality,
               CASE {whens} ELSE 'und' END AS lang_pred
        FROM (SELECT *, {best} AS best FROM feat)
    ),
    gated AS (
        SELECT doc_id, w, ntext FROM scored
        WHERE n_tok >= 30 AND quality >= 0.5 AND lang_pred = 'en'
    ),
    dedup AS (
        SELECT doc_id, w FROM (
            SELECT doc_id, w,
                   row_number() OVER (PARTITION BY md5(ntext) ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    ),
    chunks AS (
        SELECT doc_id, i AS chunk_idx,
               array_to_string(w[i*50 + 1 : i*50 + 50], ' ') AS chunk
        FROM (
            SELECT doc_id, w,
                   unnest(range(0, CAST(ceil(len(w) / 50.0) AS BIGINT))) AS i
            FROM dedup
        )
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           md5(chunk) AS chunk_hash,
           CAST(len(string_split(chunk, ' ')) AS INT) AS n_tokens
    FROM chunks
    """


@register(
    "training_chunks_pipeline",
    _oracle(),
    "end-to-end training-data pipeline: quality gate → langid → exact "
    "dedup → 50-token chunks, one fused plan",
    tags=("text", "dedup", "pipeline"),
)
def training_chunks_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_training_chunks(table(spark, sf_dir, "documents"))
