"""Text analysis over ``documents``: token stats, quality scoring,
heuristic language ID, document fingerprinting.

Every metric is a pure Column expression (operators/text.py) with the
exact same formula mirrored into the DuckDB oracle — a text-quality
filter that can't be independently recomputed isn't a metric, it's a
mood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import text as T
from . import dround, register

_SQL_WORDS = "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"
_SQL_STOP_LIST = "['the', 'a', 'of', 'and', 'in', 'to']"


@register(
    "text_token_stats",
    f"""
    WITH tok AS (
        SELECT source, CAST(len({_SQL_WORDS}) AS INT) AS n_tokens FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round((avg(n_tokens)) * 10000.0) / 10000.0       AS avg_tokens
    FROM tok GROUP BY source
    """,
    "token counting per source (whitespace tokenizer)",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").withColumn("n_tokens", T.token_count(F.col("text")))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        dround(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


@register(
    "text_token_histogram",
    f"""
    SELECT CAST(len({_SQL_WORDS}) // 25 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY bucket
    """,
    "token-count histogram (25-token buckets)",
    tags=("text",),
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.floor(T.token_count(F.col("text")) / 25).cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_quality_scores",
    f"""
    WITH feat AS (
        SELECT doc_id, lang,
               CAST(len(w) AS DOUBLE) AS n_tok,
               CAST(len(list_filter(w, t -> list_contains({_SQL_STOP_LIST}, t))) AS DOUBLE)
                   / CAST(len(w) AS DOUBLE) AS stop_ratio,
               CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
                   / CAST(len(w) AS DOUBLE) AS atl
        FROM (SELECT doc_id, lang, {_SQL_WORDS} AS w FROM documents)
        WHERE len(w) > 0
    )
    SELECT doc_id, lang,
           round(((least(n_tok / 50.0, 1.0)
                  + (1.0 - least(abs(stop_ratio - 0.1), 1.0))
                  + (CASE WHEN atl >= 2.0 AND atl <= 10.0 THEN 1.0 ELSE 0.5 END)
                 ) / 3.0) * 10000.0) / 10000.0 AS quality,
           round((stop_ratio) * 10000.0) / 10000.0 AS stop_ratio,
           round((atl) * 10000.0) / 10000.0        AS avg_token_len
    FROM feat
    """,
    "document quality scoring: length / stopword-density / token-shape heuristic",
    tags=("text", "quality"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    txt = F.col("text")
    return (
        table(spark, sf_dir, "documents")
        .filter(T.token_count(txt) > 0)
        .select(
            "doc_id",
            "lang",
            T.quality_score(txt).alias("quality"),
            dround(T.stopword_ratio(txt), 4).alias("stop_ratio"),
            dround(T.avg_token_len(txt), 4).alias("avg_token_len"),
        )
    )


def _sql_langid_oracle() -> str:
    """DuckDB SQL mirroring operators/text.py::predicted_lang
    (same marker lists, same tie precedence en→fr→de→es→zh)."""
    # Python repr of a list of strings is valid DuckDB list syntax.
    score_cols = ",\n               ".join(
        f"len(list_filter(w, t -> list_contains({list(markers)!r}, t))) AS s_{lang}"
        for lang, markers in T.LANG_MARKERS.items()
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in T.LANG_MARKERS) + ")"
    whens = "\n                    ".join(
        f"WHEN s_{lang} = _best AND _best > 0 THEN '{lang}'" for lang in T.LANG_MARKERS
    )
    return f"""
    WITH feat AS (
        SELECT lang,
               {score_cols}
        FROM (SELECT lang, {_SQL_WORDS} AS w FROM documents)
    ),
    pred AS (
        SELECT lang,
               CASE {whens}
                    ELSE 'und' END AS lang_pred
        FROM (SELECT *, {best} AS _best FROM feat)
    )
    SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY lang, lang_pred
    """


@register(
    "text_langid_confusion",
    _sql_langid_oracle(),
    "heuristic n-gram/marker language ID vs the labeled lang column",
    tags=("text", "langid"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang", T.predicted_lang(F.col("text")).alias("lang_pred"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_fingerprint_groups",
    f"""
    WITH norm AS (
        SELECT doc_id, text, {_SQL_WORDS} AS w FROM documents
    ),
    sh4 AS (
        SELECT doc_id, min(md5(sh)) AS fp4 FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(w) - 2, 1)),
                                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
            FROM norm
        ) GROUP BY doc_id
    ),
    fp AS (
        SELECT norm.doc_id,
               coalesce(fp4, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))) AS fingerprint
        FROM norm LEFT JOIN sh4 ON norm.doc_id = sh4.doc_id
    )
    SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS first_doc
    FROM fp GROUP BY fingerprint
    """,
    "winnowing-style fingerprint (min md5 over 4-word shingles) + collision groups",
    tags=("text", "fingerprint"),
)
def text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", T.fingerprint(F.col("text"), 4).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )
