"""The end-to-end pretraining-data funnel: quality rules → exact dedup
→ near dedup, with per-document stage attribution.

This is the composition the per-operator gates exist FOR — the
RefinedWeb/FineWeb pipeline shape: cheap map-only quality rules prune
first (no shuffle), exact dedup runs on the survivors (one hash-key
window), near-dup banding runs last so the most expensive stage sees
the least data. Stage ORDER is the 100 TB cost model.

Rule choice is corpus-tuned, as in any real pipeline: this synthetic
corpus has no terminal punctuation at all, so C4's sentence rules (the
``text_c4_doc_filters`` gate) would vacuously kill every document
before the dedup stages ran — the funnel instead uses the rules this
corpus differentiates on (length floor; type-token-ratio repetition,
the Gopher-family signal), keeping every stage non-trivially
exercised. The full rule sets live in their dedicated gates
(``text_gopher_quality_filters``, ``text_c4_doc_filters``,
``text_repetition_profile``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.hashing import minhash_signatures
from ..operators.text import normalized
from . import register
from .textanalysis import _SQL_WORDS

_SQL_FUNNEL_CTES = f"""
    feat AS (
        SELECT doc_id, text, {_SQL_WORDS} AS w FROM documents
    ),
    rules AS (
        SELECT doc_id, text,
               len(w) >= 20 AS len_keep,
               CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.35 AS rep_keep
        FROM feat WHERE len(w) > 0
    ),
    quality AS (
        SELECT doc_id, text FROM rules WHERE len_keep AND rep_keep
    ),
    exact_first AS (
        SELECT doc_id,
               doc_id = min(doc_id) OVER (
                   PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
               ) AS exact_keep
        FROM quality
    ),
    exact_kept AS (
        SELECT q.doc_id, q.text FROM quality q JOIN exact_first e USING (doc_id)
        WHERE e.exact_keep
    ),
    shingle AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
            FROM (SELECT doc_id, {_SQL_WORDS} AS w FROM exact_kept)
        )
    ),
    lanes AS (
        SELECT doc_id,
               ('0x' || substr(md5(sh), 1, 8))::BIGINT AS a,
               (('0x' || substr(md5(sh), 9, 8))::BIGINT) | 1 AS b
        FROM shingle
    ),
    minh AS (
        SELECT doc_id, s.seed, min((a + s.seed * b) & 4294967295) AS h
        FROM lanes, range(0, 8) s(seed) GROUP BY doc_id, s.seed
    ),
    sig AS (
        SELECT doc_id, list(h ORDER BY seed) AS sig FROM minh GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, b.band,
               CAST(sig[2*b.band + 1] AS VARCHAR) || '_' || CAST(sig[2*b.band + 2] AS VARCHAR)
                   AS band_key
        FROM sig, range(0, 4) b(band)
    ),
    near_verdict AS (
        SELECT doc_id,
               bool_and(doc_id = first_doc) AS near_keep
        FROM (SELECT doc_id, band, band_key,
                     min(doc_id) OVER (PARTITION BY band, band_key) AS first_doc
              FROM banded)
        GROUP BY doc_id
    )
"""


@register(
    "pipeline_quality_funnel",
    f"""
    WITH {_SQL_FUNNEL_CTES}
    SELECT r.doc_id,
           CASE WHEN NOT r.len_keep THEN 'length'
                WHEN NOT r.rep_keep THEN 'repetition'
                WHEN NOT e.exact_keep THEN 'exact_dup'
                WHEN NOT coalesce(n.near_keep, TRUE) THEN 'near_dup'
                ELSE 'kept' END AS verdict
    FROM rules r
    LEFT JOIN exact_first e USING (doc_id)
    LEFT JOIN near_verdict n USING (doc_id)
    """,
    "the end-to-end pretraining funnel with per-doc stage attribution: "
    "length floor -> type-token-ratio repetition rule -> exact dedup "
    "(first wins) -> minhash band near-dedup (first in all 4 bands "
    "wins), each stage over the previous stage's survivors",
    tags=("pipeline", "dedup", "quality", "training"),
)
def pipeline_quality_funnel(
    spark: SparkSession,
    sf_dir: str,
    classifier_weights: list[float] | None = None,
    classifier_bias: float = 0.0625,
) -> DataFrame:
    """100 TB shape by construction: the quality stages are map-only
    codegen over the scan (zero shuffle) and prune FIRST; exact dedup
    is one hash-key window over the survivors; the band near-dedup —
    the only multi-shuffle stage — sees only what everything cheaper
    kept. Per-stage semantics match the dedicated gates
    (first-occurrence-wins exact dedup; the batch closed form of
    stream_minhash_band_dedup's band-first-wins).

    ``classifier_weights`` (optional) inserts a supervised
    quality-classifier stage (operators/quality_classifier.py, the
    ``text_quality_classifier_scores`` gate's scorer) between the rule
    stage and exact dedup: docs with logit <= 0 get verdict
    'classifier'. Still map-only codegen, so the funnel's
    cheapest-first cost ordering is preserved; default None keeps the
    oracle-gated 4-stage shape byte-identical."""
    docs = table(spark, sf_dir, "documents")
    w = F.col("w")
    feat = docs.select(
        "doc_id",
        "text",
        F.split(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " ").alias("w"),
    ).filter(F.size("w") > 0)
    if classifier_weights is not None:
        from ..operators.quality_classifier import quality_score

        clf_keep = quality_score(w, classifier_weights, classifier_bias) > 0
    else:
        clf_keep = F.lit(True)
    rules = feat.select(
        "doc_id",
        "text",
        (F.size(w) >= 20).alias("len_keep"),
        (
            F.size(F.array_distinct(w)).cast("double") / F.size(w) >= 0.35
        ).alias("rep_keep"),
        clf_keep.alias("clf_keep"),
    )
    quality = rules.filter("len_keep AND rep_keep AND clf_keep").select("doc_id", "text")
    w_exact = Window.partitionBy(F.md5(normalized(F.col("text"))))
    exact = quality.select(
        "doc_id", "text", (F.col("doc_id") == F.min("doc_id").over(w_exact)).alias("exact_keep")
    )
    exact_kept = exact.filter("exact_keep").select("doc_id", "text")
    sigs = minhash_signatures(exact_kept, "doc_id", "text", num_hashes=8, shingle_words=3)
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band")
    banded = sigs.select("doc_id", "sig", band_idx).select(
        "doc_id",
        "band",
        F.concat_ws(
            "_",
            F.element_at("sig", F.col("band") * 2 + 1).cast("string"),
            F.element_at("sig", F.col("band") * 2 + 2).cast("string"),
        ).alias("band_key"),
    )
    w_band = Window.partitionBy("band", "band_key")
    near = (
        banded.withColumn("first_doc", F.min("doc_id").over(w_band))
        .groupBy("doc_id")
        .agg(F.bool_and(F.col("doc_id") == F.col("first_doc")).alias("near_keep"))
    )
    return (
        rules.join(exact.select("doc_id", "exact_keep"), "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(~F.col("len_keep"), "length")
            .when(~F.col("rep_keep"), "repetition")
            .when(~F.col("clf_keep"), "classifier")
            .when(~F.col("exact_keep"), "exact_dup")
            .when(~F.coalesce("near_keep", F.lit(True)), "near_dup")
            .otherwise("kept")
            .alias("verdict"),
        )
    )
