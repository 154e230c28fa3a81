"""Full-text relevance scoring and repetition profiling over
``documents``: BM25 ranked retrieval and Gopher-style n-gram
repetition quality signals.

Reference parity: the reference has no text operators (SURVEY.md §2.6);
these extend the north-star LLM-pipeline text stack (textanalysis.py)
with the two remaining standard tools — a ranked-retrieval scorer and
the repetition filters every large-scale pretraining pipeline applies.

100 TB story:
- BM25 corpus statistics (doc count, avg doc length, per-term document
  frequencies) reduce to ONE scalar aggregate broadcast back to the
  scan — per-doc scoring is then map-side only (no shuffle carries the
  corpus), and the final top-k is a partial-top-k-per-partition +
  single-reduce sort, which Spark plans automatically for ORDER+LIMIT.
- Repetition profiling shuffles (doc_id, ngram) counts — keyed by
  doc_id so the reduce is pre-partitioned for the follow-up per-doc
  max/sum; no global state, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import text as T
from . import dround, register
from .textanalysis import _SQL_WORDS

#: Fixed query-term set for the BM25 gate (drawn from the synthetic
#: corpus vocabulary so every term has non-trivial document frequency).
BM25_TERMS: tuple[str, ...] = ("table", "scan", "window")
BM25_K1 = 1.2
BM25_B = 0.75


def _term_eq(term: str):
    def pred(x: Column) -> Column:
        return x == F.lit(term)

    return pred


def _sql_bm25_oracle() -> str:
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(w, t -> t = '{term}')) AS BIGINT) AS tf{i}"
        for i, term in enumerate(BM25_TERMS)
    )
    df_cols = ",\n               ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    score = "\n             + ".join(
        f"ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * {BM25_K1 + 1.0}) / (tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
    WITH feat AS (
        SELECT doc_id, CAST(len(w) AS INT) AS dl,
               {tf_cols}
        FROM (SELECT doc_id, {_SQL_WORDS} AS w FROM documents)
        WHERE len(w) > 0
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               avg(dl) AS avgdl,
               {df_cols}
        FROM feat
    ),
    scored AS (
        SELECT doc_id, dl,
               round(({score}) * 10000.0) / 10000.0 + 0.0 AS score
        FROM feat CROSS JOIN stats
    )
    SELECT doc_id, dl, score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 20
    """


@register(
    "text_bm25_topk",
    _sql_bm25_oracle(),
    "BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed term set: "
    "corpus stats as ONE broadcast scalar aggregate, map-side scoring, "
    "sort+limit top-k (doc_id tiebreaker)",
    tags=("text", "search", "training"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", T.words(F.col("text")).alias("w"))
        .withColumn("dl", F.size("w"))
        .filter(F.col("dl") > 0)
    )
    feat = docs.select(
        "doc_id",
        "dl",
        *[
            # NB: a two-arg lambda means (element, index) to F.filter, so
            # the term is bound via a closure factory, not a default arg.
            F.size(F.filter(F.col("w"), _term_eq(term)))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, term in enumerate(BM25_TERMS)
        ],
    )
    # Corpus statistics: one scalar row, broadcast back to the scan.
    stats = feat.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(BM25_TERMS)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        norm = F.col(f"tf{i}") + BM25_K1 * (
            1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
        )
        part = idf * (F.col(f"tf{i}") * (BM25_K1 + 1.0)) / norm
        score = part if score is None else score + part
    return (
        feat.crossJoin(F.broadcast(stats))
        .select("doc_id", "dl", dround(score, 4).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@register(
    "text_repetition_profile",
    # Gopher-style repetition quality signals: the fraction of tokens
    # covered by the most frequent unigram and of bigram slots covered
    # by the most frequent bigram. Thresholds mirror the published
    # heuristic shape (top-unigram > 0.2 or top-bigram > 0.05 →
    # repetitive) — the values, not the thresholds, are what the gate
    # hash-checks.
    f"""
    WITH norm AS (
        SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ),
    uni AS (
        SELECT doc_id, CAST(max(c) AS BIGINT) AS top_token, CAST(sum(c) AS BIGINT) AS n_tokens
        FROM (
            SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(w) AS tok FROM norm)
            GROUP BY doc_id, tok
        ) GROUP BY doc_id
    ),
    bi AS (
        SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram, CAST(sum(c) AS BIGINT) AS n_bigrams
        FROM (
            SELECT doc_id, sh, count(*) AS c
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS sh
                FROM norm WHERE len(w) >= 2
            )
            GROUP BY doc_id, sh
        ) GROUP BY doc_id
    )
    SELECT uni.doc_id,
           n_tokens, top_token,
           round((CAST(top_token AS DOUBLE) / n_tokens) * 10000.0) / 10000.0 + 0.0 AS top_token_frac,
           n_bigrams, top_bigram,
           round((CAST(top_bigram AS DOUBLE) / n_bigrams) * 10000.0) / 10000.0 + 0.0 AS top_bigram_frac,
           (CAST(top_token AS DOUBLE) / n_tokens > 0.2
            OR CAST(top_bigram AS DOUBLE) / n_bigrams > 0.05) AS repetitive
    FROM uni JOIN bi ON uni.doc_id = bi.doc_id
    """,
    "Gopher-style repetition profile: top-unigram / top-bigram coverage "
    "fractions per doc + repetitive flag (explode → two keyed "
    "aggregations, both pre-partitioned by doc_id)",
    tags=("text", "quality", "training"),
)
def text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: spread (guide §2.5) — single-row-group input; no-op at scale.
    docs = table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", T.words(F.col("text")).alias("w")
    )
    uni = (
        docs.select("doc_id", F.explode("w").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("bigint").alias("top_token"),
            F.sum("c").cast("bigint").alias("n_tokens"),
        )
    )
    # Bigrams built inline from the already-materialized token array
    # ("w" is a column, not a re-evaluated expression — the
    # word_shingles() let-binding trap doesn't apply here).
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("w") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("w"), i), F.element_at(F.col("w"), i + 1)
        ),
    )
    bi = (
        docs.filter(F.size("w") >= 2)
        .select("doc_id", F.explode(bigrams).alias("sh"))
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("bigint").alias("top_bigram"),
            F.sum("c").cast("bigint").alias("n_bigrams"),
        )
    )
    tt = F.col("top_token").cast("double") / F.col("n_tokens")
    tb = F.col("top_bigram").cast("double") / F.col("n_bigrams")
    return uni.join(bi, "doc_id").select(
        "doc_id",
        "n_tokens",
        "top_token",
        dround(tt, 4).alias("top_token_frac"),
        "n_bigrams",
        "top_bigram",
        dround(tb, 4).alias("top_bigram_frac"),
        ((tt > 0.2) | (tb > 0.05)).alias("repetitive"),
    )


@register(
    "text_unigram_surprisal",
    # Unigram language-model quality signal (the KenLM-style perplexity
    # filter's cheapest sibling): mean token surprisal -ln p(w) under
    # the corpus's own unigram distribution. High mean surprisal = the
    # doc is lexically atypical for the corpus.
    f"""
    WITH tok AS (
        SELECT doc_id, unnest(w) AS tok
        FROM (SELECT doc_id, {{words}} AS w FROM documents)
        WHERE len(w) > 0
    ),
    freq AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok
    ),
    tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS t FROM freq
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round((avg(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)))) * 10000.0) / 10000.0 + 0.0
               AS mean_surprisal
    FROM tok JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """.replace("{words}", _SQL_WORDS),
    "unigram-LM mean token surprisal per doc (corpus term frequencies "
    "as a broadcast dimension; lexical-typicality quality signal)",
    tags=("text", "quality", "training"),
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", T.words(F.col("text")).alias("w"))
        .filter(F.size("w") > 0)
        .select("doc_id", F.explode("w").alias("tok"))
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = freq.agg(F.sum("c").cast("bigint").alias("t"))
    surprisal = -F.log(F.col("c").cast("double") / F.col("t").cast("double"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            dround(F.avg(surprisal), 4).alias("mean_surprisal"),
        )
    )


@register(
    "text_ccnet_surprisal_buckets",
    # CCNet-style quality bucketing (Wenzek et al. 2020): per language,
    # docs sort by LM score and split into head/middle/tail terciles —
    # head feeds pretraining, tail gets dropped. LM score here = the
    # unigram mean surprisal above (4 dp, so ties are exact across
    # engines). Cutoffs are computed EXACTLY (smallest score with
    # 3*cum >= n resp. 3*cum >= 2n, integer arithmetic, ties share a
    # bucket) over the per-(lang, score) HISTOGRAM.
    f"""
    WITH tok AS (
        SELECT doc_id, lang, unnest(w) AS tok
        FROM (SELECT doc_id, lang, {{words}} AS w FROM documents)
        WHERE len(w) > 0
    ),
    freq AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM freq),
    scored AS (
        SELECT doc_id, lang,
               round((avg(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)))) * 10000.0) / 10000.0 + 0.0 AS s
        FROM tok JOIN freq USING (tok) CROSS JOIN tot
        GROUP BY doc_id, lang
    ),
    hist AS (
        SELECT lang, s, count(*) AS n FROM scored GROUP BY lang, s
    ),
    cum AS (
        SELECT lang, s,
               sum(n) OVER (PARTITION BY lang ORDER BY s
                            ROWS UNBOUNDED PRECEDING) AS cn,
               sum(n) OVER (PARTITION BY lang) AS n_tot
        FROM hist
    ),
    cuts AS (
        SELECT lang,
               min(s) FILTER (WHERE 3 * cn >= n_tot) AS c1,
               min(s) FILTER (WHERE 3 * cn >= 2 * n_tot) AS c2
        FROM cum GROUP BY lang
    )
    SELECT doc_id, lang, s AS mean_surprisal,
           CASE WHEN s <= c1 THEN 'head' WHEN s <= c2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM scored JOIN cuts USING (lang)
    """.replace("{words}", _SQL_WORDS),
    "CCNet-style head/middle/tail quality buckets per language by "
    "unigram mean surprisal: exact integer-arithmetic tercile cutoffs "
    "over the score histogram, ties share a bucket",
    tags=("text", "quality", "training"),
)
def text_ccnet_surprisal_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: the per-doc score is the surprisal pipeline above
    (broadcast term frequencies, one per-doc shuffle); the tercile
    cutoffs come from the (lang, score) HISTOGRAM — windows run over
    that tiny table, never over the docs (a per-lang ntile() window on
    the corpus would put each language's whole slice in ONE task; the
    histogram form is the distributed-quantile answer, exact because
    scores are 4-dp-rounded)."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", "lang", T.words(F.col("text")).alias("w"))
        .filter(F.size("w") > 0)
        .select("doc_id", "lang", F.explode("w").alias("tok"))
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = freq.agg(F.sum("c").cast("bigint").alias("t"))
    surprisal = -F.log(F.col("c").cast("double") / F.col("t").cast("double"))
    scored = (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(dround(F.avg(surprisal), 4).alias("s"))
        # referenced TWICE below (histogram → cutoffs, and the final
        # assignment join); truncate lineage so the scoring pipeline —
        # including its one single-partition totals exchange — is
        # computed once, not re-planned per reference (column pruning
        # differs between the two uses, which defeats exchange reuse).
        # Same reuse pattern as the iterative frames in operators/graph.
        .localCheckpoint(eager=False)
    )
    hist = scored.groupBy("lang", "s").agg(F.count(F.lit(1)).alias("n"))
    w_cum = Window.partitionBy("lang").orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "s",
        F.sum("n").over(w_cum).alias("cn"),
        F.sum("n").over(w_tot).alias("n_tot"),
    )
    cuts = cum.groupBy("lang").agg(
        F.min(F.when(3 * F.col("cn") >= F.col("n_tot"), F.col("s"))).alias("c1"),
        F.min(F.when(3 * F.col("cn") >= 2 * F.col("n_tot"), F.col("s"))).alias("c2"),
    )
    return scored.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        F.col("s").alias("mean_surprisal"),
        F.when(F.col("s") <= F.col("c1"), "head")
        .when(F.col("s") <= F.col("c2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# positional proximity search (NEAR operator)
# ---------------------------------------------------------------------------


@register(
    "text_proximity_search",
    """
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    t AS (
        SELECT doc_id, u.i AS pos, w[u.i] AS word
        FROM d, UNNEST(generate_series(1, len(d.w))) u(i)
    ),
    cnt AS (SELECT word, count(*) AS c FROM t GROUP BY word),
    top2 AS (
        SELECT word, row_number() OVER (ORDER BY c DESC, word) AS rn
        FROM cnt QUALIFY rn <= 2
    ),
    p1 AS (SELECT doc_id, pos FROM t
           WHERE word = (SELECT word FROM top2 WHERE rn = 1)),
    p2 AS (SELECT doc_id, pos FROM t
           WHERE word = (SELECT word FROM top2 WHERE rn = 2))
    SELECT p1.doc_id,
           (SELECT word FROM top2 WHERE rn = 1) AS term1,
           (SELECT word FROM top2 WHERE rn = 2) AS term2,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p1 JOIN p2
      ON p1.doc_id = p2.doc_id AND p2.pos - p1.pos BETWEEN 1 AND 3
    GROUP BY p1.doc_id
    """,
    "positional proximity search (the NEAR operator of a full-text "
    "index): for the two most frequent corpus terms, count per doc the "
    "ordered position pairs where term2 follows term1 within 3 words",
    tags=("text", "search"),
)
def text_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity (NEAR/k) matching, the positional-postings query BM25
    doesn't cover. The query terms ride as plan literals after a
    bounded 2-row TakeOrdered, so matching is MAP-ONLY: per doc,
    1-based position lists of each term come from an indexed
    transform() over the word array, and the window test is a nested
    filter over the two lists (per-doc lists are doc-length-bounded,
    so the nested scan is O(occ1*occ2) WITHIN a doc, never across
    docs). At 100 TB there is no shuffle at all — contrast with the
    inverted-index join shape (positions table self-joined on doc_id
    with a band predicate), which this plan collapses because both
    postings lists live in the same row. The oracle states exactly
    that join shape over an UNNEST positions table."""
    docs = table(spark, sf_dir, "documents")
    words_flat = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(2)
        .collect()  # bounded: the 2 query terms
    )
    if len(words_flat) < 2:
        # degenerate corpus (< 2 distinct non-empty words): no term
        # pair exists to search — empty result with the declared
        # schema, matching the oracle's NULL scalar subqueries (which
        # then match no document) instead of an IndexError
        return spark.createDataFrame(
            [], "doc_id bigint, term1 string, term2 string, n_pairs bigint"
        )
    t1, t2 = words_flat[0]["word"], words_flat[1]["word"]

    warr = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != ""
    )

    def positions(term: str):
        return F.filter(
            F.transform(
                warr, lambda w, i: F.when(w == F.lit(term), i + 1)
            ),
            lambda x: x.isNotNull(),
        )

    with_pos = docs.select(
        "doc_id", positions(t1).alias("_p1"), positions(t2).alias("_p2")
    )
    pairs = F.size(
        F.flatten(
            F.transform(
                F.col("_p1"),
                lambda x: F.filter(
                    F.col("_p2"), lambda y: (y > x) & (y <= x + F.lit(3))
                ),
            )
        )
    )
    return (
        with_pos.select(
            "doc_id",
            F.lit(t1).alias("term1"),
            F.lit(t2).alias("term2"),
            pairs.cast("bigint").alias("n_pairs"),
        )
        .filter(F.col("n_pairs") > 0)
    )


# ---------------------------------------------------------------------------
# interpolated bigram language model surprisal
# ---------------------------------------------------------------------------


@register(
    "text_bigram_surprisal",
    # Jelinek-Mercer interpolated bigram LM, lambda = 0.5 (exact dyadic):
    # p(w2|w1) = 0.5*c2(w1,w2)/cctx(w1) + 0.5*c1(w2)/t, where the
    # context count cctx is derived FROM the bigram table (so the model
    # is self-consistent at doc boundaries). The KenLM-perplexity
    # filter one order up from text_unigram_surprisal.
    f"""
    WITH d AS (
        SELECT doc_id, {{words}} AS w FROM documents
    ),
    bg AS (
        SELECT doc_id, w[u.i] AS w1, w[u.i + 1] AS w2
        FROM d, UNNEST(generate_series(1, len(d.w) - 1)) AS u(i)
        WHERE len(d.w) > 1
    ),
    tok AS (
        SELECT unnest(w) AS tok FROM d WHERE len(w) > 0
    ),
    c1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c1),
    c2 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2
    ),
    cctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cc FROM c2 GROUP BY w1)
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round((avg(-ln(
               0.5 * (CAST(c2.c AS DOUBLE) / CAST(cctx.cc AS DOUBLE))
               + 0.5 * (CAST(c1.c AS DOUBLE) / CAST(tot.t AS DOUBLE))
           ))) * 10000.0) / 10000.0 + 0.0 AS mean_surprisal
    FROM bg
    JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
    JOIN cctx ON bg.w1 = cctx.w1
    JOIN c1 ON bg.w2 = c1.tok
    CROSS JOIN tot
    GROUP BY bg.doc_id
    """.replace("{words}", _SQL_WORDS),
    "interpolated bigram-LM mean surprisal per doc (Jelinek-Mercer "
    "lambda=0.5 over corpus bigram/unigram counts; the next-order "
    "perplexity quality filter above text_unigram_surprisal)",
    tags=("text", "quality", "training"),
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: bigram extraction is a map-only arrays_zip over the
    word array (no positions join); the bigram count dim joins back as
    a SHUFFLE equi-join keyed (w1, w2) — bigram types grow superlinearly
    in vocabulary, so unlike the unigram dim it must never broadcast
    (the text_tfidf_top_terms driver-OOM argument, one order up); the
    unigram dim and the scalar total stay broadcast. lambda = 0.5 is
    exact-dyadic so the interpolation is two IEEE-exact halvings, and
    ln parity follows the unigram gate's established libm agreement."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.words(F.col("text")).alias("w")
    )
    bg = (
        docs.filter(F.size("w") > 1)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("w"), 1, F.size("w") - 1).alias("w1"),
                    F.slice(F.col("w"), 2, F.size("w") - 1).alias("w2"),
                )
            ).alias("_b"),
        )
        .select("doc_id", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    )
    toks = docs.filter(F.size("w") > 0).select(F.explode("w").alias("tok"))
    c1 = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c1c"))
    tot = c1.agg(F.sum("c1c").cast("bigint").alias("t"))
    c2 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2c")
    )
    cctx = c2.groupBy("w1").agg(F.sum("c2c").cast("bigint").alias("cc"))
    p = (
        F.lit(0.5) * (F.col("c2c").cast("double") / F.col("cc").cast("double"))
        + F.lit(0.5) * (F.col("c1c").cast("double") / F.col("t").cast("double"))
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(cctx, "w1")
        .join(F.broadcast(c1), bg.w2 == c1.tok)
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            dround(F.avg(-F.log(p)), 4).alias("mean_surprisal"),
        )
    )


# ---------------------------------------------------------------------------
# interpolated Kneser-Ney trigram language model (trained on the corpus)
# ---------------------------------------------------------------------------


@register(
    "ml_kn_trigram_lm",
    # Interpolated Kneser-Ney (Chen & Goodman 1999) with absolute
    # discount D=0.75, all orders derived self-consistently from the
    # TRIGRAM type/count tables (the KenLM construction):
    #   p_cont(w3)   = N1+(.w3) / N1+(..)
    #   p2(w3|w2)    = max(N1+(.w2w3)-D,0)/N1+(.w2.)
    #                  + (D*N1+(w2.)/N1+(.w2.)) * p_cont(w3)
    #   p3(w3|w1w2)  = max(c3-D,0)/c(w1w2)
    #                  + (D*N1+(w1w2.)/c(w1w2)) * p2(w3|w2)
    # Every count is an exact integer; the probability is ONE fixed
    # expression tree of IEEE ops written identically on both sides,
    # rounded to 9 dp. Top-20 trigrams by count (w1,w2,w3 ASC ties).
    f"""
    WITH d AS (SELECT doc_id, {{words}} AS w FROM documents),
    tri AS (
        SELECT w[u.i] AS w1, w[u.i + 1] AS w2, w[u.i + 2] AS w3
        FROM d, UNNEST(generate_series(1, len(d.w) - 2)) AS u(i)
        WHERE len(d.w) > 2
    ),
    c3 AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c
           FROM tri GROUP BY w1, w2, w3),
    ctx AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS cc,
                   CAST(count(*) AS BIGINT) AS nt
            FROM c3 GROUP BY w1, w2),
    nm AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS n1mid
           FROM c3 GROUP BY w2, w3),
    nc2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1ctx
            FROM c3 GROUP BY w2),
    ns AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1start
           FROM nm GROUP BY w2),
    nr AS (SELECT w3, CAST(count(*) AS BIGINT) AS n1right
           FROM nm GROUP BY w3),
    nbb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM nm),
    top AS (
        SELECT w1, w2, w3, c FROM c3
        ORDER BY c DESC, w1, w2, w3 LIMIT 20
    )
    SELECT top.w1, top.w2, top.w3, top.c AS c3,
           round((CAST(nr.n1right AS DOUBLE) / nbb.nb)
                 * 1000000000.0) / 1000000000.0 + 0.0 AS p_cont,
           round((greatest(nm.n1mid - 0.75, 0.0) / nc2.n1ctx
                  + (0.75 * ns.n1start / nc2.n1ctx)
                    * (CAST(nr.n1right AS DOUBLE) / nbb.nb))
                 * 1000000000.0) / 1000000000.0 + 0.0 AS p_bi,
           round(((top.c - 0.75) / ctx.cc
                  + (0.75 * ctx.nt / ctx.cc)
                    * (greatest(nm.n1mid - 0.75, 0.0) / nc2.n1ctx
                       + (0.75 * ns.n1start / nc2.n1ctx)
                         * (CAST(nr.n1right AS DOUBLE) / nbb.nb)))
                 * 1000000000.0) / 1000000000.0 + 0.0 AS p_kn
    FROM top
    JOIN ctx ON ctx.w1 = top.w1 AND ctx.w2 = top.w2
    JOIN nm  ON nm.w2 = top.w2 AND nm.w3 = top.w3
    JOIN nc2 ON nc2.w2 = top.w2
    JOIN ns  ON ns.w2 = top.w2
    JOIN nr  ON nr.w3 = top.w3
    CROSS JOIN nbb
    """.replace("{words}", _SQL_WORDS),
    "interpolated Kneser-Ney trigram LM trained on the corpus "
    "(D=0.75, continuation counts from the trigram type table): "
    "top-20 trigrams with continuation/bigram/trigram KN "
    "probabilities",
    tags=("ml", "text", "training"),
)
def ml_kn_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram LM TRAINING at corpus scale — the estimator behind the
    KenLM-style perplexity filters (text_unigram_surprisal /
    text_bigram_surprisal consume such a model; this gate builds the
    state-of-the-art smoothing). Everything reduces over the trigram
    count table: context totals and type counts fold into ONE
    (w1,w2)-keyed aggregate, continuation tables are successive
    type-count aggregates of it, and the bigram-type universe N1+(..)
    is the query's one global scalar. The top-20 selection happens
    BEFORE the dim joins (TakeOrderedAndProject, then broadcast-sized
    probes) — the serve-only-what-you-rank shape that holds at 100 TB,
    where the count tables shard by n-gram key and never collect.
    All counts are exact integers; each probability is a single fixed
    IEEE expression tree shared with the oracle, 9-dp rounded."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.words(F.col("text")).alias("w")
    )
    tri = (
        docs.filter(F.size("w") > 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("w"), 1, F.size("w") - 2).alias("w1"),
                    F.slice(F.col("w"), 2, F.size("w") - 2).alias("w2"),
                    F.slice(F.col("w"), 3, F.size("w") - 2).alias("w3"),
                )
            ).alias("_t")
        )
        .select(
            F.col("_t.w1").alias("w1"),
            F.col("_t.w2").alias("w2"),
            F.col("_t.w3").alias("w3"),
        )
    )
    c3 = tri.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ctx = c3.groupBy("w1", "w2").agg(
        F.sum("c").cast("bigint").alias("cc"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    nm = c3.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1mid")
    )
    nc2 = c3.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1ctx"))
    ns = nm.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1start"))
    nr = nm.groupBy("w3").agg(F.count(F.lit(1)).cast("bigint").alias("n1right"))
    nbb = nm.agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    top = c3.orderBy(
        F.desc("c"), F.asc("w1"), F.asc("w2"), F.asc("w3")
    ).limit(20)
    p_cont = F.col("n1right").cast("double") / F.col("nb")
    p_bi = F.greatest(F.col("n1mid") - 0.75, F.lit(0.0)) / F.col("n1ctx") + (
        0.75 * F.col("n1start") / F.col("n1ctx")
    ) * p_cont
    p_kn = (F.col("c") - 0.75) / F.col("cc") + (
        0.75 * F.col("nt") / F.col("cc")
    ) * p_bi
    return (
        top.join(ctx, ["w1", "w2"])
        .join(nm, ["w2", "w3"])
        .join(nc2, "w2")
        .join(ns, "w2")
        .join(nr, "w3")
        .crossJoin(F.broadcast(nbb))
        .select(
            "w1",
            "w2",
            "w3",
            F.col("c").alias("c3"),
            dround(p_cont, 9).alias("p_cont"),
            dround(p_bi, 9).alias("p_bi"),
            dround(p_kn, 9).alias("p_kn"),
        )
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of the text and dense channels
# ---------------------------------------------------------------------------

#: RRF constant (Cormack et al. 2009, "Reciprocal Rank Fusion
#: outperforms Condorcet and individual rank learning methods" — k=60
#: is the paper's constant and the default in every major serving
#: stack). Per-query fused score = Σ_channels 1/(k + rank).
RRF_K = 60
#: one single-term text query per retrieval query, paired with the
#: anchor embedding vec_id == query id (documents and embeddings share
#: the 0..N-1 id space in the testdata).
RRF_QUERY_TERMS: tuple[str, ...] = ("table", "scan", "window")


def _sql_rrf_oracle() -> str:
    nq = len(RRF_QUERY_TERMS)
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(w, t -> t = '{term}')) AS BIGINT) AS tf{i}"
        for i, term in enumerate(RRF_QUERY_TERMS)
    )
    df_cols = ",\n               ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(nq)
    )
    tf_case = " ".join(f"WHEN {i} THEN tf{i}" for i in range(nq))
    df_case = " ".join(f"WHEN {i} THEN df{i}" for i in range(nq))
    dvec = "list_transform({col}, x -> CAST(x AS DOUBLE))"
    cos = (
        "round((list_dot_product(qv.v, cv.v) / "
        "(sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v)))) "
        "* 1000000.0) / 1000000.0 + 0.0"
    )
    return f"""
    WITH feat AS (
        SELECT doc_id, CAST(len(w) AS INT) AS dl,
               {tf_cols}
        FROM (SELECT doc_id, {_SQL_WORDS} AS w FROM documents)
        WHERE len(w) > 0
    ),
    qids AS (SELECT unnest(range({nq})) AS qid),
    tlong AS (
        SELECT CAST(q.qid AS BIGINT) AS qid, f.doc_id, f.dl,
               CASE q.qid {tf_case} END AS tf
        FROM feat f CROSS JOIN qids q
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl,
               {df_cols}
        FROM feat
    ),
    slong AS (
        SELECT CAST(q.qid AS BIGINT) AS qid, s.n_docs, s.avgdl,
               CASE q.qid {df_case} END AS dfq
        FROM stats s CROSS JOIN qids q
    ),
    tscored AS (
        SELECT t.qid, t.doc_id,
               round((ln(1.0 + (s.n_docs - s.dfq + 0.5) / (s.dfq + 0.5))
                      * (t.tf * {BM25_K1 + 1.0})
                      / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * t.dl / s.avgdl)))
                     * 10000.0) / 10000.0 + 0.0 AS s
        FROM tlong t JOIN slong s ON t.qid = s.qid
        WHERE t.tf > 0
    ),
    trank AS (
        SELECT qid, doc_id, rank_text FROM (
            SELECT qid, doc_id,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, doc_id)
                        AS BIGINT) AS rank_text
            FROM tscored
        ) WHERE rank_text <= 20
    ),
    planes AS (
        SELECT vec_id AS pid, {dvec.format(col="embedding")} AS pv
        FROM embeddings WHERE vec_id < 8
    ),
    bucketed AS (
        SELECT e.vec_id, p.pid // 4 AS band,
               CAST(sum(CASE WHEN list_dot_product({dvec.format(col="e.embedding")}, p.pv) > 0
                             THEN (CAST(1 AS BIGINT) << (p.pid % 4)) ELSE 0 END) AS BIGINT) AS bkt
        FROM embeddings e, planes p
        GROUP BY e.vec_id, p.pid // 4
    ),
    cand AS (
        SELECT DISTINCT q.vec_id AS qid, c.vec_id AS doc_id
        FROM bucketed q JOIN bucketed c
          ON q.band = c.band AND q.bkt = c.bkt AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {nq}
    ),
    vecs AS (SELECT vec_id, {dvec.format(col="embedding")} AS v FROM embeddings),
    dscored AS (
        SELECT cand.qid, cand.doc_id, {cos} AS cos
        FROM cand
        JOIN vecs qv ON qv.vec_id = cand.qid
        JOIN vecs cv ON cv.vec_id = cand.doc_id
    ),
    drank AS (
        SELECT qid, doc_id, rank_dense FROM (
            SELECT qid, doc_id,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id)
                        AS BIGINT) AS rank_dense
            FROM dscored
        ) WHERE rank_dense <= 20
    ),
    fused AS (
        SELECT COALESCE(t.qid, d.qid) AS qid,
               COALESCE(t.doc_id, d.doc_id) AS doc_id,
               CAST(COALESCE(t.rank_text, 0) AS BIGINT) AS rank_text,
               CAST(COALESCE(d.rank_dense, 0) AS BIGINT) AS rank_dense,
               round((COALESCE(1.0 / ({RRF_K} + t.rank_text), 0.0)
                      + COALESCE(1.0 / ({RRF_K} + d.rank_dense), 0.0))
                     * 1000000000.0) / 1000000000.0 + 0.0 AS rrf_score
        FROM trank t FULL JOIN drank d
          ON t.qid = d.qid AND t.doc_id = d.doc_id
    )
    SELECT qid, doc_id, rank_text, rank_dense, rrf_score FROM (
        SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf_score DESC, doc_id) AS rn
        FROM fused
    ) WHERE rn <= 10
    """


@register(
    "search_rrf_hybrid_topk",
    _sql_rrf_oracle(),
    "hybrid retrieval serving shape: per-query reciprocal-rank fusion "
    "(k=60) of a single-term BM25 text channel and a banded-LSH dense "
    "channel; all rank arithmetic integer, fused score a fixed-order "
    "two-term sum of 1/(k+rank) so the oracle is exact",
    tags=("text", "search", "similarity", "training"),
)
def search_rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the engine's two retrieval channels —
    the standard RAG serving composition (RRF constant 60, per-query
    top-10, rank 0 = "not surfaced by this channel").

    100 TB shape: each channel is itself scale-clean (BM25: one scalar
    corpus-stats aggregate broadcast to a map-side scorer + per-query
    top-k window; dense: banded-LSH bucket EQUI-join with broadcast
    anchors — never all-pairs), and the fusion is a (qid, doc_id)
    equi-join of two already-top-k-truncated candidate lists: ≤ 20
    rows per query per channel regardless of corpus size, so the
    fusion cost is O(queries · k), independent of the 100 TB corpus.
    """
    from ..operators.similarity import cosine, dot

    nq = len(RRF_QUERY_TERMS)
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", T.words(F.col("text")).alias("w"))
        .withColumn("dl", F.size("w"))
        .filter(F.col("dl") > 0)
    )
    feat = docs.select(
        "doc_id",
        "dl",
        *[
            F.size(F.filter(F.col("w"), _term_eq(term)))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, term in enumerate(RRF_QUERY_TERMS)
        ],
    )
    stack_tf = ", ".join(f"{i}L, tf{i}" for i in range(nq))
    tlong = feat.select(
        "doc_id", "dl", F.expr(f"stack({nq}, {stack_tf}) AS (qid, tf)")
    )
    stats = feat.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(nq)
        ],
    )
    stack_df = ", ".join(f"{i}L, df{i}" for i in range(nq))
    slong = stats.select(
        "n_docs", "avgdl", F.expr(f"stack({nq}, {stack_df}) AS (qid, dfq)")
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("dfq") + 0.5) / (F.col("dfq") + 0.5)
    )
    norm = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    tscored = (
        tlong.filter(F.col("tf") > 0)
        .join(F.broadcast(slong), on="qid")
        .select("qid", "doc_id", dround(idf * (F.col("tf") * (BM25_K1 + 1.0)) / norm, 4).alias("s"))
    )
    wq = Window.partitionBy("qid")
    trank = (
        tscored.withColumn(
            "rank_text",
            F.row_number().over(wq.orderBy(F.desc("s"), F.asc("doc_id"))).cast("bigint"),
        )
        .filter(F.col("rank_text") <= 20)
        .select("qid", "doc_id", "rank_text")
    )

    emb = table(spark, sf_dir, "embeddings")
    planes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pv")
    )
    bucketed = (
        emb.crossJoin(F.broadcast(planes))
        .withColumn("band", F.expr("pid div 4"))
        .groupBy("vec_id", "band")
        .agg(
            F.sum(
                F.when(
                    dot(F.col("embedding"), F.col("pv")) > 0,
                    F.expr("shiftleft(cast(1 as bigint), pid % 4)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("bkt")
        )
    )
    anchors = bucketed.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"), F.col("band").alias("_ab"), F.col("bkt").alias("_abkt")
    )
    cand = (
        bucketed.join(
            F.broadcast(anchors),
            (F.col("band") == F.col("_ab"))
            & (F.col("bkt") == F.col("_abkt"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", F.col("vec_id").alias("doc_id"))
        .distinct()
    )
    vecs = emb.select("vec_id", F.col("embedding").alias("v"))
    dscored = (
        cand.join(
            F.broadcast(vecs.withColumnRenamed("vec_id", "qid").withColumnRenamed("v", "_qv")).filter(
                F.col("qid") < nq
            ),
            on="qid",
        )
        .join(vecs.withColumnRenamed("vec_id", "doc_id"), on="doc_id")
        .select("qid", "doc_id", dround(cosine(F.col("_qv"), F.col("v")), 6).alias("cos"))
    )
    drank = (
        dscored.withColumn(
            "rank_dense",
            F.row_number().over(wq.orderBy(F.desc("cos"), F.asc("doc_id"))).cast("bigint"),
        )
        .filter(F.col("rank_dense") <= 20)
        .select("qid", "doc_id", "rank_dense")
    )

    fused = (
        trank.join(drank, on=["qid", "doc_id"], how="full")
        .select(
            F.col("qid").cast("bigint").alias("qid"),
            "doc_id",
            F.coalesce("rank_text", F.lit(0).cast("bigint")).alias("rank_text"),
            F.coalesce("rank_dense", F.lit(0).cast("bigint")).alias("rank_dense"),
            dround(
                F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_text")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_dense")), F.lit(0.0)),
                9,
            ).alias("rrf_score"),
        )
    )
    return (
        fused.withColumn(
            "rn", F.row_number().over(wq.orderBy(F.desc("rrf_score"), F.asc("doc_id")))
        )
        .filter(F.col("rn") <= 10)
        .select("qid", "doc_id", "rank_text", "rank_dense", "rrf_score")
    )


# ---------------------------------------------------------------------------
# pseudo-relevance-feedback query expansion (RM3-lite)
# ---------------------------------------------------------------------------

PRF_FEEDBACK_DOCS = 10
PRF_EXPANSION_TERMS = 5
#: original-term weight numerator / expansion-term weight numerator over
#: a common denominator of 2 (i.e. weights 1.0 and 0.5 — exact dyadic)
PRF_W_ORIG, PRF_W_EXP = 2, 1


def _sql_prf_oracle() -> str:
    from .textanalysis import _SQL_STOP_LIST

    orig = ", ".join(f"'{t}'" for t in BM25_TERMS)
    k1_1 = BM25_K1 + 1.0
    return f"""
    WITH docs AS (
        SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ),
    feat AS (
        SELECT doc_id, CAST(len(w) AS INT) AS dl, w
        FROM docs WHERE len(w) > 0
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM feat
    ),
    tok AS (
        SELECT doc_id, dl, unnest(w) AS term FROM feat
    ),
    tf AS (
        SELECT doc_id, CAST(any_value(dl) AS INT) AS dl, term,
               CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    -- integer-scaled per-(doc, term) BM25 partial: round(score*1e4)
    s4 AS (
        SELECT tf.doc_id, tf.term,
               CAST(round((ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                           * (tf.tf * {k1_1})
                           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl)))
                          * 10000.0) AS BIGINT) AS s4
        FROM tf JOIN df USING (term) CROSS JOIN stats s
    ),
    base AS (
        SELECT doc_id, CAST(sum(s4) AS BIGINT) AS base4
        FROM s4 WHERE term IN ({orig}) GROUP BY doc_id
    ),
    fb AS (
        SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (ORDER BY base4 DESC, doc_id) AS rn
            FROM base
        ) WHERE rn <= {PRF_FEEDBACK_DOCS}
    ),
    exp_terms AS (
        SELECT term FROM (
            SELECT t.term, CAST(sum(t.tf) AS BIGINT) AS fb_tf,
                   row_number() OVER (ORDER BY sum(t.tf) DESC, t.term) AS rn
            FROM tf t JOIN fb USING (doc_id)
            WHERE t.term NOT IN ({orig})
              AND NOT list_contains({_SQL_STOP_LIST}, t.term)
            GROUP BY t.term
        ) WHERE rn <= {PRF_EXPANSION_TERMS}
    ),
    qterms AS (
        SELECT term, {PRF_W_ORIG} AS wnum FROM (VALUES ({orig.replace("', '", "'), ('")})) v(term)
        UNION ALL
        SELECT term, {PRF_W_EXP} AS wnum FROM exp_terms
    ),
    fused AS (
        SELECT s4.doc_id, CAST(sum(q.wnum * s4.s4) AS BIGINT) AS total4
        FROM s4 JOIN qterms q USING (term)
        GROUP BY s4.doc_id
    )
    SELECT doc_id, total4,
           round((CAST(total4 AS DOUBLE) / 20000.0) * 10000.0) / 10000.0 + 0.0 AS score
    FROM (
        SELECT *, row_number() OVER (ORDER BY total4 DESC, doc_id) AS rn
        FROM fused
    ) WHERE rn <= 20
    """


@register(
    "search_prf_expansion_topk",
    _sql_prf_oracle(),
    "pseudo-relevance-feedback query expansion (RM3-lite): BM25 top-10 "
    "feedback docs -> top-5 expansion terms by feedback tf (stoplist/"
    "original excluded) -> rescore with dyadic weights 1.0/0.5; "
    "per-term scores integer-scaled (x1e4) before summation so the "
    "fused score is an exact integer cross-engine",
    tags=("text", "search", "training"),
)
def search_prf_expansion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass retrieval with feedback expansion, all shuffles keyed:
    one explode builds the (doc, term, tf) table (doc-keyed agg), df is
    a term-keyed agg, the corpus stats are ONE broadcast scalar row,
    and both ranking passes reuse the SAME integer-scaled per-(doc,
    term) partial-score table — the feedback pass filters it to the
    original terms, the rescore pass joins it against the 8-row
    broadcast term-weight table. The only data-dependent driver state
    is nothing at all: expansion terms stay a (tiny) DataFrame.

    Float discipline: each per-term BM25 partial is rounded and scaled
    to an INTEGER (x 1e4) before any summation, so cross-engine
    aggregation order cannot perturb the fused score (sum of BIGINTs),
    and ranking ties break on doc_id."""
    from ..operators.text import STOPWORDS

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", T.words(F.col("text")).alias("w"))
        .withColumn("dl", F.size("w"))
        .filter(F.col("dl") > 0)
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", "dl", F.explode("w").alias("term"))
        .groupBy("doc_id", "term")
        .agg(
            F.any_value("dl").alias("dl"),
            F.count(F.lit(1)).cast("bigint").alias("tf"),
        )
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    s4 = (
        tf.join(df_t, on="term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.round(idf * (F.col("tf") * (BM25_K1 + 1.0)) / denom * 10000.0)
            .cast("bigint")
            .alias("s4"),
        )
    ).persist()  # reused by the feedback pass AND the rescore pass
    base = (
        s4.filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id")
        .agg(F.sum("s4").cast("bigint").alias("base4"))
    )
    # Global top-k values that FEED later stages are taken as bounded
    # driver collects (the kmeans <= k-rows contract): a lazy mid-plan
    # orderBy+limit would compile to a global-sort Exchange
    # SinglePartition carrying one row PER DOC, while .limit().collect()
    # runs as a TakeOrdered ACTION (per-partition partial top-k, driver
    # merge of k rows) and re-enters the plan as broadcast literals.
    fb_ids = [
        r["doc_id"]
        for r in base.orderBy(F.desc("base4"), F.asc("doc_id"))
        .limit(PRF_FEEDBACK_DOCS)
        .collect()  # bounded: 10 feedback doc ids
    ]
    exp_rows = (
        tf.filter(F.col("doc_id").isin(fb_ids))
        .filter(~F.col("term").isin(*BM25_TERMS) & ~F.col("term").isin(*STOPWORDS))
        .groupBy("term")
        .agg(F.sum("tf").cast("bigint").alias("fb_tf"))
        .orderBy(F.desc("fb_tf"), F.asc("term"))
        .limit(PRF_EXPANSION_TERMS)
        .collect()  # bounded: 5 expansion terms
    )
    qterms = spark.createDataFrame(
        [(t, PRF_W_ORIG) for t in BM25_TERMS]
        + [(r["term"], PRF_W_EXP) for r in exp_rows],
        "term string, wnum int",
    )
    fused = (
        s4.join(F.broadcast(qterms), on="term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("wnum") * F.col("s4")).cast("bigint").alias("total4"))
    )
    return (
        fused.orderBy(F.desc("total4"), F.asc("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            "total4",
            dround(F.col("total4").cast("double") / 20000.0, 4).alias("score"),
        )
    )
