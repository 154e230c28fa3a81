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
           round((avg(n_tokens)) * 10000.0) / 10000.0 + 0.0       AS avg_tokens
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
                 ) / 3.0) * 10000.0) / 10000.0 + 0.0 AS quality,
           round((stop_ratio) * 10000.0) / 10000.0 + 0.0 AS stop_ratio,
           round((atl) * 10000.0) / 10000.0 + 0.0        AS avg_token_len
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


@register(
    "text_redact_pii",
    # Deterministic PII is appended in-engine (same concat on both
    # sides) so the redaction regexes have real matches to scrub, then
    # both engines must produce the identical redacted text and match
    # counts. Patterns live in operators/text.py::PII_PATTERNS and use
    # only the Java-regex ∩ RE2 subset. DuckDB regexp_replace needs the
    # 'g' flag to match Spark's replace-all semantics.
    """
    WITH pii AS (
        SELECT doc_id,
               text || ' reach me at user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or https://ex.org/d/' || CAST(doc_id AS VARCHAR)
                    || ' ref ' || CAST(1000000 + doc_id * 7919 AS VARCHAR) AS t
        FROM documents
    )
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
                   'https?://\\S+', '<URL>', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '[0-9]{7,}', '<NUM>', 'g')) AS redacted_md5,
           CAST(len(regexp_extract_all(t, 'https?://\\S+')) AS INT) AS n_url,
           CAST(len(regexp_extract_all(regexp_replace(t, 'https?://\\S+', '<URL>', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(regexp_replace(regexp_replace(t,
                   'https?://\\S+', '<URL>', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '[0-9]{7,}')) AS INT) AS n_number
    FROM pii
    """,
    "PII scrubbing for training data: URL/email/long-number redaction "
    "with per-category match counts (pure regexp expressions, codegen)",
    tags=("text", "pii", "training"),
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach me at user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or https://ex.org/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" ref "),
            (F.lit(1000000) + F.col("doc_id") * 7919).cast("string"),
        ).alias("t"),
    )
    counts = T.pii_counts(F.col("t"))
    return docs.select(
        "doc_id",
        F.md5(T.redact_pii(F.col("t")).cast("binary")).alias("redacted_md5"),
        counts["url"].cast("int").alias("n_url"),
        counts["email"].cast("int").alias("n_email"),
        counts["number"].cast("int").alias("n_number"),
    )


@register(
    "text_decontaminate_flags",
    # Benchmark decontamination: documents sharing any 3-word shingle
    # with the "benchmark" seed set (doc_id < 5) are contamination
    # candidates. Candidate generation is a distinct-shingle equi-join
    # against the (broadcastable) seed shingle set — at 100 TB the seed
    # side is the benchmark corpus, small by construction.
    f"""
    WITH norm AS (
        SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ),
    shingle AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
            FROM norm
        )
    ),
    blocklist AS (
        SELECT DISTINCT sh FROM shingle WHERE doc_id < 5
    )
    SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits, TRUE AS contaminated
    FROM shingle s JOIN blocklist b USING (sh)
    WHERE s.doc_id >= 5
    GROUP BY s.doc_id
    """,
    "training-data decontamination: flag docs overlapping the benchmark "
    "seed set by ≥1 exact 3-gram (broadcast seed-shingle join)",
    tags=("text", "dedup", "training"),
)
def text_decontaminate_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    shingle = docs.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(T.word_shingles(F.col("text"), 3))).alias("sh"),
    )
    blocklist = shingle.filter(F.col("doc_id") < 5).select("sh").distinct()
    return (
        shingle.filter(F.col("doc_id") >= 5)
        .join(F.broadcast(blocklist), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .withColumn("contaminated", F.lit(True))
    )


@register(
    "text_bpe_token_estimate",
    # BPE-style subword-token ESTIMATE without a tokenizer model: count
    # lexer pieces with a GPT-2-like pretokenizer regex (letter runs,
    # digit runs, single punctuation) and apply the ~4-chars-per-token
    # length correction for long words (a BPE merges long words into
    # several subwords). Pattern uses the Java-regex ∩ RE2 subset.
    """
    WITH pieces AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS p
        FROM documents
    )
    SELECT doc_id,
           CAST(len(p) AS INT) AS n_pieces,
           CAST(len(p) + coalesce(list_sum(list_transform(p,
                    x -> greatest(CAST(ceil(length(x) / 4.0) AS BIGINT) - 1, 0))), 0)
                AS INT) AS est_bpe_tokens
    FROM pieces
    """,
    "BPE-ish token-count estimate: GPT-2-style pretokenizer regex + "
    "length correction (pure regexp + array expressions, codegen)",
    tags=("text", "tokens", "training"),
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    pieces = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    extra = F.aggregate(
        F.transform(
            pieces,
            lambda x: F.greatest(F.ceil(F.length(x) / 4.0).cast("long") - 1, F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(pieces).alias("n_pieces"),
        (F.size(pieces) + extra).cast("int").alias("est_bpe_tokens"),
    )


@register(
    "text_rolling_hash_fingerprint",
    # Rabin-Karp rolling-hash fingerprint: min polynomial window hash
    # (B=131, M=1e9+7, 16-char windows; winnowing). The ORACLE states
    # the O(k*L) direct-sum definition with powers precomputed mod M
    # (raw B^15 ~ 6e31 would overflow BIGINT); the ENGINE computes the
    # identical values with the true O(L) rolling recurrence
    # (operators/text.py::rolling_min_hash). Empty docs hash to NULL on
    # both sides; short docs fall back to a positional weighted sum.
    """
    WITH norm AS (
        SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS s
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               CASE WHEN length(s) >= 16 THEN
                 list_min(list_transform(range(1, length(s) - 14),
                   i -> (CAST(ascii(substr(s, CAST(i + 0 AS INT), 1)) AS BIGINT) * 493200928 + CAST(ascii(substr(s, CAST(i + 1 AS INT), 1)) AS BIGINT) * 507581690 + CAST(ascii(substr(s, CAST(i + 2 AS INT), 1)) AS BIGINT) * 736699102 + CAST(ascii(substr(s, CAST(i + 3 AS INT), 1)) AS BIGINT) * 685012975 + CAST(ascii(substr(s, CAST(i + 4 AS INT), 1)) AS BIGINT) * 989961938 + CAST(ascii(substr(s, CAST(i + 5 AS INT), 1)) AS BIGINT) * 977022617 + CAST(ascii(substr(s, CAST(i + 6 AS INT), 1)) AS BIGINT) * 908221553 + CAST(ascii(substr(s, CAST(i + 7 AS INT), 1)) AS BIGINT) * 861894827 + CAST(ascii(substr(s, CAST(i + 8 AS INT), 1)) AS BIGINT) * 617266377 + CAST(ascii(substr(s, CAST(i + 9 AS INT), 1)) AS BIGINT) * 913108910 + CAST(ascii(substr(s, CAST(i + 10 AS INT), 1)) AS BIGINT) * 579489385 + CAST(ascii(substr(s, CAST(i + 11 AS INT), 1)) AS BIGINT) * 294499921 + CAST(ascii(substr(s, CAST(i + 12 AS INT), 1)) AS BIGINT) * 2248091 + CAST(ascii(substr(s, CAST(i + 13 AS INT), 1)) AS BIGINT) * 17161 + CAST(ascii(substr(s, CAST(i + 14 AS INT), 1)) AS BIGINT) * 131 + CAST(ascii(substr(s, CAST(i + 15 AS INT), 1)) AS BIGINT) * 1) % 1000000007))
               ELSE
                 -- list_sum returns HUGEINT; without the cast the whole CASE
                 -- is typed HUGEINT -> pandas float64 and the driver's
                 -- type-strict value hash diverges from the engine's int64.
                 CAST(list_sum(list_transform(range(1, length(s) + 1),
                          j -> CAST(ascii(substr(s, CAST(j AS INT), 1)) AS BIGINT) * (1 + (j % 7)))) % 1000000007 AS BIGINT)
               END AS fp
        FROM norm
    )
    SELECT fp, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS first_doc
    FROM hashed GROUP BY fp
    """,
    "Rabin-Karp rolling-hash document fingerprint (min 16-char window "
    "hash, winnowing-style) + collision groups",
    tags=("text", "fingerprint", "rollinghash"),
)
def text_rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = T.rolling_min_hash(F.col("text"), k=16, base=131, mod=1_000_000_007)
    # r14: spread (guide §2.5) — the Rabin-Karp rolling hash ran single-
    # task (noop A/B: 2723 → 556 ms); no-op on well-split inputs.
    return (
        table(spark, sf_dir, "documents", spread=True)
        .select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


@register(
    "text_duplicate_ngram_fraction",
    f"""
    WITH norm AS (
        SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 3),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh
        FROM norm WHERE len(w) >= 5
    ),
    dfreq AS (
        SELECT sh, count(DISTINCT doc_id) AS df FROM grams GROUP BY sh
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
           round((CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0 + 0.0 AS dup_frac,
           round((CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0 + 0.0 >= 0.3 AS flagged
    FROM grams g JOIN dfreq USING (sh)
    GROUP BY g.doc_id
    """,
    "per-doc fraction of word 5-gram positions whose 5-gram occurs in "
    ">=2 documents (substring-level duplication signal, Lee et al. 2022)",
    tags=("text", "dedup"),
)
def text_duplicate_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-n-gram coverage, the substring-dedup quality signal.

    Unlike the pair-producing shingle joins (queries/dedup.py), the join
    here is per-occurrence x 1: the document-frequency table has ONE row
    per distinct 5-gram, so a boilerplate shingle in a million docs adds
    a million linear join rows, never df^2 — no df cap needed. Plan is
    explode -> two hash aggregations (df table, per-doc rollup) + one
    equi-join, all map-side combinable; shuffle volume is bounded by
    the gram count, which is bounded by corpus token count.
    """
    # r14: spread (guide §2.5) — single-row-group input; no-op at scale.
    docs = table(spark, sf_dir, "documents", spread=True)
    grams = docs.select(
        "doc_id", F.explode(T.word_shingles(F.col("text"), 5)).alias("sh")
    )
    dfreq = grams.groupBy("sh").agg(F.count_distinct("doc_id").alias("df"))
    n_dup = F.sum((F.col("df") >= 2).cast("int")).cast("bigint")
    frac = dround(n_dup.cast("double") / F.count(F.lit(1)).cast("double"), 4)
    return (
        grams.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            n_dup.alias("n_dup_grams"),
            frac.alias("dup_frac"),
            (frac >= 0.3).alias("flagged"),
        )
    )


@register(
    "text_dedup_span_removal",
    # The Lee et al. 2022 pipeline OUTPUT to text_duplicate_ngram_
    # fraction's signal: excise duplicated spans instead of measuring
    # them. A word position is removed iff some 5-gram occurrence
    # covering it is (a) globally duplicated (df >= 2 docs) and
    # (b) not the corpus-wide FIRST occurrence of that 5-gram
    # (lexicographic (doc_id, position) — keep-first policy). Rebuilt
    # text = surviving words joined by ' ', md5-hash-checked so the
    # exact reconstruction is what the oracle verifies.
    f"""
    WITH norm AS (
        SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ),
    occ AS (
        SELECT doc_id, i,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                    || ' ' || w[i+4] AS sh
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i
              FROM norm WHERE len(w) >= 5)
    ),
    dfreq AS (
        SELECT sh, count(DISTINCT doc_id) AS df,
               min({{'d': doc_id, 'i': i}}) AS fst
        FROM occ GROUP BY sh
    ),
    dup AS (
        SELECT o.doc_id, o.i FROM occ o JOIN dfreq f USING (sh)
        WHERE f.df >= 2 AND NOT (o.doc_id = f.fst.d AND o.i = f.fst.i)
    ),
    removed AS (
        SELECT DISTINCT doc_id, pos FROM
            (SELECT doc_id, unnest(range(i, i + 5)) AS pos FROM dup)
    ),
    allw AS (
        SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, w
        FROM norm WHERE len(w) >= 1
    ),
    kept AS (
        SELECT a.doc_id, a.pos, a.w[a.pos] AS word
        FROM allw a LEFT JOIN removed r
          ON a.doc_id = r.doc_id AND a.pos = r.pos
        WHERE r.doc_id IS NULL
    ),
    reb AS (
        SELECT doc_id, md5(string_agg(word, ' ' ORDER BY pos)) AS m
        FROM kept GROUP BY doc_id
    ),
    nrem AS (
        SELECT doc_id, count(*) AS n FROM removed GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(len(c.w) AS BIGINT) AS n_words,
           CAST(COALESCE(n.n, 0) AS BIGINT) AS n_removed,
           COALESCE(r.m, md5('')) AS rebuilt_md5
    FROM norm c LEFT JOIN nrem n USING (doc_id) LEFT JOIN reb r USING (doc_id)
    WHERE len(c.w) >= 1
    """,
    "duplicate-span REMOVAL (Lee et al. 2022 exact-substring dedup "
    "output): word positions covered by a non-first occurrence of a "
    "df>=2 5-gram are excised, keep-first by (doc_id, position); "
    "rebuilt text md5-checked per doc",
    tags=("text", "dedup", "transform"),
)
def text_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-dedup TRANSFORM: same linear join shapes as
    text_duplicate_ngram_fraction (per-occurrence x 1 against the
    gram-df table — one row per distinct gram, so boilerplate in a
    million docs costs a million linear rows, never df^2), plus a x5
    position explode (linear in corpus tokens) and a per-doc rebuild
    whose collect_list is bounded by DOCUMENT length, not corpus size.
    The keep-first marker is min(struct(doc_id, i)) inside the df
    aggregate — no window, no second shuffle. At 100 TB every stage is
    a keyed hash aggregate or equi-join on gram/doc keys."""
    # r14: spread (guide §2.5) — the 5-gram posexplode ran single-task
    # (noop A/B: 2603 → 1326 ms); no-op on well-split inputs.
    docs = table(spark, sf_dir, "documents", spread=True)
    occ = docs.select(
        "doc_id",
        F.posexplode(T.word_shingles(F.col("text"), 5)).alias("i0", "sh"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "sh")
    dfreq = occ.groupBy("sh").agg(
        F.count_distinct("doc_id").alias("df"),
        F.min(F.struct("doc_id", "i")).alias("fst"),
    )
    dup = occ.join(dfreq.filter(F.col("df") >= 2), "sh").filter(
        ~(
            (F.col("doc_id") == F.col("fst.doc_id"))
            & (F.col("i") == F.col("fst.i"))
        )
    )
    removed = dup.select(
        "doc_id", F.explode(F.sequence("i", F.col("i") + 4)).alias("pos")
    ).distinct()
    allw = docs.select(
        "doc_id", F.posexplode(T.words(F.col("text"))).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    kept = allw.join(removed, ["doc_id", "pos"], "left_anti")
    reb = kept.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda x: x["word"],
                ),
            )
        ).alias("m")
    )
    nrem = removed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    counts = allw.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words")
    )
    return (
        counts.join(nrem, "doc_id", "left")
        .join(reb, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_removed"),
            F.coalesce(F.col("m"), F.md5(F.lit(""))).alias("rebuilt_md5"),
        )
    )


@register(
    "text_c4_doc_filters",
    f"""
    WITH feat AS (
        SELECT doc_id,
               CAST(len({_SQL_WORDS}) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_terminal,
               regexp_matches(regexp_replace(text, '\\s+$', ''), '[.!?]$') AS ends_terminal,
               contains(text, '{{') AS has_brace,
               contains(lower(text), 'lorem ipsum') AS has_lorem
        FROM documents
    )
    SELECT doc_id, n_words, n_terminal, ends_terminal, has_brace, has_lorem,
           round((CAST(n_words AS DOUBLE) / CAST(greatest(n_terminal, 1) AS DOUBLE)) * 10000.0) / 10000.0 + 0.0
               AS words_per_sentence,
           (n_words >= 5 AND n_terminal >= 3 AND ends_terminal
            AND NOT has_brace AND NOT has_lorem) AS keep
    FROM feat
    """,
    "C4-style document filter ruleset: sentence-count, terminal-punct, "
    "brace and boilerplate heuristics -> keep flag",
    tags=("text", "quality"),
)
def text_c4_doc_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning ruleset (Raffel et al. 2020, appendix) as pure
    Column expressions: >=3 sentences, terminal punctuation at EOD, no
    curly braces (code), no 'lorem ipsum'. Whole-stage codegen, one scan,
    no shuffle — at 100 TB this is a map-only pass that prunes before
    any expensive dedup/similarity stage runs.
    """
    docs = table(spark, sf_dir, "documents")
    n_words = T.token_count(F.col("text")).cast("bigint")
    n_terminal = F.regexp_count(F.col("text"), F.lit(r"[.!?]")).cast("bigint")
    feat = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_terminal.alias("n_terminal"),
        # Strip ALL trailing whitespace first: rtrim trims spaces only
        # (both engines), and Java's unanchored `$` matches before a
        # final '\n' while RE2's does not — stripping first makes the
        # anchor semantics identical cross-engine for multi-line docs.
        F.regexp_replace(F.col("text"), r"\s+$", "").rlike(r"[.!?]$").alias("ends_terminal"),
        F.col("text").contains("{").alias("has_brace"),
        F.lower(F.col("text")).contains("lorem ipsum").alias("has_lorem"),
    )
    return feat.select(
        "*",
        dround(F.col("n_words").cast("double") / F.greatest(F.col("n_terminal"), F.lit(1)).cast("double"), 4).alias(
            "words_per_sentence"
        ),
        (
            (F.col("n_words") >= 5)
            & (F.col("n_terminal") >= 3)
            & F.col("ends_terminal")
            & ~F.col("has_brace")
            & ~F.col("has_lorem")
        ).alias("keep"),
    )


@register(
    "text_gopher_quality_filters",
    f"""
    WITH feat AS (
        SELECT doc_id,
               {_SQL_WORDS} AS w,
               string_split(text, chr(10)) AS lines,
               CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT) AS n_symbols
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w) AS mwl,
               CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w) AS af,
               CAST(n_symbols AS DOUBLE) / len(w) AS sr,
               CAST(len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•] '))) AS DOUBLE)
                   / len(lines) AS bf,
               CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS DOUBLE)
                   / len(lines) AS ef
        FROM feat WHERE len(w) > 0
    )
    SELECT doc_id, n_words,
           round(mwl * 10000.0) / 10000.0 + 0.0 AS mean_word_len,
           round(af * 10000.0) / 10000.0 + 0.0 AS alpha_word_frac,
           round(sr * 10000.0) / 10000.0 + 0.0 AS symbol_word_ratio,
           round(bf * 10000.0) / 10000.0 + 0.0 AS bullet_line_frac,
           round(ef * 10000.0) / 10000.0 + 0.0 AS ellipsis_line_frac,
           (n_words BETWEEN 50 AND 100000 AND mwl BETWEEN 3 AND 10
            AND sr < 0.1 AND bf <= 0.9 AND ef <= 0.3 AND af > 0.8) AS keep
    FROM m
    """,
    "Gopher-style document quality rules (Rae et al. 2021 §A1.1): word "
    "count and mean-word-length windows, symbol-to-word ratio, bullet/"
    "ellipsis line fractions, alphabetic-word fraction -> keep flag",
    tags=("text", "quality", "training"),
)
def text_gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule set as pure Column expressions: one scan, zero
    shuffle, whole-stage codegen — like text_c4_doc_filters this is a
    map-only pruning pass that runs BEFORE any expensive dedup stage at
    100 TB. Higher-order array functions (transform/filter/aggregate)
    keep the per-doc loops JVM-side; no UDF."""
    docs = table(spark, sf_dir, "documents")
    w = T.words(F.col("text"))
    lines = F.split(F.col("text"), "\n")
    feat = docs.select(
        "doc_id",
        w.alias("w"),
        lines.alias("lines"),
        F.regexp_count(F.col("text"), F.lit(r"#|\.\.\.")).cast("bigint").alias("n_symbols"),
    ).filter(F.size("w") > 0)
    nw = F.size("w").cast("bigint")
    mwl = (
        F.aggregate("w", F.lit(0).cast("long"), lambda a, x: a + F.length(x)).cast("double")
        / F.size("w")
    )
    af = F.size(F.filter("w", lambda x: x.rlike("[a-z]"))).cast("double") / F.size("w")
    sr = F.col("n_symbols").cast("double") / F.size("w")
    bf = (
        F.size(F.filter("lines", lambda line: F.ltrim(line).rlike("^[-*•] "))).cast("double")
        / F.size("lines")
    )
    ef = (
        F.size(F.filter("lines", lambda line: F.rtrim(line).endswith("..."))).cast("double")
        / F.size("lines")
    )
    m = feat.select(
        "doc_id",
        nw.alias("n_words"),
        mwl.alias("mwl"),
        af.alias("af"),
        sr.alias("sr"),
        bf.alias("bf"),
        ef.alias("ef"),
    )
    return m.select(
        "doc_id",
        "n_words",
        dround(F.col("mwl"), 4).alias("mean_word_len"),
        dround(F.col("af"), 4).alias("alpha_word_frac"),
        dround(F.col("sr"), 4).alias("symbol_word_ratio"),
        dround(F.col("bf"), 4).alias("bullet_line_frac"),
        dround(F.col("ef"), 4).alias("ellipsis_line_frac"),
        (
            F.col("n_words").between(50, 100000)
            & F.col("mwl").between(3, 10)
            & (F.col("sr") < 0.1)
            & (F.col("bf") <= 0.9)
            & (F.col("ef") <= 0.3)
            & (F.col("af") > 0.8)
        ).alias("keep"),
    )


@register(
    "text_dsir_importance_weights",
    # DSIR (Xie et al. 2023): importance weight of each raw document
    # toward a target distribution (here: the lang='en' slice), under
    # hashed-unigram bag-of-words language models with add-1 smoothing
    # over B=64 buckets. log w(x) = Σ_tokens [ln p_target(bucket) -
    # ln p_raw(bucket)]. The per-bucket log-ratios are identical
    # doubles in both engines (tiny exact-integer-count dim), so the
    # per-doc sums agree to rounding.
    f"""
    WITH tok AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket
        FROM (SELECT doc_id, lang, unnest({_SQL_WORDS}) AS tok FROM documents)
    ),
    raw AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM tok GROUP BY bucket
    ),
    tgt AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM tok WHERE lang = 'en' GROUP BY bucket
    ),
    dim AS (
        SELECT r.bucket,
               ln((coalesce(t.ct, 0) + 1)
                  / ((SELECT sum(ct) FROM tgt) + 64.0))
             - ln((r.cr + 1) / ((SELECT sum(cr) FROM raw) + 64.0)) AS lr
        FROM raw r LEFT JOIN tgt t USING (bucket)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round((sum(lr)) * 10000.0) / 10000.0 + 0.0 AS log_weight,
           round((avg(lr)) * 10000.0) / 10000.0 + 0.0 AS mean_log_ratio
    FROM tok JOIN dim USING (bucket)
    GROUP BY doc_id
    """,
    "DSIR hashed-unigram importance weights vs the lang='en' target "
    "slice (Xie et al. 2023): 64-bucket add-1-smoothed LM log-ratio "
    "summed per document — the importance-resampling score a targeted "
    "pretraining data selection runs at corpus scale",
    tags=("text", "quality", "training", "sampling"),
)
def text_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: the bucket LMs are one map-side-combined agg each
    (64-row results), the log-ratio dim is broadcast, and scoring is a
    map-side join + one per-doc shuffle — no all-pairs, no giant dims.
    The bucket hash reuses the oracle-portable md5 prefix (operators/
    hashing.py conventions)."""
    from ..operators.hashing import hex_to_long

    # r14: spread (guide §2.5) — single-row-group input; no-op at scale.
    docs = table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        "doc_id", "lang", F.explode(T.words(F.col("text"))).alias("tok")
    ).select(
        "doc_id",
        "lang",
        (hex_to_long(F.substring(F.md5("tok"), 1, 8)) % 64).alias("bucket"),
    )
    # BOTH bucket LMs from ONE map-side-combined aggregation (cr = all
    # occurrences, ct = target-slice occurrences), and both totals from
    # ONE scalar agg over the 64-row result — the corpus plan invariant
    # allows at most one single-partition exchange per query and the
    # tiny totals row is it.
    counts = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cr"),
        F.sum((F.col("lang") == "en").cast("int")).cast("bigint").alias("ct"),
    )
    tots = counts.agg(
        F.sum("cr").cast("bigint").alias("tr"), F.sum("ct").cast("bigint").alias("tt")
    )
    dim = counts.crossJoin(F.broadcast(tots)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1) / (F.col("tt") + F.lit(64.0)))
            - F.log((F.col("cr") + 1) / (F.col("tr") + F.lit(64.0)))
        ).alias("lr"),
    )
    return (
        toks.join(F.broadcast(dim), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            dround(F.sum("lr"), 4).alias("log_weight"),
            dround(F.avg("lr"), 4).alias("mean_log_ratio"),
        )
    )


@register(
    "text_quality_classifier_scores",
    # fasttext-style supervised quality scorer (Joulin et al. 2016):
    # logit = bias + mean over hashed unigram+bigram features of a
    # frozen 256-bucket weight vector; prob = sigmoid(logit). The
    # oracle recomputes the deterministic stand-in weights inline
    # (operators/quality_classifier.py:deterministic_weights — exact
    # multiples of 2^-10, so the feature sum is order-independent and
    # bit-identical across engines).
    f"""
    WITH tok AS (
        SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ),
    f AS (
        SELECT doc_id,
               w || CASE WHEN len(w) >= 2
                    THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
                    ELSE CAST([] AS VARCHAR[]) END AS feats
        FROM tok WHERE len(w) > 0
    ),
    s AS (
        SELECT doc_id,
               CAST(len(feats) AS BIGINT) AS n_features,
               0.0625 + list_sum(list_transform(feats, t ->
                   ((('0x' || substr(md5('w:' ||
                        (('0x' || substr(md5(t), 1, 8))::BIGINT % 256)), 1, 8))::BIGINT
                     % 2049) - 1024) / 1024.0
               )) / len(feats) AS logit
        FROM f
    )
    SELECT doc_id, n_features,
           round(logit * 10000.0) / 10000.0 + 0.0 AS logit,
           round((1.0 / (1.0 + exp(-logit))) * 10000.0) / 10000.0 + 0.0 AS prob,
           logit > 0 AS keep
    FROM s
    """,
    "supervised quality-classifier inference (fasttext-style linear "
    "scorer, Joulin et al. 2016): frozen weight vector over 256 hashed "
    "unigram+bigram buckets, logit = bias + mean bucket weight, "
    "prob = sigmoid -> keep flag; the model ships as a literal array "
    "(no join, no shuffle, no UDF)",
    tags=("text", "quality", "training", "classifier"),
)
def text_quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: map-only whole-stage codegen over the scan — the
    weight vector is a plan literal (the degenerate broadcast), scoring
    never shuffles, and the stage slots before dedup in the funnel's
    cheapest-first cost model. See operators/quality_classifier.py."""
    from ..operators.quality_classifier import (
        deterministic_weights,
        hashed_ngram_buckets,
        linear_logit,
        sigmoid,
    )

    docs = table(spark, sf_dir, "documents")
    w = T.words(F.col("text"))
    feat = docs.select("doc_id", w.alias("w")).filter(F.size("w") > 0)
    buckets = hashed_ngram_buckets(F.col("w"), 256)
    scored = feat.select(
        "doc_id",
        F.size("w").alias("_nw"),
        buckets.alias("_buckets"),
    ).select(
        "doc_id",
        F.size("_buckets").cast("bigint").alias("n_features"),
        linear_logit(F.col("_buckets"), deterministic_weights(256)).alias("_logit"),
    )
    return scored.select(
        "doc_id",
        "n_features",
        dround(F.col("_logit"), 4).alias("logit"),
        dround(sigmoid(F.col("_logit")), 4).alias("prob"),
        (F.col("_logit") > 0).alias("keep"),
    )


@register(
    "text_tfidf_top_terms",
    # tf-idf keyword extraction: tf = in-doc term count, idf =
    # ln((N+1)/(df+1)) + 1 (sklearn's smooth idf), score = tf*idf
    # rounded to 6 dp BEFORE ranking so a libm ulp can't reorder the
    # top-3; ties broken by term asc → the selected SET is
    # deterministic cross-engine.
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_WORDS}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               round((tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0)) * 1000000.0)
                   / 1000000.0 + 0.0 AS score
        FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tf, score, CAST(rk AS INT) AS rk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term ASC
        ) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
    "tf-idf keyword extraction: top-3 terms per document by smooth-idf "
    "tf-idf score (corpus df as a term-keyed equi-join dim, per-doc "
    "top-k via rank filter) — the per-document salient-term summary a "
    "corpus exploration / topic labeling pass runs at scale",
    tags=("text", "window", "agg", "training"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: tf is one (doc, term) aggregation off the explode;
    df is one term aggregation OVER THE TF RESULT (no second corpus
    pass); the idf dim joins back on term as a SHUFFLE equi-join —
    deliberately not a broadcast, vocabulary scales with the corpus —
    and the top-3 is a rank filter that compiles to WindowGroupLimit
    on both sides of the doc_id exchange (only ≤3 rows per doc cross
    the wire; same mechanism as window_topk_orders_per_customer). The
    1-row corpus count is the one allowed scalar broadcast."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.words(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    # shuffle_hash = STRATEGY pin, not a size bet: the stats-less
    # planner broadcasts the df(term) side off file-size stats at test
    # scale, but vocabulary GROWS with the corpus — a broadcast
    # vocabulary is a driver OOM at 100 TB (same argument as q3's
    # merge pin on the pre-aggregated fact side).
    scored = (
        tf.join(df.hint("shuffle_hash"), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            dround(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "score", F.col("rk").cast("int").alias("rk"))
    )


@register(
    "text_domain_filter",
    # Staged domain curation funnel — each stage's effect shows in the
    # values: blocklist drops 3 of 20 domains, the count cap keeps the
    # 15 largest docs per domain (n_chars DESC, doc_id tiebreak), the
    # 3000-char budget then keeps each domain's doc_id-ordered prefix.
    # share_ppm is an INTEGER (floor of x*1e6/total) so the cross-engine
    # compare never touches a float column (the md5-ppm convention).
    """
    WITH docs AS (
        SELECT doc_id, source AS domain, n_chars
        FROM documents
        WHERE source NOT IN ('src3', 'src7', 'src13')
    ),
    capped AS (
        SELECT doc_id, domain, n_chars FROM (
            SELECT *, row_number() OVER (
                PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rk
            FROM docs
        ) WHERE rk <= 15
    ),
    budgeted AS (
        SELECT doc_id, domain, n_chars FROM (
            SELECT *, sum(n_chars) OVER (
                PARTITION BY domain ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM capped
        ) WHERE cum <= 3000
    ),
    per_domain AS (
        SELECT d.domain,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(c.doc_id) AS BIGINT) AS n_capped,
               CAST(count(b.doc_id) AS BIGINT) AS n_kept,
               CAST(coalesce(sum(b.n_chars), 0) AS BIGINT) AS kept_chars
        FROM docs d
        LEFT JOIN capped c ON d.doc_id = c.doc_id
        LEFT JOIN budgeted b ON d.doc_id = b.doc_id
        GROUP BY d.domain
    ),
    tot AS (SELECT CAST(sum(kept_chars) AS DOUBLE) AS tc FROM per_domain)
    SELECT p.domain, p.n_docs, p.n_capped, p.n_kept, p.kept_chars,
           CAST(floor(p.kept_chars * 1000000.0 / t.tc) AS BIGINT) AS share_ppm
    FROM per_domain p CROSS JOIN tot t
    """,
    "domain-level curation funnel (C4/RefinedWeb): blocklist anti-join, "
    "15-doc-per-domain count cap (quality order), 3000-char per-domain "
    "budget (grouped prefix sum) -- per-domain survivor counts + integer "
    "ppm share of the kept corpus",
    tags=("text", "domains", "training", "funnel"),
)
def text_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape (operators/domains.py has the full story): the
    blocklist is a broadcast LEFT ANTI equi-join; the count cap is a
    row_number filter Spark compiles to WindowGroupLimit (map-side
    pre-prune to 15 rows/domain BEFORE the shuffle — a mega-domain
    costs the exchange 15 rows, not its corpus share); the char budget
    is the two-pass grouped prefix sum (operators/ordering.py — no
    per-domain single-task window); the summary is one aggregation per
    stage output plus a broadcast 1-row total for the ppm share (the
    registry's one allowed single-partition exchange)."""
    from ..operators.domains import (
        blocklist_filter,
        cap_chars_per_domain,
        cap_docs_per_domain,
    )

    blocklist = spark.createDataFrame(
        [("src3",), ("src7",), ("src13",)], "domain string"
    )
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.col("source").alias("domain"), "n_chars")
    )
    allowed = blocklist_filter(docs, "domain", blocklist)
    capped = cap_docs_per_domain(
        allowed, "domain", 15, [F.desc("n_chars"), F.asc("doc_id")]
    )
    budgeted = cap_chars_per_domain(
        capped, "domain", 3000, "n_chars", [F.asc("doc_id")]
    )
    per_domain = (
        allowed.join(
            capped.select("doc_id", F.lit(1).alias("_c")), "doc_id", "left"
        )
        .join(
            budgeted.select("doc_id", F.lit(1).alias("_b"), F.col("n_chars").alias("_bc")),
            "doc_id",
            "left",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("_c").alias("n_capped"),
            F.count("_b").alias("n_kept"),
            F.coalesce(F.sum("_bc"), F.lit(0)).cast("bigint").alias("kept_chars"),
        )
    )
    tot = per_domain.agg(F.sum("kept_chars").cast("double").alias("_tc"))
    return per_domain.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "n_capped",
        "n_kept",
        "kept_chars",
        F.floor(F.col("kept_chars") * 1000000.0 / F.col("_tc"))
        .cast("bigint")
        .alias("share_ppm"),
    )


def _bpe_learn_ctes(n_merges: int) -> str:
    # Unrolled merge loop (one pairs/best/words CTE triple per step —
    # the same iterative-dataflow oracle idiom as PageRank and
    # ml_kmeans_cells). The double-space symbol encoding makes DuckDB's
    # left-to-right replace() reproduce BPE's greedy pass exactly; see
    # operators/bpe.py for the encoding argument. All-integer counts:
    # no float conventions needed anywhere. Returns the CTE body shared
    # by the learn gate (reads b1..bN) and the encode gate (applies
    # b1..bN to every word of every document).
    steps = []
    prev = "w0"
    for i in range(1, n_merges + 1):
        steps.append(f"""
    p{i} AS (
        SELECT sym[u.i] || ' ' || sym[u.i + 1] AS pair,
               CAST(sum(f) AS BIGINT) AS cnt
        FROM (SELECT string_split(trim(s), '  ') AS sym, f FROM {prev}) t,
             UNNEST(generate_series(1, len(t.sym) - 1)) AS u(i)
        GROUP BY pair
    ),
    b{i} AS (
        SELECT {i} AS step, pair, replace(pair, ' ', '') AS merged, cnt
        FROM p{i} ORDER BY cnt DESC, pair LIMIT 1
    ),
    w{i} AS (
        SELECT replace(t.s, ' ' || replace(b.pair, ' ', '  ') || ' ',
                       ' ' || b.merged || ' ') AS s, f
        FROM {prev} t, b{i} b
    )""")
        prev = f"w{i}"
    return f"""toks AS (
        SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
        FROM documents
    ),
    words AS (
        SELECT word, CAST(count(*) AS BIGINT) AS f
        FROM toks WHERE word <> '' GROUP BY word
    ),
    w0 AS (
        SELECT ' ' || rtrim(regexp_replace(word, '(.)', '\\1  ', 'g')) || ' ' AS s, f
        FROM words
    ),{",".join(steps)}"""


def _sql_bpe_oracle(n_merges: int) -> str:
    union = "\n    UNION ALL ".join(
        f"SELECT step, pair, merged, cnt FROM b{i}" for i in range(1, n_merges + 1)
    )
    return f"""
    WITH {_bpe_learn_ctes(n_merges)}
    SELECT CAST(step AS INT) AS step, pair, merged, cnt
    FROM ({union})
    """


def _sql_bpe_encode_oracle(n_merges: int) -> str:
    # ENCODE side: cross join the six 1-row merge CTEs onto documents
    # and apply the replace chain inside a list_transform lambda
    # (DuckDB lambdas capture enclosing-query columns, so b1.pair etc.
    # are in scope). Token stream md5 makes this a full value-hash
    # check of every token of every document.
    sym = "' ' || rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' '"
    chain = sym
    for i in range(1, n_merges + 1):
        chain = (
            f"replace({chain}, ' ' || replace(b{i}.pair, ' ', '  ') || ' ', "
            f"' ' || b{i}.merged || ' ')"
        )
    merge_tables = ", ".join(f"b{i}" for i in range(1, n_merges + 1))
    return f"""
    WITH {_bpe_learn_ctes(n_merges)},
    enc AS (
        SELECT d.doc_id,
               flatten(list_transform(
                   list_filter(regexp_split_to_array(lower(d.text), '\\s+'),
                               w -> w <> ''),
                   w -> string_split(trim({chain}), '  '))) AS toks,
               len(list_filter(regexp_split_to_array(lower(d.text), '\\s+'),
                               w -> w <> '')) AS nw
        FROM documents d, {merge_tables}
    )
    SELECT doc_id,
           CAST(nw AS INT) AS n_words,
           CAST(len(toks) AS INT) AS n_bpe_tokens,
           md5(array_to_string(toks, ' ')) AS tokens_md5
    FROM enc
    """


@register(
    "text_bpe_learn_merges",
    _sql_bpe_oracle(6),
    "distributed BPE merge learning (Sennrich 2016) over the document "
    "corpus: 6 merge steps on the distinct-word frequency table, argmax "
    "pair per step with (count DESC, pair ASC) tie-break -- the learned "
    "merge table (step, pair, merged, count)",
    tags=("text", "tokenizer", "iterative", "training"),
)
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction as iterated dataflow (operators/bpe.py has
    the full story): one corpus-sized shuffle builds the distinct-word
    frequency table; each of the 6 merge steps is ONE pair-count
    aggregation over that table (map-side partials) plus a 1-row
    TakeOrdered argmax -- driver state per step is a single pair
    string, the same bounded contract as k-means' k x dim doubles.
    At 100 TB the word table is Heaps'-law small relative to the
    corpus, which is exactly why production tokenizer trainers use
    this representation."""
    from ..operators.bpe import learn_bpe_merges

    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col("text")), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges = learn_bpe_merges(words, n_merges=6)
    return spark.createDataFrame(
        merges, "step int, pair string, merged string, cnt bigint"
    )


@register(
    "text_bpe_encode_tokens",
    _sql_bpe_encode_oracle(6),
    "ENCODE side of the learned tokenizer: apply the 6 learned BPE "
    "merges to every word of every document -- per-doc word count, "
    "BPE token count, and md5 of the full ordered token stream",
    tags=("text", "tokenizer", "training"),
)
def text_bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION after induction (the step a training
    pipeline runs over the whole corpus): the learned merge table is
    tiny (6 rows), so it ships as PLAN LITERALS -- encoding is a pure
    map over the document scan (split -> per-word symbolize -> 6
    chained replaces inside a transform() lambda -> flatten), whole-
    stage codegen, no join, no shuffle, no UDF. The corpus-sized work
    is exactly one pass; only the learning phase (text_bpe_learn_merges'
    bounded-driver-state loop) ran aggregations. The md5 over the
    ordered token stream makes the oracle a full value-hash check of
    every emitted token."""
    from ..operators.bpe import apply_merges, learn_bpe_merges, symbolize

    # r14: spread (guide §2.5) — the encode map (split → symbolize → 6
    # chained replaces) ran as ONE task on the single-row-group input;
    # interleaved noop A/B: 880 → 176 ms. On a well-split input the
    # spread no-ops and the plan is the pure map-only single pass the
    # plan guard's no-spread branch still asserts.
    docs = table(spark, sf_dir, "documents", spread=True)
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges = learn_bpe_merges(words, n_merges=6)
    warr = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != ""
    )
    toks = F.flatten(
        F.transform(
            warr,
            lambda w: F.split(F.trim(apply_merges(symbolize(w), merges)), "  "),
        )
    )
    return docs.select(
        "doc_id",
        F.size(warr).cast("int").alias("n_words"),
        F.size(toks).cast("int").alias("n_bpe_tokens"),
        F.md5(F.array_join(toks, " ")).alias("tokens_md5"),
    )
