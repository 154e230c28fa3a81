"""Training-corpus curation operators: benchmark decontamination,
RAG chunking, PII masking, and kNN label audit.

Reference parity: the reference has no text operators (SURVEY.md §2.6);
this module extends the LLM-pipeline stack with the remaining standard
pre-training / RAG-ingest curation steps:

- **decontamination** — remove training documents that overlap the
  evaluation benchmark (the GPT-3 appendix-C / PaLM recipe: n-gram
  collision against the benchmark set). Candidates come from a shingle
  EQUI-join against the benchmark's (small, broadcastable) distinct
  shingle set — never a pairwise text comparison.
- **chunking with overlap** — the RAG-ingest sliding window (fixed
  token size + stride); all offset arithmetic integer so the oracle is
  exact, chunk text carried as an md5 fingerprint (the driver's
  canonicalizer rejects array cells).
- **PII masking** — deterministic digit redaction over the direct
  identifier (last-2 retention) plus an md5 join-preserving pseudonym,
  the scrub-then-tokenize recipe expressed as pure `regexp_replace` /
  `md5` (codegen, no UDF).
- **kNN label audit** — majority-vote label of the k nearest
  embeddings vs the stored label: the standard embedding-space
  label-noise / mislabeled-example detector (Confident-Learning-lite).

100 TB notes: decontamination broadcasts the benchmark shingle set
(benchmarks are MBs; the corpus is the 100 TB side, touched by one
scan + one map-side-combinable aggregate); chunking and masking are
stateless per-row projections; the kNN audit is quadratic in the
QUERY set only (queries broadcast, corpus scanned once — same shape
as sim_cosine_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import text as T
from . import dround, register
from .textanalysis import _SQL_WORDS

#: benchmark membership rule: deterministic id sample (no shared random
#: state with the oracle needed)
DECON_BENCH_MOD = 97
#: shingle width for the overlap test (3-word shingles — the corpus's
#: near-dup band basis, so the gate is non-vacuous on the testdata; a
#: production pipeline uses 8-13 as in GPT-3/PaLM, a constant swap)
DECON_K = 3

CHUNK_SIZE = 64
CHUNK_STRIDE = 48

KNN_K = 5
KNN_QUERIES = 20


@register(
    "text_decontaminate_ngram",
    f"""
    WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
            FROM w WHERE len(w) >= {DECON_K})
    ),
    bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {DECON_BENCH_MOD} = 0),
    own AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
        FROM sh WHERE doc_id % {DECON_BENCH_MOD} <> 0 GROUP BY doc_id
    ),
    hits AS (
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        FROM sh s JOIN bench b USING (sh)
        WHERE s.doc_id % {DECON_BENCH_MOD} <> 0
        GROUP BY s.doc_id
    )
    SELECT h.doc_id, h.n_overlap, o.n_shingles,
           (10 * h.n_overlap >= o.n_shingles) AS contaminated
    FROM hits h JOIN own o USING (doc_id)
    """,
    "benchmark decontamination (GPT-3/PaLM recipe): training docs "
    "sharing >= 1 distinct n-gram with the benchmark set (deterministic "
    "id sample), with an integer 10%-of-own-shingles removal flag; "
    "benchmark shingles broadcast, corpus side one scan + keyed agg",
    tags=("text", "dedup", "training", "curation"),
)
def text_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 plan (VERDICT r9 "What's wrong #4"): a document's
    shingles are already colocated in its row, so the per-doc DISTINCT
    is `array_distinct` on the shingle array — map-local, before any
    explode. That deletes the round-9 plan's corpus-wide
    (doc_id, 3-word-shingle-STRING) exchange (`explode → .distinct()`),
    which BASELINE.md §Round-9 identified as the entire above-floor
    residual (2.82× DuckDB at sf3; persist only stopped it running
    three times). What remains on the corpus side: one scan, a
    map-local explode of the deduped array, the broadcast benchmark
    join, and ONE doc_id-keyed count aggregate (narrow ints, map-side
    combinable). `n_shingles` = size(array_distinct(...)) rides the
    same rows as a grouping column, so the old hits⋈own join is gone
    too. The benchmark side (1/DECON_BENCH_MOD of docs) explodes and
    dedups only its own slice before broadcasting.

    r14: spread=("doc_id",) (guide §2.5) — the shingling + array_distinct
    pass runs below any exchange, so a single-row-group input serializes
    it on one core; hash-spread on doc_id parallelizes it AND satisfies
    the (doc_id, n_shingles) groupBy distribution, so the train side's
    post-join aggregate needs no further exchange. A/B at sf0.1:
    791 → 569 ms. No-op on well-split inputs."""
    docs = table(spark, sf_dir, "documents", spread=("doc_id",)).select("doc_id", "text")
    # word_shingles takes the raw text (it let-binds words() internally)
    sh_arr = docs.select(
        "doc_id",
        F.array_distinct(T.word_shingles(F.col("text"), DECON_K)).alias("shs"),
    )
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    bench = (
        sh_arr.filter(is_bench).select(F.explode("shs").alias("sh")).distinct()
    )
    # no size(shs)>0 filter: exploding an empty array already yields no
    # rows, and a size() predicate would be PUSHED DOWN below the
    # projection, re-evaluating the whole shingle expression per row
    train = sh_arr.filter(~is_bench)
    return (
        train.select(
            "doc_id",
            F.size("shs").cast("bigint").alias("n_shingles"),
            F.explode("shs").alias("sh"),
        )
        .join(F.broadcast(bench), on="sh")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
        .select(
            "doc_id",
            "n_overlap",
            "n_shingles",
            (10 * F.col("n_overlap") >= F.col("n_shingles")).alias("contaminated"),
        )
    )


@register(
    "text_chunk_overlap",
    # Sliding-window chunking, size 64 / stride 48 (16-token overlap):
    # chunk i covers tokens [1 + 48i, min(1 + 48i + 63, n)] for every
    # start <= n. All offsets integer; chunk text ships as an md5
    # fingerprint of the space-joined tokens (array cells would crash
    # the driver's canonicalizer).
    f"""
    WITH w AS (
        SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ),
    c AS (
        SELECT doc_id, len(w) AS n, w,
               unnest(range(0, (len(w) - 1) // {CHUNK_STRIDE} + 1)) AS chunk_id
        FROM w WHERE len(w) >= 1
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * {CHUNK_STRIDE} + 1 AS BIGINT) AS token_start,
           CAST(least(chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}, n) AS BIGINT) AS token_end,
           CAST(least(chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}, n)
                - chunk_id * {CHUNK_STRIDE} AS BIGINT) AS n_tokens,
           md5(array_to_string(list_slice(w, chunk_id * {CHUNK_STRIDE} + 1,
                                          least(chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}, n)), ' ')) AS chunk_hash
    FROM c
    """,
    "RAG-ingest sliding-window chunking (size 64, stride 48): integer "
    "token offsets + md5 chunk fingerprint; stateless per-row explode",
    tags=("text", "training", "curation"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", T.words(F.col("text")).alias("w"))
        .withColumn("n", F.size("w"))
        .filter(F.col("n") >= 1)
    )
    n_chunks = ((F.col("n") - 1) / F.lit(CHUNK_STRIDE)).cast("long")  # floor: n >= 1
    start = F.col("chunk_id") * CHUNK_STRIDE + 1
    end = F.least(start + F.lit(CHUNK_SIZE - 1), F.col("n"))
    return (
        docs.select(
            "doc_id",
            "n",
            "w",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            start.cast("bigint").alias("token_start"),
            end.cast("bigint").alias("token_end"),
            (end - start + 1).cast("bigint").alias("n_tokens"),
            F.md5(
                F.concat_ws(" ", F.slice(F.col("w"), start, end - start + 1))
            ).alias("chunk_hash"),
        )
    )


@register(
    "pii_mask_identifiers",
    # Deterministic identifier redaction + pseudonymization over the
    # customer dimension (its name embeds the numeric id — the direct
    # identifier in this schema): every digit but the last 2 becomes
    # 'X' (last-N retention, the billing-support convention), the
    # masked-digit count is an integer length delta, and md5(c_name)
    # is the stable join-preserving pseudonym (tokenization: equal
    # identifiers → equal tokens, so downstream joins/groupBys still
    # work on the scrubbed table).
    """
    SELECT c_custkey,
           regexp_replace(substr(c_name, 1, length(c_name) - 2), '[0-9]', 'X', 'g')
               || substr(c_name, length(c_name) - 1, 2) AS name_masked,
           CAST(length(substr(c_name, 1, length(c_name) - 2))
                - length(regexp_replace(substr(c_name, 1, length(c_name) - 2), '[0-9]', '', 'g'))
                AS BIGINT) AS n_digits_masked,
           md5(c_name) AS pseudonym
    FROM customer
    """,
    "PII scrub: digit redaction with last-2 retention over the direct "
    "identifier + md5 join-preserving pseudonym — pure regexp_replace/"
    "md5 projections (codegen, no UDF), counts as integer length deltas",
    tags=("text", "curation", "functions"),
)
def pii_mask_identifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    prefix = F.expr("substring(c_name, 1, length(c_name) - 2)")
    last2 = F.expr("substring(c_name, length(c_name) - 1, 2)")
    return cust.select(
        "c_custkey",
        F.concat(F.regexp_replace(prefix, "[0-9]", "X"), last2).alias("name_masked"),
        (F.length(prefix) - F.length(F.regexp_replace(prefix, "[0-9]", "")))
        .cast("bigint")
        .alias("n_digits_masked"),
        F.md5(F.col("c_name")).alias("pseudonym"),
    )


@register(
    "ml_knn_label_audit",
    # kNN majority-vote label vs stored label over the embedding space —
    # the standard mislabeled-example detector. Neighbor sets are
    # deterministic (cosine rounded to 6 dp before ranking, vec_id
    # tiebreak); the vote tie-breaks (count DESC, label ASC).
    f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS nid, c.label AS nlabel,
               round((list_dot_product(q.dv, c.dv) /
                      (sqrt(list_dot_product(q.dv, q.dv)) * sqrt(list_dot_product(c.dv, c.dv))))
                     * 1000000.0) / 1000000.0 + 0.0 AS cos
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {KNN_QUERIES}
    ),
    topk AS (
        SELECT qid, nlabel FROM (
            SELECT qid, nlabel,
                   row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
            FROM scored
        ) WHERE rn <= {KNN_K}
    ),
    votes AS (
        SELECT qid, nlabel, CAST(count(*) AS BIGINT) AS n_votes
        FROM topk GROUP BY qid, nlabel
    ),
    pred AS (
        SELECT qid, nlabel AS pred_label, n_votes FROM (
            SELECT qid, nlabel, n_votes,
                   row_number() OVER (PARTITION BY qid ORDER BY n_votes DESC, nlabel) AS rk
            FROM votes
        ) WHERE rk = 1
    )
    SELECT p.qid AS vec_id, CAST(p.pred_label AS BIGINT) AS pred_label,
           p.n_votes, CAST(v.label AS BIGINT) AS true_label,
           (p.pred_label = v.label) AS label_agrees
    FROM pred p JOIN v ON v.vec_id = p.qid
    """,
    "kNN label audit (k=5 cosine majority vote vs stored label) for the "
    "first 20 vectors: the embedding-space mislabeled-example detector; "
    "queries broadcast, corpus scanned once",
    tags=("similarity", "ml", "curation"),
)
def ml_knn_label_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk

    emb = table(spark, sf_dir, "embeddings")
    topk = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < KNN_QUERIES), k=KNN_K
    )  # (query_id, vec_id, cos) — cos rounded before ranking inside
    labels = emb.select("vec_id", F.col("label").cast("bigint").alias("label"))
    votes = (
        topk.join(labels.withColumnRenamed("label", "nlabel"), on="vec_id")
        .groupBy("query_id", "nlabel")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_votes"))
    )
    rk = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("nlabel"))
    pred = (
        votes.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("nlabel").alias("pred_label"),
            "n_votes",
        )
    )
    return pred.join(
        labels.withColumnRenamed("label", "true_label"), on="vec_id"
    ).select(
        "vec_id",
        "pred_label",
        "n_votes",
        "true_label",
        (F.col("pred_label") == F.col("true_label")).alias("label_agrees"),
    )


# ---------------------------------------------------------------------------
# MMR result diversification (the serving-side counterpart of dedup)
# ---------------------------------------------------------------------------

MMR_QUERIES = 3
MMR_CAND = 20
MMR_PICKS = 5


def _sql_mmr_oracle() -> str:
    """Unrolled-iteration MMR oracle (the kmeans/PageRank recipe): each
    pick is one CTE — sel1 = argmax relevance; pick t = argmax over the
    remaining candidates of 0.5*(rel − max sim to the picked set), ties
    by vec_id. All cosines rounded to 6 dp BEFORE any comparison, so
    both engines rank identical doubles."""
    dvec = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    cos = (
        "round((list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
        " * 1000000.0) / 1000000.0 + 0.0"
    )
    parts = [
        f"""
    WITH v AS (SELECT vec_id, {dvec} AS dv FROM embeddings),
    cand AS (
        SELECT qid, vec_id, cos FROM (
            SELECT q.vec_id AS qid, c.vec_id AS vec_id,
                   {cos.format(a="q.dv", b="c.dv")} AS cos,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {cos.format(a="q.dv", b="c.dv")} DESC, c.vec_id) AS rn
            FROM v q JOIN v c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < {MMR_QUERIES}
        ) WHERE rn <= {MMR_CAND}
    ),
    ps AS (
        SELECT a.qid, a.vec_id AS cid, b.vec_id AS sid,
               {cos.format(a="ca.dv", b="cb.dv")} AS sim
        FROM cand a JOIN cand b ON a.qid = b.qid AND a.vec_id <> b.vec_id
        JOIN v ca ON ca.vec_id = a.vec_id
        JOIN v cb ON cb.vec_id = b.vec_id
    ),
    sel1 AS (
        SELECT qid, vec_id, CAST(1 AS BIGINT) AS step, 0.5 * cos AS score
        FROM (SELECT qid, vec_id, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
              FROM cand) WHERE rn = 1
    ),
    sel_1 AS (SELECT * FROM sel1)"""
    ]
    for t in range(2, MMR_PICKS + 1):
        parts.append(f""",
    pick{t} AS (
        SELECT qid, vec_id, CAST({t} AS BIGINT) AS step, score FROM (
            SELECT r.qid, r.vec_id,
                   0.5 * (r.cos - m.maxsim) AS score,
                   row_number() OVER (PARTITION BY r.qid
                                      ORDER BY 0.5 * (r.cos - m.maxsim) DESC, r.vec_id) AS rn
            FROM cand r
            JOIN (
                SELECT p.qid, p.cid, max(p.sim) AS maxsim
                FROM ps p JOIN sel_{t - 1} s ON p.qid = s.qid AND p.sid = s.vec_id
                GROUP BY p.qid, p.cid
            ) m ON m.qid = r.qid AND m.cid = r.vec_id
            WHERE NOT EXISTS (SELECT 1 FROM sel_{t - 1} s
                              WHERE s.qid = r.qid AND s.vec_id = r.vec_id)
        ) WHERE rn = 1
    ),
    sel_{t} AS (SELECT * FROM sel_{t - 1} UNION ALL SELECT * FROM pick{t})""")
    parts.append(f"""
    SELECT qid, step, vec_id,
           round(score * 10000000.0) / 10000000.0 + 0.0 AS mmr_score
    FROM sel_{MMR_PICKS}
    """)
    return "".join(parts)


@register(
    "search_mmr_diversify",
    _sql_mmr_oracle(),
    "maximal-marginal-relevance diversification (Carbonell-Goldstein "
    "1998, lambda=0.5 exact dyadic) of per-query top-20 candidates: 5 "
    "greedy picks, each ONE small join + per-query argmax with bounded "
    "driver state (<= queries rows/step — the kmeans contract); oracle "
    "unrolls the identical iteration",
    tags=("similarity", "search", "curation"),
)
def search_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR over the brute-force top-20 candidate lists of the
    first 3 query vectors. The candidate and pairwise-similarity frames
    (≤ q·k and ≤ q·k² rows) are persisted once; each of the 5 picks is
    a max-aggregate + window argmax over those tiny frames, and the
    growing picked set stays a lazy union (k bounded, plan depth ≤ 5).
    At 100 TB the candidates COME from the ANN index (sim_ivf_* /
    banded LSH); MMR itself only ever touches q·k rows."""
    from ..operators.similarity import brute_force_topk, cosine

    emb = table(spark, sf_dir, "embeddings")
    cand = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < MMR_QUERIES), k=MMR_CAND
    ).persist()  # (query_id, vec_id, cos) — cos rounded to 6 dp inside
    vecs = emb.select("vec_id", F.col("embedding").alias("_v"))
    ps = (
        cand.select("query_id", F.col("vec_id").alias("cid"))
        .join(
            cand.select("query_id", F.col("vec_id").alias("sid")), on="query_id"
        )
        .filter(F.col("cid") != F.col("sid"))
        .join(F.broadcast(vecs.withColumnRenamed("vec_id", "cid").withColumnRenamed("_v", "_cv")), on="cid")
        .join(F.broadcast(vecs.withColumnRenamed("vec_id", "sid").withColumnRenamed("_v", "_sv")), on="sid")
        .select(
            "query_id", "cid", "sid",
            dround(cosine(F.col("_cv"), F.col("_sv")), 6).alias("sim"),
        )
        .persist()
    )
    wq = Window.partitionBy("query_id")
    first = (
        cand.withColumn("rn", F.row_number().over(wq.orderBy(F.desc("cos"), F.asc("vec_id"))))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "vec_id",
            F.lit(1).cast("bigint").alias("step"),
            (F.lit(0.5) * F.col("cos")).alias("score"),
        )
    )
    selected = first
    for t in range(2, MMR_PICKS + 1):
        sel_ids = selected.select("query_id", F.col("vec_id").alias("sid"))
        maxsim = (
            ps.join(sel_ids, on=["query_id", "sid"])
            .groupBy("query_id", "cid")
            .agg(F.max("sim").alias("maxsim"))
        )
        pick = (
            cand.join(
                sel_ids.withColumnRenamed("sid", "vec_id"),
                on=["query_id", "vec_id"],
                how="left_anti",
            )
            .join(maxsim.withColumnRenamed("cid", "vec_id"), on=["query_id", "vec_id"])
            .withColumn("score", F.lit(0.5) * (F.col("cos") - F.col("maxsim")))
            .withColumn(
                "rn", F.row_number().over(wq.orderBy(F.desc("score"), F.asc("vec_id")))
            )
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "vec_id",
                F.lit(t).cast("bigint").alias("step"),
                "score",
            )
        )
        selected = selected.unionByName(pick)
    out = selected.select(
        F.col("query_id").alias("qid"),
        "step",
        "vec_id",
        dround(F.col("score"), 7).alias("mmr_score"),
    )
    return out


# Pattern-class PII redaction (the Dolma/CCNet anonymization pass):
# RE2-safe patterns (no lookaround, no backrefs) so Spark's Java regex
# and DuckDB's RE2 match IDENTICAL spans — verified by the md5 of the
# redacted text in the oracle gate.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+?\d{3}[-.]\d{3}[-.]\d{4}"

# Deterministic PII injection for the gate: the synthetic documents
# corpus carries no real PII, so both engines append the SAME spans
# (keyed by doc_id % 4) before detecting/redacting — the op is
# exercised on real text + known-position PII.
_SQL_PII_SYNTH = """
        SELECT doc_id,
               text || CASE CAST(doc_id % 4 AS INT)
                   WHEN 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)
                               || '@example.com today'
                   WHEN 1 THEN ' server 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                               || '.7 unreachable'
                   WHEN 2 THEN ' call 555-867-5309 or +123-456-7890'
                   ELSE ''
               END AS t
        FROM documents
"""


@register(
    "text_pii_redaction",
    f"""
    WITH synth AS ({_SQL_PII_SYNTH}),
    red AS (
        SELECT doc_id, t,
               regexp_replace(regexp_replace(regexp_replace(
                   t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                      '{_PII_IP}', '[IP]', 'g'),
                      '{_PII_PHONE}', '[PHONE]', 'g') AS redacted
        FROM synth
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(
               regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
               '{_PII_IP}')) AS INT) AS n_ips,
           CAST(len(regexp_extract_all(
               regexp_replace(regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                              '{_PII_IP}', '[IP]', 'g'),
               '{_PII_PHONE}')) AS INT) AS n_phones,
           md5(redacted) AS redacted_md5
    FROM red
    WHERE doc_id % 4 < 3
    """,
    "free-text PII detection + redaction (emails, IPv4, phone "
    "numbers) with per-class counts and the redacted text's md5 — "
    "RE2-safe patterns, pure codegen regexp_replace chain, no UDF",
    tags=("curation", "pii", "text"),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-class PII anonymization over free text (the standard
    pre-training privacy pass next to pii_mask_identifiers' structured
    scrub): detect per class BEFORE redacting that class (counts use
    the text state the class's replace sees, so overlapping classes —
    an IP inside an already-redacted email domain — never double
    count), then redact email → IP → phone in one codegen
    regexp_replace chain. 100 TB shape: map-only, no shuffle, no UDF —
    the whole op is one projection inside WholeStageCodegen."""
    docs = table(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" reach user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com today"),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit(" server 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7 unreachable"),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 2,
                F.lit(" call 555-867-5309 or +123-456-7890"),
            )
            .otherwise(F.lit("")),
        ).alias("t"),
    )
    after_email = F.regexp_replace("t", _PII_EMAIL, "[EMAIL]")
    after_ip = F.regexp_replace(after_email, _PII_IP, "[IP]")
    return (
        synth.select(
            "doc_id",
            F.regexp_count("t", F.lit(_PII_EMAIL)).cast("int").alias("n_emails"),
            F.regexp_count(after_email, F.lit(_PII_IP)).cast("int").alias("n_ips"),
            F.regexp_count(after_ip, F.lit(_PII_PHONE)).cast("int").alias("n_phones"),
            F.md5(
                F.regexp_replace(after_ip, _PII_PHONE, "[PHONE]")
            ).alias("redacted_md5"),
        )
        .filter(F.col("doc_id") % 4 < 3)
    )
