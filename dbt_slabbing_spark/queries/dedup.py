"""Deduplication operators over ``documents`` (north-star LLM pipeline).

Five tiers, each with a cross-engine-portable definition so the DuckDB
oracle can verify the Spark implementation bit-for-bit:

- exact:        sha256 of raw text
- normalized:   md5 of lower/trim/whitespace-collapsed text
- minhash LSH:  8 minhash lanes (one md5 per shingle, lane i =
                (a + i*b) mod 2^32) over distinct 3-word shingles,
                4 bands × 2 rows, est. Jaccard = matching components / 8
- n-gram Jaccard: exact Jaccard over distinct 3-word shingles for pairs
                sharing ≥1 shingle
- simhash:      32-bit sign-aggregated md5 over tokens + Hamming pairs

Scale design: every pipeline is explode → partial-agg → equi-join.
Minhash shuffle volume is docs × 8 rows regardless of doc length
(map-side partial min); candidate generation is an equi-join on band
keys / shingles — no O(n²) cross join anywhere (simhash pairs use
pigeonhole block banding, see ``dedup_simhash_pairs``). The only
quadratic step (pair verification) runs on LSH-filtered candidates.

Skew defense: shingle-join candidate generation drops shingles whose
document frequency exceeds ``SHINGLE_DF_CAP`` — a boilerplate shingle
in d docs contributes d² join rows, so one hot shingle at corpus scale
is a straggler-killer. Capping df is standard near-dup practice (the
dropped shingles carry no discriminative signal); the Jaccard universe
is the CAPPED shingle set, mirrored exactly in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.hashing import (
    minhash_band_similarity_pairs,
    minhash_signatures,
    simhash_df,
)
from ..operators.text import normalized, word_shingles
from . import dround, register

# DuckDB-side normalized words (must mirror operators/text.py exactly).
_SQL_WORDS = "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"

# Max docs a shingle may appear in and still participate in candidate
# generation. 50 ≫ every df in the test corpora (max 7 at sf0.01) so
# results are unchanged there; at 100 TB it bounds any single shingle's
# join contribution to df² ≤ 2500 rows.
SHINGLE_DF_CAP = 50


def capped_shingles(docs: DataFrame, df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    """(doc_id, sh): distinct 3-word shingles, hot shingles dropped.

    The df filter is a broadcast-able aggregate (shingle → count ≤ cap);
    Spark plans it as groupBy + semi-join on ``sh``, both map-side
    combinable — no skew survives to the pair join.
    """
    shingle = docs.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(word_shingles(F.col("text"), 3))).alias("sh"),
    )
    rare = (
        shingle.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= df_cap)
        .select("sh")
    )
    return shingle.join(rare, "sh").select("doc_id", "sh")


def _jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """(id_a, id_b, jaccard): exact Jaccard over df-capped shingle sets
    for pairs sharing ≥1 (rare) shingle, filtered to ≥ threshold."""
    shingle = capped_shingles(docs)
    sizes = shingle.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingle.alias("a")
    b = shingle.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("_nb"))
    jac = F.col("n_common") / (F.col("_na") + F.col("_nb") - F.col("n_common"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", dround(jac, 4).alias("jaccard"))
    )


# Shared oracle CTEs: normalized words → distinct shingles → df cap.
_SQL_SHINGLE_CTES = f"""
    norm AS (
        SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ),
    shingle_all AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
            FROM norm
        )
    ),
    shingle AS (
        SELECT s.doc_id, s.sh
        FROM shingle_all s
        JOIN (SELECT sh FROM shingle_all GROUP BY sh
              HAVING count(*) <= {SHINGLE_DF_CAP}) rare USING (sh)
    )"""


@register(
    "dedup_exact_sha256",
    """
    SELECT sha256(text) AS content_hash,
           min(doc_id)  AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY content_hash
    """,
    "exact dedup: group by content hash, keep lowest doc_id",
    tags=("dedup",),
)
def dedup_exact_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dedup_normalized_md5",
    """
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
                   ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    "normalized dedup: surviving rows after case/whitespace-insensitive hash dedup",
    tags=("dedup",),
)
def dedup_normalized_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(normalized(F.col("text")).cast("binary"))).orderBy("doc_id")
    return (
        table(spark, sf_dir, "documents")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
    )


@register(
    "dedup_minhash_lsh",
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
    lanes AS (
        SELECT doc_id,
               ('0x' || substr(md5(sh), 1, 8))::BIGINT AS a,
               (('0x' || substr(md5(sh), 9, 8))::BIGINT) | 1 AS b
        FROM shingle
    ),
    minh AS (
        SELECT doc_id, s.seed,
               min((a + s.seed * b) & 4294967295) AS h
        FROM lanes, range(0, 8) s(seed)
        GROUP BY doc_id, s.seed
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
    pairs AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM banded l
        JOIN banded r ON l.band = r.band AND l.band_key = r.band_key
                     AND l.doc_id < r.doc_id
    )
    SELECT p.id_a, p.id_b,
           round((len(list_filter(range(1, 9), i -> sa.sig[i] = sb.sig[i])) / 8.0) * 10000.0) / 10000.0 + 0.0
               AS est_jaccard
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.id_a
    JOIN sig sb ON sb.doc_id = p.id_b
    WHERE len(list_filter(range(1, 9), i -> sa.sig[i] = sb.sig[i])) >= 4
    """,
    "MinHash+LSH near-dup: shingle → one md5 → 8 linear minhash lanes → "
    "4×2 bands → band-join candidates → signature similarity ≥ 0.5",
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True (round-robin, guide §2.5): the shingle+md5 pass is the
    # dominant cost and sits BELOW the signature exchange, so a
    # single-row-group input runs it on one core. Round-robin (not
    # hash(doc_id)) keeps the sig-agg exchange in the plan as the band
    # self-join's reuse point — hash(doc_id) would satisfy the groupBy
    # distribution, delete that exchange, and make BOTH join sides
    # recompute the md5 pass from the spread exchange (measured slower).
    # r14 A/B at sf0.1: 873 → 310 ms. No-op on well-split inputs.
    docs = table(spark, sf_dir, "documents", spread=True)
    # Fused band-join: the signature arrays ride through the band-key
    # self-join, so similarity needs no extra joins and nothing is
    # persisted (round 2 leaked a .persist() here). The self-join's two
    # sides are the same subplan shuffling on the same key — Spark
    # builds the signatures ONCE and feeds the other side from a
    # ReusedExchange (asserted in test_plan_quality).
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_words=3)
    pairs = minhash_band_similarity_pairs(sigs, "doc_id", bands=4, rows_per_band=2)
    return pairs.filter(F.col("est_jaccard") >= 0.5)


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SQL_SHINGLE_CTES},
    sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM shingle GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM shingle a JOIN shingle b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round((n_common / (sa.n_sh + sb.n_sh - n_common)) * 10000.0) / 10000.0 + 0.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.05
    """,
    "exact n-gram Jaccard over df-capped shingles: rare-shingle join "
    "candidates + set-overlap ratio ≥ 0.05",
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: spread (guide §2.5) — parallelizes the heavy pre-exchange map work
    # on single-row-group local inputs; no-op on well-split layouts.
    # Interleaved noop A/B at sf0.1 in OPTIMIZATION_r14.md §5.
    return _jaccard_pairs(table(spark, sf_dir, "documents", spread=True), threshold=0.05)


@register(
    "dedup_simhash",
    f"""
    WITH norm AS (
        SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(w) AS t FROM norm
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tok
    ),
    bits AS (
        SELECT doc_id, b.b,
               CASE WHEN 2 * count(*) FILTER (WHERE (h >> b.b) & 1 = 1) > count(*)
                    THEN (CAST(1 AS BIGINT) << b.b) ELSE 0 END AS bitval
        FROM hashed, range(0, 32) b(b)
        GROUP BY doc_id, b.b
    )
    SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
    "32-bit simhash per document (sign-aggregate of token md5 bits)",
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: spread (guide §2.5) — parallelizes the heavy pre-exchange map work
    # on single-row-group local inputs; no-op on well-split layouts.
    # Interleaved noop A/B at sf0.1 in OPTIMIZATION_r14.md §5.
    docs = table(spark, sf_dir, "documents", spread=True)
    return simhash_df(docs, "doc_id", "text")


@register(
    "dedup_simhash_pairs",
    f"""
    WITH norm AS (
        SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(w) AS t FROM norm
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tok
    ),
    bits AS (
        SELECT doc_id, b.b,
               CASE WHEN 2 * count(*) FILTER (WHERE (h >> b.b) & 1 = 1) > count(*)
                    THEN (CAST(1 AS BIGINT) << b.b) ELSE 0 END AS bitval
        FROM hashed, range(0, 32) b(b)
        GROUP BY doc_id, b.b
    ),
    sh AS (
        SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
    "simhash near-dup pairs: Hamming ≤ 6 over 32-bit simhashes, candidates "
    "via pigeonhole block banding (8×4-bit blocks → equi-join), never an "
    "all-pairs scan. The oracle states the O(n²) definition; the engine "
    "computes the identical set with a shuffle join",
    tags=("dedup", "simhash"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pigeonhole banding: split the 32-bit simhash into 8 blocks of 4
    bits. A pair with Hamming ≤ 6 differs in at most 6 blocks, so it
    MUST agree exactly on ≥ 2 of the 8 — an equi-join on
    (block_idx, block_value) finds every qualifying pair (recall 1.0),
    and the exact Hamming filter then removes false candidates. Shuffle
    volume is docs × 8 rows vs the n²/2 BroadcastNestedLoop the naive
    theta join costs (the round-1 plan this replaces).
    """
    # r14: spread (guide §2.5) — single-row-group input; no-op at scale.
    docs = table(spark, sf_dir, "documents", spread=True)
    sh = simhash_df(docs, "doc_id", "text")
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 4 * i).bitwiseAND(F.lit(15)).cast("int")
                    for i in range(8)
                ]
            )
        ).alias("block_idx", "block_val"),
    )
    a = blocks.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("_ha"), "block_idx", "block_val"
    )
    b = blocks.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("_hb"), "block_idx", "block_val"
    )
    cand = (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ha", "_hb")
        .distinct()  # a pair may share several blocks; emit it once
    )
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
    )


@register(
    "dedup_mllib_minhash_lsh",
    # The hash family is Spark-internal (seeded → deterministic but not
    # SQL-reproducible), so the oracle verifies deterministic INVARIANTS
    # of the pair set instead of raw pairs: (1) the corpus size the LSH
    # ran over (docs with ≥1 shingle, i.e. ≥3 tokens), (2) the exact
    # count of identical-after-normalization pairs — identical shingle
    # sets hash identically in every table, so approxSimilarityJoin
    # finds ALL of them (recall 1 on exact dups; DuckDB counts them
    # combinatorially from md5 groups), and (3) every emitted pair's
    # reported distance agrees with the exact shingle-set Jaccard within
    # a hash-collision tolerance (precision).
    """
    WITH norm AS (
        SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS n
        FROM documents
    ), eligible AS (
        SELECT doc_id, n FROM norm
        WHERE n <> '' AND len(string_split(n, ' ')) >= 3
    ), grp AS (
        SELECT md5(n) AS h, count(*) AS c FROM eligible GROUP BY h
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM eligible) AS n_docs,
           (SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) FROM grp)
               AS n_exact_dup_pairs_found,
           TRUE AS precision_ok
    """,
    "MLlib MinHashLSH.approxSimilarityJoin near-dup pairs (production-"
    "scale path) — oracle-checked via exact-dup recall + distance-"
    "precision verdict columns",
    tags=("dedup", "lsh", "mllib"),
)
def dedup_mllib_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mllib_lsh import mllib_minhash_pairs
    from ..operators.text import normalized

    # r14: spread (guide §2.5) — single-row-group input; no-op at scale.
    docs = table(spark, sf_dir, "documents", spread=True)
    pairs = mllib_minhash_pairs(docs)  # id_a, id_b, jaccard_distance

    # eligible corpus = docs with ≥1 shingle (≥3 tokens), matching the
    # operator's feature filter
    norm = docs.select("doc_id", normalized(F.col("text")).alias("_n")).filter(
        (F.col("_n") != "") & (F.size(F.split(F.col("_n"), " ")) >= 3)
    )
    n_docs = norm.agg(F.count(F.lit(1)).alias("n_docs"))

    # exact-dup ground truth: pairs with identical normalized text
    hashed = norm.select("doc_id", F.md5(F.col("_n").cast("binary")).alias("_h"))
    exact_pairs = (
        hashed.alias("x")
        .join(hashed.alias("y"), (F.col("x._h") == F.col("y._h")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
    )
    found = exact_pairs.join(pairs, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_exact_dup_pairs_found")
    )

    # precision: reported hashed-feature distance ⟷ exact shingle Jaccard
    toks = norm.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(F.col("_n"), 3))).alias("_t"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n_tok"))
    ta = toks.select(F.col("doc_id").alias("id_a"), F.col("_t"))
    tb = toks.select(F.col("doc_id").alias("id_b"), F.col("_t"))
    common = (
        pairs.join(ta, "id_a")
        .join(tb, ["id_b", "_t"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("_n_tok").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("_n_tok").alias("_nb"))
    exact_jac = F.col("_n_common") / (F.col("_na") + F.col("_nb") - F.col("_n_common"))
    precision = (
        pairs.join(common, ["id_a", "id_b"], "left")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            (
                F.abs((1 - F.col("jaccard_distance")) - F.coalesce(exact_jac, F.lit(0.0)))
                <= 0.05
            ).alias("_ok")
        )
        .agg(F.coalesce(F.min(F.col("_ok").cast("int")), F.lit(1)).alias("_all_ok"))
        .select((F.col("_all_ok") == 1).alias("precision_ok"))
    )
    return n_docs.crossJoin(found).crossJoin(precision)


@register(
    "dedup_connected_components",
    f"""
    WITH RECURSIVE {_SQL_SHINGLE_CTES},
    sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM shingle GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM shingle a JOIN shingle b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.2
    ),
    sym AS (
        SELECT id_a AS s, id_b AS d FROM edges
        UNION
        SELECT id_b, id_a FROM edges
    ),
    reach AS (
        SELECT s AS n, s AS label FROM sym
        UNION
        SELECT sym.d, reach.label FROM reach JOIN sym ON sym.s = reach.n
    )
    SELECT n AS doc_id, CAST(min(label) AS BIGINT) AS component
    FROM reach GROUP BY n
    """,
    "near-dup clustering: Jaccard>=0.2 df-capped shingle pairs -> "
    "undirected graph -> connected components (min doc_id = component "
    "id); the oracle computes the same closure with a recursive CTE",
    tags=("dedup", "graph"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group near-duplicate documents into clusters, not just pairs.

    Pair lists (dedup_ngram_jaccard et al.) are not directly actionable
    for dedup — keeping "one doc per pair" over-deletes when A~B~C but
    A!~C. The actionable unit is the connected component: keep one doc
    per component.

    Spark-first design: iterative min-label propagation via
    ``operators/graph.py::connected_components`` (see its docstring for
    the convergence and web-scale story; topology unit tests in
    ``test_graph_components.py``).
    """
    from ..operators.graph import connected_components

    edges = _jaccard_pairs(table(spark, sf_dir, "documents"), threshold=0.2).select(
        "id_a", "id_b"
    )
    labels = connected_components(edges, src="id_a", dst="id_b")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("component").cast("long").alias("component")
    )


@register(
    "dedup_containment_pairs",
    f"""
    WITH {_SQL_SHINGLE_CTES},
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM shingle GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_common
        FROM shingle a JOIN shingle b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, n_common,
           round((CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE)) * 10000.0) / 10000.0 + 0.0 AS c_a_in_b,
           round((CAST(n_common AS DOUBLE) / CAST(sb.n_sh AS DOUBLE)) * 10000.0) / 10000.0 + 0.0 AS c_b_in_a
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE greatest(CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE),
                   CAST(n_common AS DOUBLE) / CAST(sb.n_sh AS DOUBLE)) >= 0.6
    """,
    "directional shingle containment |A∩B|/|A| for candidate pairs — "
    "detects docs CONTAINED in larger docs (and benchmark contamination), "
    "which symmetric Jaccard misses when sizes differ",
    tags=("dedup", "containment"),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment C(A→B) = |A∩B| / |A| over df-capped shingle sets.

    Jaccard under-scores a short doc fully embedded in a long one
    (|A∩B|/|A∪B| ≈ |A|/|B| → 0), so near-dup pipelines miss quote-
    expansions and benchmark-in-crawl contamination. Containment is the
    standard fix (Broder 1997's two resemblance measures; what modern
    decontamination tooling computes per eval example).

    Same scale shape as the Jaccard pair join: candidates from the
    df-capped shingle equi-join (bounded fan-out), one aggregation for
    sizes, one for intersections — no cross join.
    """
    # r14: spread (guide §2.5) — single-row-group input; no-op at scale.
    docs = table(spark, sf_dir, "documents", spread=True)
    shingle = capped_shingles(docs)
    sizes = shingle.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingle.alias("a")
    b = shingle.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("_nb"))
    c_ab = F.col("n_common").cast("double") / F.col("_na").cast("double")
    c_ba = F.col("n_common").cast("double") / F.col("_nb").cast("double")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.greatest(c_ab, c_ba) >= 0.6)
        .select(
            "id_a",
            "id_b",
            "n_common",
            dround(c_ab, 4).alias("c_a_in_b"),
            dround(c_ba, 4).alias("c_b_in_a"),
        )
    )


@register(
    "dedup_incremental_batch",
    f"""
    WITH {_SQL_SHINGLE_CTES},
    norm_hash AS (
        SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
        FROM documents
    ),
    exact AS (
        SELECT b.doc_id, min(c.doc_id) AS match_id
        FROM norm_hash b JOIN norm_hash c ON b.h = c.h
        WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        GROUP BY b.doc_id
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM shingle GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS bid, b.doc_id AS cid, CAST(count(*) AS BIGINT) AS n_common
        FROM shingle a JOIN shingle b ON a.sh = b.sh
        WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        GROUP BY bid, cid
    ),
    near AS (
        SELECT bid AS doc_id, cid AS match_id,
               round((CAST(n_common AS DOUBLE)
                      / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)) * 10000.0) / 10000.0 + 0.0 AS jac,
               row_number() OVER (PARTITION BY bid ORDER BY
                   round((CAST(n_common AS DOUBLE)
                          / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)) * 10000.0) / 10000.0 + 0.0 DESC,
                   cid) AS rn
        FROM inter
        JOIN sizes sa ON sa.doc_id = bid
        JOIN sizes sb ON sb.doc_id = cid
        WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
    )
    SELECT b.doc_id,
           CASE WHEN e.match_id IS NOT NULL THEN 'exact'
                WHEN n.match_id IS NOT NULL THEN 'near'
                ELSE 'new' END AS verdict,
           coalesce(e.match_id, n.match_id) AS match_id,
           CASE WHEN e.match_id IS NOT NULL THEN 1.0 ELSE n.jac END AS score
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) b
    LEFT JOIN exact e USING (doc_id)
    LEFT JOIN (SELECT doc_id, match_id, jac FROM near WHERE rn = 1) n USING (doc_id)
    """,
    "incremental ingestion dedup: batch docs (odd doc_id) checked against "
    "an existing corpus (even doc_id) — exact (normalized md5 anti-join) "
    "then near-dup (capped-shingle Jaccard >= 0.5) -> exact/near/new verdict",
    tags=("dedup", "incremental"),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-crawl shape of dedup: a NEW batch is checked against an
    INDEXED corpus, never corpus x corpus. Exact dups resolve on a hash
    equi-join against the corpus hash index; near-dups on the df-capped
    shingle join restricted to batch x corpus pairs. At 100 TB the
    corpus side is a pre-materialized index (hash table + shingle
    postings), so daily cost scales with the batch, not the corpus.

    Verdict precedence: exact > near > new; near match picks the
    highest rounded Jaccard (corpus doc_id tiebreak).
    """
    # r14: spread (guide §2.5) — single-row-group input; no-op at scale.
    docs = table(spark, sf_dir, "documents", spread=True)
    is_batch = F.col("doc_id") % 2 == 1
    hashed = docs.select("doc_id", F.md5(normalized(F.col("text"))).alias("h"))
    b_hash = hashed.filter(is_batch)
    c_hash = hashed.filter(~is_batch).select(F.col("doc_id").alias("cid"), "h")
    exact = (
        b_hash.join(c_hash, "h")
        .groupBy("doc_id")
        .agg(F.min("cid").alias("e_match"))
    )

    shingle = capped_shingles(docs)
    sizes = shingle.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingle.filter(is_batch).alias("a")
    b = shingle.filter(~is_batch).alias("b")
    inter = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .groupBy(F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("cid"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id"), F.col("n_sh").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("cid"), F.col("n_sh").alias("_nb"))
    jac_raw = F.col("n_common").cast("double") / (F.col("_na") + F.col("_nb") - F.col("n_common")).cast("double")
    w = Window.partitionBy("doc_id").orderBy(F.desc("jac"), F.asc("cid"))
    near = (
        inter.join(sa, "doc_id")
        .join(sb, "cid")
        .filter(jac_raw >= 0.5)
        .withColumn("jac", dround(jac_raw, 4))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("cid").alias("n_match"), "jac")
    )

    batch = docs.filter(is_batch).select("doc_id")
    return (
        batch.join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("e_match").isNotNull(), F.lit("exact"))
            .when(F.col("n_match").isNotNull(), F.lit("near"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            F.coalesce("e_match", "n_match").alias("match_id"),
            F.when(F.col("e_match").isNotNull(), F.lit(1.0)).otherwise(F.col("jac")).alias("score"),
        )
    )


@register(
    "text_line_dedup",
    # Exact corpus-wide LINE dedup (the C4 recipe dedups repeated
    # three-sentence spans; lines are its cheapest granularity): every
    # line keeps only its FIRST occurrence across the whole corpus
    # (min doc_id, then min line_no), duplicates elsewhere are
    # dropped, and each doc reports its kept/dropped counts plus the
    # md5 of its rebuilt text so the reconstruction is hash-checked.
    """
    WITH lines AS (
        SELECT doc_id, i - 1 AS line_no, l[i] AS line
        FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents),
             LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i)
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, line_no) AS rn
        FROM lines
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped,
           md5(coalesce(string_agg(line, chr(10) ORDER BY line_no)
                            FILTER (WHERE rn = 1), '')) AS rebuilt_md5
    FROM ranked
    GROUP BY doc_id
    """,
    "corpus-wide exact line dedup (C4-style): first occurrence wins "
    "globally, per-doc kept/dropped counts + md5 of the rebuilt text",
    tags=("dedup", "text", "training"),
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: one shuffle hash-partitioned on the LINE HASH (key
    cardinality ≈ distinct lines, so the window parallelizes — this is
    not a per-source/global window), one shuffle back on doc_id for the
    rebuild. Boilerplate lines (nav bars, license headers) are exactly
    the high-df keys; their groups are deep but the window computes a
    streaming row_number, not a product."""
    docs = table(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("line_no", "line")
    )
    w = Window.partitionBy(F.md5("line")).orderBy("doc_id", "line_no")
    ranked = lines.withColumn("rn", F.row_number().over(w))
    kept_line = F.when(F.col("rn") == 1, F.col("line"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("rn") == 1).cast("int")).cast("bigint").alias("n_kept"),
        F.sum((F.col("rn") > 1).cast("int")).cast("bigint").alias("n_dropped"),
        F.md5(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("rn") == 1, F.struct("line_no", "line"))
                            )
                        ),
                        lambda s: s["line"],
                    ),
                    "\n",
                ),
                F.lit(""),
            )
        ).alias("rebuilt_md5"),
    )


@register(
    "dedup_lsh_quality_metrics",
    # Recall/precision of the minhash-LSH candidate pipeline against
    # the exact (df-capped) Jaccard truth at the same 0.5 threshold —
    # "measure, don't guess" for the dedup stack itself: the exact
    # side is the evaluation harness you run on a SAMPLE at 100 TB,
    # the LSH side is the production path.
    f"""
    WITH {_SQL_SHINGLE_CTES},
    sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM shingle GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM shingle a JOIN shingle b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
    ),
    mlanes AS (
        SELECT doc_id,
               ('0x' || substr(md5(sh), 1, 8))::BIGINT AS a,
               (('0x' || substr(md5(sh), 9, 8))::BIGINT) | 1 AS b
        FROM (SELECT DISTINCT doc_id, sh FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
                FROM norm))
    ),
    minh AS (
        SELECT doc_id, s.seed, min((a + s.seed * b) & 4294967295) AS h
        FROM mlanes, range(0, 8) s(seed) GROUP BY doc_id, s.seed
    ),
    sig AS (
        SELECT doc_id, list(h ORDER BY seed) AS sig FROM minh GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, b.band,
               CAST(sig[2*b.band + 1] AS VARCHAR) || '_' || CAST(sig[2*b.band + 2] AS VARCHAR) AS band_key
        FROM sig, range(0, 4) b(band)
    ),
    cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
    ),
    pred AS (
        SELECT c.id_a, c.id_b FROM cand c
        JOIN sig sa ON sa.doc_id = c.id_a
        JOIN sig sb ON sb.doc_id = c.id_b
        WHERE len(list_filter(range(1, 9), i -> sa.sig[i] = sb.sig[i])) >= 4
    ),
    m AS (
        SELECT (SELECT count(*) FROM truth) AS n_true,
               (SELECT count(*) FROM cand) AS n_candidates,
               (SELECT count(*) FROM pred) AS n_pred,
               (SELECT count(*) FROM pred JOIN truth USING (id_a, id_b)) AS n_hit
    )
    SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_pred AS BIGINT) AS n_pred,
           CAST(n_hit AS BIGINT) AS n_hit,
           CASE WHEN n_pred = 0 THEN NULL
                ELSE round((CAST(n_hit AS DOUBLE) / n_pred) * 10000.0) / 10000.0 + 0.0 END AS precision,
           CASE WHEN n_true = 0 THEN NULL
                ELSE round((CAST(n_hit AS DOUBLE) / n_true) * 10000.0) / 10000.0 + 0.0 END AS recall
    FROM m
    """,
    "LSH quality metrics: precision/recall of the minhash band+filter "
    "pipeline vs exact df-capped Jaccard >= 0.5 — the dedup stack "
    "measuring itself",
    tags=("dedup", "lsh", "metrics"),
)
def dedup_lsh_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One LAZY distributed plan, no driver-side counts: candidates
    (with their est filter flag) full-outer-join the exact-truth pairs
    on the pair key, then ONE scalar aggregate derives all four counts
    and both ratios — a single single-partition exchange of the
    pre-aggregated partials (the corpus invariant's budget)."""
    from ..rounding import dround as _dround

    # r14: spread (guide §2.5) — single-row-group input; no-op at scale.
    docs = table(spark, sf_dir, "documents", spread=True)
    truth = _jaccard_pairs(docs, threshold=0.5).select(
        "id_a", "id_b", F.lit(1).alias("in_true")
    )
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_words=3)
    cand = minhash_band_similarity_pairs(sigs, "doc_id", bands=4, rows_per_band=2).select(
        "id_a",
        "id_b",
        F.lit(1).alias("in_cand"),
        (F.col("est_jaccard") >= 0.5).cast("int").alias("in_pred"),
    )
    joined = cand.join(truth, ["id_a", "id_b"], "full_outer")
    pred_flag = F.coalesce("in_pred", F.lit(0))
    true_flag = F.coalesce("in_true", F.lit(0))
    agg = joined.agg(
        F.sum(true_flag).cast("bigint").alias("n_true"),
        F.sum(F.coalesce("in_cand", F.lit(0))).cast("bigint").alias("n_candidates"),
        F.sum(pred_flag).cast("bigint").alias("n_pred"),
        F.sum(pred_flag * true_flag).cast("bigint").alias("n_hit"),
    )
    return agg.select(
        "n_true",
        "n_candidates",
        "n_pred",
        "n_hit",
        F.when(
            F.col("n_pred") > 0,
            _dround(F.col("n_hit").cast("double") / F.col("n_pred"), 4),
        ).alias("precision"),
        F.when(
            F.col("n_true") > 0,
            _dround(F.col("n_hit").cast("double") / F.col("n_true"), 4),
        ).alias("recall"),
    )


@register(
    "dedup_semantic_clusters",
    # SemDeDup (Abbas et al. 2023) with a DETERMINISTIC coarse quantizer
    # so the oracle can replay the assignment exactly: centroids are the
    # 16 lowest-id vectors (the same reconstruct-without-shared-state
    # idiom as the LSH hyperplanes), squared distance is written
    # dvv - 2*dvc + dcc in the SAME association on both engines, and the
    # argmin tie-break is (distance, cell id). Cosine is rounded to 6 dp
    # before the >= 0.30 compare (sim_neardup_pairs convention).
    """
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
        FROM embeddings
    ),
    cents AS (
        -- ORDER BY/LIMIT (not `vec_id < 16`) so the seed set matches
        -- the Python side's orderBy(id).limit(n) even if the id space
        -- ever starts above 0 or has gaps below 16.
        SELECT vec_id AS cid, dv AS cv FROM v ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
        SELECT vec_id, dv, cid AS cell FROM (
            SELECT v.vec_id, v.dv, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                       (list_dot_product(v.dv, v.dv)
                        - 2 * list_dot_product(v.dv, c.cv)
                        + list_dot_product(c.cv, c.cv)), c.cid) AS rn
            FROM v, cents c
        ) WHERE rn = 1
    ),
    dups AS (
        SELECT b.vec_id, min(a.vec_id) AS dup_of
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE round((list_dot_product(a.dv, b.dv)
                     / (sqrt(list_dot_product(a.dv, a.dv))
                        * sqrt(list_dot_product(b.dv, b.dv)))) * 1000000.0)
              / 1000000.0 + 0.0 >= 0.30
        GROUP BY b.vec_id
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           (d.dup_of IS NULL) AS keep, d.dup_of
    FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id
    """,
    "SemDeDup semantic dedup over embeddings: deterministic 16-cell "
    "coarse quantizer, within-cell cosine >= 0.30 pairs, first-wins "
    "representatives — the semantic tier of the dedup modality matrix "
    "(catches paraphrases the lexical tiers can't)",
    tags=("dedup", "similarity", "semantic", "training"),
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape (operators/semdedup.py has the full story): cell
    assignment is a narrow codegen map (centroid literals, no join);
    the only quadratic work is the within-cell pair equi-join on cell
    id — Sigma |cell|^2, bounded by choosing n_cells proportional to
    corpus size, exactly the SemDeDup paper's scaling contract; verdict
    is one per-vector min-aggregation plus a left join back."""
    from ..operators.semdedup import semantic_dedup

    # r14: spread (guide §2.5) — the argmin assignment + per-row norm run
    # below the pair join's exchanges; a single-row-group input serializes
    # them on one core (semdedup noop A/B at sf0.1: 4.0 s → 1.0 s).
    emb = table(spark, sf_dir, "embeddings", spread=True)
    return semantic_dedup(emb, threshold=0.30, n_cells=16)


def _sql_semdedup_trained_oracle(k: int, iters: int, dim: int, dp: int, threshold: str) -> str:
    # dedup_semantic_clusters' oracle with the seeded quantizer swapped
    # for TRAINED cells: the Lloyd's iterations replay exactly like
    # ml_kmeans_cells (analytics_extra.py), then the within-cell pair
    # scan and first-wins verdict are byte-identical to the seeded gate.
    p = float(10**dp)
    mean_list = ", ".join(
        f"round(avg(dv[{i + 1}]) * {p}) / {p} + 0.0" for i in range(dim)
    )
    prev = "c0"
    iter_ctes = []
    for i in range(1, iters + 1):
        iter_ctes.append(f"""
    a{i} AS (
        SELECT vec_id, dv, cell FROM (
            SELECT v.vec_id, v.dv, c.cell,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                       (list_dot_product(v.dv, v.dv)
                        - 2 * list_dot_product(v.dv, c.cv)
                        + list_dot_product(c.cv, c.cv)), c.cell) AS rn
            FROM v, {prev} c
        ) WHERE rn = 1
    ),
    m{i} AS (
        SELECT cell, [{mean_list}] AS mv FROM a{i} GROUP BY cell
    ),
    c{i} AS (
        SELECT p.cell, coalesce(m.mv, p.cv) AS cv
        FROM {prev} p LEFT JOIN m{i} m ON p.cell = m.cell
    )""")
        prev = f"c{i}"
    return f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
        FROM embeddings
    ),
    c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
               dv AS cv
        FROM (SELECT vec_id, dv FROM v ORDER BY vec_id LIMIT {k})
    ),{",".join(iter_ctes)},
    assigned AS (
        SELECT vec_id, dv, cell FROM (
            SELECT v.vec_id, v.dv, c.cell,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                       (list_dot_product(v.dv, v.dv)
                        - 2 * list_dot_product(v.dv, c.cv)
                        + list_dot_product(c.cv, c.cv)), c.cell) AS rn
            FROM v, {prev} c
        ) WHERE rn = 1
    ),
    dups AS (
        SELECT b.vec_id, min(a.vec_id) AS dup_of
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE round((list_dot_product(a.dv, b.dv)
                     / (sqrt(list_dot_product(a.dv, a.dv))
                        * sqrt(list_dot_product(b.dv, b.dv)))) * 1000000.0)
              / 1000000.0 + 0.0 >= {threshold}
        GROUP BY b.vec_id
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           (d.dup_of IS NULL) AS keep, d.dup_of
    FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id
    """


@register(
    "dedup_semantic_trained",
    _sql_semdedup_trained_oracle(k=8, iters=2, dim=64, dp=9, threshold="0.30"),
    "SemDeDup over TRAINED cells (distributed Lloyd's k-means, 2 "
    "iterations): within-cell cosine >= 0.30 pairs, first-wins "
    "representatives -- the paper's production shape (trained "
    "quantizer), fully value-hash-checked including the training",
    tags=("dedup", "similarity", "semantic", "ml", "training"),
)
def dedup_semantic_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup paper's n_cells contract assumes TRAINED cells
    (Abbas 2023 uses k-means over LAION embeddings); the seeded gate
    dedup_semantic_clusters keeps the reconstruct-without-state idiom,
    and this gate adds the production shape now that operators/
    kmeans.py makes training itself SQL-replayable. Same scale story:
    training is iters x (map + k-row agg); the only quadratic work is
    the within-cell pair equi-join, Sigma|cell|^2 bounded by n_cells --
    and trained cells BALANCE the quadratic cost where seeded cells
    can concentrate it (the reason production uses them)."""
    from ..operators.kmeans import kmeans_fit
    from ..operators.semdedup import semantic_dedup

    # r14: spread (guide §2.5) — parallelizes the per-iteration argmin of
    # the training passes AND the final assignment/norm below the pair
    # join (semdedup noop 4.0 s → 1.0 s; kmeans_fit 8.1 s → 6.0 s, same
    # centroids bit-for-bit).
    emb = table(spark, sf_dir, "embeddings", spread=True)
    cents, _counts = kmeans_fit(emb, k=8, iters=2, round_dp=9)
    return semantic_dedup(emb, threshold=0.30, centroids=cents)
