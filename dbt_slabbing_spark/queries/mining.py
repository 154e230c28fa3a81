"""Pattern-mining, robust-stats and contrastive-training wave.

Six operator families a production data platform runs beside the
earlier waves (SURVEY.md §2.6 general surface; none are reference
operators — the reference is two serial pydicom scripts):

- market-basket association rules (Agrawal & Srikant 1994): support /
  confidence / lift over co-ordered brand pairs;
- PMI collocation mining (Church & Hanks 1990): the classic
  corpus-statistics phrase detector, one order below the LM gates;
- robust outlier detection via median absolute deviation (the
  3-MAD rule, Leys et al. 2013) — the robust twin of
  ``ts_anomaly_hourly_zscore``'s mean/std;
- Gini concentration profiling per group — market-concentration /
  key-skew diagnostics on integer rank sums;
- sorted-neighborhood dedup blocking (Hernández & Stolfo 1995) — the
  third candidate-generation paradigm beside hash buckets (exact) and
  LSH bands (minhash): sort, window, verify;
- deterministic contrastive negative sampling (the DPR/in-batch
  negatives shape, Karpukhin et al. 2020) — k pseudo-random negatives
  per anchor from a shifted hash bucket, reproducible across engines.

Scale notes (the 100-TB plan for each is in its docstring):
- nothing here is all-pairs: basket pairs fan out ≤ (brands/order
  choose 2); SNM candidates come from rank-block equi-joins; negative
  candidates are a broadcast-sized per-bucket top-k;
- every float that decides a rank or a filter is rounded BEFORE the
  comparison (round-before-rank), and every aggregate the driver
  hashes is integer-derived or rounded identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import text as T
from ..operators.hashing import md5_long32
from ..operators.ordering import global_row_number
from . import dround, register
from .dedup import _SQL_SHINGLE_CTES, _SQL_WORDS

# ---------------------------------------------------------------------------
# market-basket association rules (brand pairs co-ordered)
# ---------------------------------------------------------------------------


@register(
    "ml_assoc_rules_pairs",
    # Association rules over per-order brand baskets: for pair (a, b),
    # support = c_ab/N, confidence(a→b) = c_ab/c_a, lift =
    # c_ab·N/(c_a·c_b). Counts are exact integers; the three ratios
    # are rounded to 6 dp and the top-20 selection orders by the
    # ROUNDED lift with (brand_a, brand_b) tiebreak so both engines
    # pick the same set (round-before-rank).
    """
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS o, p_brand AS b
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM baskets),
    supp AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM baskets GROUP BY b),
    pairs AS (
        SELECT a.b AS brand_a, bb.b AS brand_b,
               CAST(count(*) AS BIGINT) AS pair_count
        FROM baskets a JOIN baskets bb ON a.o = bb.o AND a.b < bb.b
        GROUP BY brand_a, brand_b
    )
    SELECT brand_a, brand_b, pair_count,
           round(CAST(pair_count AS DOUBLE) / n_orders
                 * 1000000.0) / 1000000.0 + 0.0 AS support,
           round(CAST(pair_count AS DOUBLE) / sa.c
                 * 1000000.0) / 1000000.0 + 0.0 AS confidence,
           round(CAST(pair_count AS DOUBLE) * n_orders
                 / (CAST(sa.c AS DOUBLE) * sb.c)
                 * 1000000.0) / 1000000.0 + 0.0 AS lift
    FROM pairs
    JOIN supp sa ON sa.b = brand_a
    JOIN supp sb ON sb.b = brand_b
    CROSS JOIN n
    WHERE pair_count >= 3
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
    "market-basket association rules over co-ordered brand pairs: "
    "support, confidence and lift from exact basket counts, top-20 "
    "pairs by 6-dp lift",
    tags=("ml", "mining", "join"),
)
def ml_assoc_rules_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100-TB shape: baskets come from one lineitem⋈part shuffle
    equi-join (part is NOT broadcast — 200 M rows at SF1000) followed
    by a distinct on (order, brand); the pair self-join is keyed on
    the ORDER key, so per-order fan-out is bounded by the basket
    width (≤ 7 lines → ≤ 21 pairs), never by the corpus. The brand
    support dim (≤ |brands| rows) and the scalar basket count (the
    query's one single-partition exchange) broadcast back, and the
    top-20 is a TakeOrdered — no global rank window."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    n = baskets.agg(F.count_distinct("o").cast("bigint").alias("n_orders"))
    supp = baskets.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a, bb = baskets.alias("a"), baskets.alias("bb")
    pairs = (
        a.join(bb, (F.col("a.o") == F.col("bb.o")) & (F.col("a.b") < F.col("bb.b")))
        .groupBy(F.col("a.b").alias("brand_a"), F.col("bb.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .filter(F.col("pair_count") >= 3)
    )
    sa = supp.select(F.col("b").alias("brand_a"), F.col("c").alias("_ca"))
    sb = supp.select(F.col("b").alias("brand_b"), F.col("c").alias("_cb"))
    scored = (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "pair_count",
            dround(F.col("pair_count").cast("double") / F.col("n_orders"), 6).alias(
                "support"
            ),
            dround(F.col("pair_count").cast("double") / F.col("_ca"), 6).alias(
                "confidence"
            ),
            dround(
                F.col("pair_count").cast("double")
                * F.col("n_orders")
                / (F.col("_ca").cast("double") * F.col("_cb")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "brand_a", "brand_b").limit(20)


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


@register(
    "text_pmi_collocations",
    # Pointwise mutual information of adjacent word pairs:
    # pmi = ln((c_xy/B) / ((c_x/T)(c_y/T))) with T = total tokens and
    # B = total bigrams, BOTH from one aggregate over the word arrays
    # (so the corpus invariant's single-partition budget is spent
    # once). Pairs with count >= 5; top-20 by 6-dp PMI,
    # (w1, w2) tiebreak.
    f"""
    WITH d AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
    stats AS (
        SELECT CAST(sum(len(w)) AS BIGINT) AS t,
               CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS bt
        FROM d
    ),
    bg AS (
        SELECT w[u.i] AS w1, w[u.i + 1] AS w2
        FROM d, UNNEST(generate_series(1, len(d.w) - 1)) AS u(i)
        WHERE len(d.w) > 1
    ),
    c2 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
        FROM bg GROUP BY w1, w2
    ),
    c1 AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(w) AS tok FROM d WHERE len(w) > 0) GROUP BY tok
    )
    SELECT w1, w2, pair_count,
           round(ln((CAST(pair_count AS DOUBLE) / bt)
                    / ((CAST(ca.c AS DOUBLE) / t)
                       * (CAST(cb.c AS DOUBLE) / t)))
                 * 1000000.0) / 1000000.0 + 0.0 AS pmi
    FROM c2
    JOIN c1 ca ON ca.tok = c2.w1
    JOIN c1 cb ON cb.tok = c2.w2
    CROSS JOIN stats
    WHERE pair_count >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
    "PMI collocation mining (Church & Hanks 1990): top-20 adjacent "
    "word pairs by 6-dp pointwise mutual information, min pair "
    "count 5",
    tags=("text", "mining", "nlp"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100-TB shape follows text_bigram_surprisal exactly: bigram
    extraction is a map-only arrays_zip (no positions join); the
    bigram count table is the big dim and stays a shuffle output; the
    unigram dim broadcasts (bounded by vocabulary, same call as the
    surprisal gate); T and B fold into ONE aggregate over the word
    arrays so the scalar attach is the query's single
    single-partition exchange. ln parity rides the established libm
    agreement; the rank orders by ROUNDED pmi with a total tiebreak."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.words(F.col("text")).alias("w")
    )
    stats = docs.agg(
        F.sum(F.size("w")).cast("bigint").alias("t"),
        F.sum(F.greatest(F.size("w") - 1, F.lit(0))).cast("bigint").alias("bt"),
    )
    bg = (
        docs.filter(F.size("w") > 1)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("w"), 1, F.size("w") - 1).alias("w1"),
                    F.slice(F.col("w"), 2, F.size("w") - 1).alias("w2"),
                )
            ).alias("_b")
        )
        .select(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    )
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .filter(F.col("pair_count") >= 5)
    )
    c1 = (
        docs.filter(F.size("w") > 0)
        .select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ca = c1.select(F.col("tok").alias("w1"), F.col("c").alias("_ca"))
    cb = c1.select(F.col("tok").alias("w2"), F.col("c").alias("_cb"))
    scored = (
        c2.join(F.broadcast(ca), "w1")
        .join(F.broadcast(cb), "w2")
        .crossJoin(F.broadcast(stats))
        .select(
            "w1",
            "w2",
            "pair_count",
            dround(
                F.log(
                    (F.col("pair_count").cast("double") / F.col("bt"))
                    / (
                        (F.col("_ca").cast("double") / F.col("t"))
                        * (F.col("_cb").cast("double") / F.col("t"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(20)


# ---------------------------------------------------------------------------
# robust outliers: the 3-MAD rule
# ---------------------------------------------------------------------------


@register(
    "profile_mad_outliers",
    # Median / median-absolute-deviation outlier profile per event
    # type: med and MAD are exact interpolated medians (both engines
    # use the type-7 (n-1)q rule), each rounded to 6 dp BEFORE reuse
    # so the deviation column and the 3-MAD threshold are
    # integer-at-1e-6 on both sides — no float-noise boundary flips.
    """
    WITH med AS (
        SELECT event_type,
               round(quantile_cont(value, 0.5) * 1000000.0) / 1000000.0 + 0.0
                   AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, m.med,
               round(abs(e.value - m.med) * 1000000.0) / 1000000.0 + 0.0 AS dev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               round(quantile_cont(dev, 0.5) * 1000000.0) / 1000000.0 + 0.0
                   AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           min(d.med) AS median_value,
           min(m.mad) AS mad_value,
           CAST(sum(CASE WHEN d.dev >
                         round(3 * m.mad * 1000000.0) / 1000000.0 + 0.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN d.dev >
                               round(3 * m.mad * 1000000.0) / 1000000.0 + 0.0
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                 * 1000000.0) / 1000000.0 + 0.0 AS outlier_frac
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    "robust outlier profile per event type (3-MAD rule, Leys et al. "
    "2013): exact median and median absolute deviation of value, "
    "count and fraction beyond 3 MADs",
    tags=("profile", "stats", "quality"),
)
def profile_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The robust twin of ts_anomaly_hourly_zscore's mean/std: medians
    resist the very outliers they flag. Plan: two passes over events,
    each a map-side-combinable group-by on event_type (≤ a handful of
    groups) with the tiny med/MAD dims broadcast back — no
    single-partition exchange at all. At 100 TB the exact per-group
    median is one sort-based agg per pass; an approx_percentile swap
    is a one-line relaxation if the two passes ever dominate."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        dround(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        dround(F.abs(F.col("value") - F.col("med")), 6).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(
        dround(F.percentile("dev", F.lit(0.5)), 6).alias("mad")
    )
    is_out = (F.col("dev") > dround(F.lit(3) * F.col("mad"), 6)).cast("int")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("med").alias("median_value"),
            F.min("mad").alias("mad_value"),
            F.sum(is_out).cast("bigint").alias("n_outliers"),
            dround(
                F.sum(is_out).cast("double") / F.count(F.lit(1)), 6
            ).alias("outlier_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Gini concentration per nation
# ---------------------------------------------------------------------------


@register(
    "profile_gini_concentration",
    # Gini coefficient of per-customer order counts within each
    # nation, via the sorted-rank identity
    #   G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)
    # over x ascending: both Σ terms are exact integers (rank ties
    # among equal x don't change Σ i·x_i), so the only float op is
    # the final division, rounded to 6 dp.
    """
    WITH cnt AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS x
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT n.n_name, cnt.x,
               row_number() OVER (PARTITION BY n.n_name
                                  ORDER BY cnt.x, c.c_custkey) AS i
        FROM cnt
        JOIN customer c ON c.c_custkey = cnt.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(x) AS BIGINT) AS total_orders,
           round((2.0 * CAST(sum(i * x) AS DOUBLE)
                  - (count(*) + 1.0) * CAST(sum(x) AS DOUBLE))
                 / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
                 * 1000000.0) / 1000000.0 + 0.0 AS gini
    FROM ranked GROUP BY n_name
    """,
    "Gini concentration of order counts across customers per nation: "
    "integer rank-sum identity, one window + one aggregate, 6-dp "
    "coefficient",
    tags=("profile", "stats", "window"),
)
def profile_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew / market-concentration diagnostics — the per-group
    answer to \"how concentrated is this join key?\" before picking a
    salting strategy. Plan: one group-by on custkey, two broadcast dim
    joins (customer/nation are dims), ONE nation-partitioned window
    (never single-partition), one aggregate. The rank sums stay exact
    int64 well past SF1000 (6 M customers/nation × rank ≤ 6e6 × x ≤
    50 → Σ ≈ 1.8e15 < 2^63)."""
    cnt = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ranked = (
        cnt.join(F.broadcast(cust), cnt.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .withColumn(
            "i",
            F.row_number().over(
                Window.partitionBy("n_name").orderBy("x", "c_custkey")
            ),
        )
    )
    n = F.count(F.lit(1))
    s0 = F.sum("x")
    s1 = F.sum(F.col("i") * F.col("x"))
    return ranked.groupBy("n_name").agg(
        n.cast("bigint").alias("n_customers"),
        s0.cast("bigint").alias("total_orders"),
        dround(
            (F.lit(2.0) * s1.cast("double") - (n + F.lit(1.0)) * s0.cast("double"))
            / (n.cast("double") * s0.cast("double")),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# sorted-neighborhood dedup blocking
# ---------------------------------------------------------------------------

_SNM_WINDOW = 8
_SNM_MIN_JACCARD = 0.25


@register(
    "dedup_sorted_neighborhood",
    # Sorted-neighborhood method: sort by a key (first three words),
    # compare each record to the next w=8 in sort order, verify with
    # exact trigram-shingle Jaccard >= 0.25. The oracle expresses the
    # neighborhood as a rank band join; the engine as rank-block
    # equi-joins (same pairs).
    f"""
    WITH d AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
    keyed AS (
        SELECT doc_id,
               coalesce(w[1], '') || ' ' || coalesce(w[2], '') || ' '
                   || coalesce(w[3], '') AS snm_key
        FROM d
    ),
    ranked AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY snm_key, doc_id) AS r
        FROM keyed
    ),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(b.r - a.r AS INT) AS gap
        FROM ranked a
        JOIN ranked b ON b.r > a.r AND b.r <= a.r + {_SNM_WINDOW}
    ),
    sh AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
            FROM d
        )
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT c.id_a, c.id_b, c.gap, CAST(count(*) AS BIGINT) AS n_common
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
        GROUP BY c.id_a, c.id_b, c.gap
    )
    SELECT i.id_a, i.id_b, i.gap,
           round(CAST(n_common AS DOUBLE)
                 / (za.n_sh + zb.n_sh - n_common)
                 * 10000.0) / 10000.0 + 0.0 AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.id_a
    JOIN sizes zb ON zb.doc_id = i.id_b
    WHERE CAST(n_common AS DOUBLE) / (za.n_sh + zb.n_sh - n_common)
          >= {_SNM_MIN_JACCARD}
    """,
    "sorted-neighborhood dedup (Hernandez & Stolfo 1995): sort by "
    "first-3-words key, candidate pairs within a rank window of 8, "
    "exact trigram Jaccard >= 0.25 verification",
    tags=("dedup", "mining"),
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third candidate-generation paradigm in the dedup matrix
    (hash buckets = exact, LSH bands = minhash, sorted neighborhood =
    key locality). 100-TB shape: the global rank comes from
    operators/ordering.global_row_number (range partition + per-
    partition offsets — its tiny offset window is a single-partition
    exchange over #partitions rows, not data rows; the self-join
    plans it once per side, hence this query's budget of 2 in the
    plan-invariant suite); candidates come from ONE explode-probe
    block equi-join (each anchor probes blocks (r-1)//w and +1)
    filtered to 0<gap<=w — never a full range join;
    verification joins shingles on (doc, shingle) keys, quadratic only
    within the w-bounded candidate set."""
    pairs = _snm_verified_pairs(spark, sf_dir)
    return pairs.select("id_a", "id_b", "gap", dround(F.col("_jac"), 4).alias("jaccard"))


def _snm_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, gap, _jac): sorted-neighborhood candidate pairs
    (rank-window w, id_a = lower rank) verified at uncapped trigram
    Jaccard >= ``_SNM_MIN_JACCARD`` (``_jac`` unrounded). Shared by
    the SNM gate and the entity-resolution pipeline."""
    return snm_pairs_over(table(spark, sf_dir, "documents").select("doc_id", "text"))


def snm_pairs_over(docs: DataFrame) -> DataFrame:
    """The SNM pipeline over an arbitrary (doc_id, text) frame — the
    injection point for the hypothesis property test, which runs it on
    generated corpora (dup keys, short docs, empty texts)."""
    # let-bind the word array through a 1-element transform (the
    # word_shingles trick) so the regex split runs once, not thrice
    snm_key = F.element_at(
        F.transform(
            F.array(T.words(F.col("text"))),
            lambda w: F.concat_ws(
                " ",
                F.coalesce(F.get(w, 0), F.lit("")),
                F.coalesce(F.get(w, 1), F.lit("")),
                F.coalesce(F.get(w, 2), F.lit("")),
            ),
        ),
        1,
    )
    keyed = docs.select("doc_id", snm_key.alias("snm_key"))
    ranked = global_row_number(
        keyed, [F.col("snm_key"), F.col("doc_id")], out_col="r"
    ).withColumn("blk", F.floor((F.col("r") - 1) / _SNM_WINDOW).cast("bigint"))
    # explode-probe: each anchor probes its own rank block AND the next
    # one (a pair at gap<=w spans at most two w-blocks), so ONE block
    # equi-join covers the whole neighborhood — no union, no range join.
    # A (a,b) pair matches exactly one probe value (blocks are unique
    # per row), so no dedup pass is needed.
    a = ranked.select(
        F.col("doc_id").alias("id_a"),
        F.col("r").alias("ra"),
        F.explode(F.array(F.col("blk"), F.col("blk") + 1)).alias("pb"),
    )
    b = ranked.select(
        F.col("doc_id").alias("id_b"), F.col("r").alias("rb"), F.col("blk").alias("bb")
    )
    cand = (
        a.join(b, F.col("bb") == F.col("pb"))
        .filter(
            (F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + _SNM_WINDOW)
        )
        .select("id_a", "id_b", (F.col("rb") - F.col("ra")).cast("int").alias("gap"))
    )
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(T.word_shingles(F.col("text"), 3))).alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("_sha"))
    sb = sh.select(F.col("doc_id").alias("_idb"), F.col("sh").alias("_shb"))
    inter = (
        cand.join(sa, "id_a")
        .join(
            sb,
            (F.col("_shb") == F.col("_sha")) & (F.col("_idb") == F.col("id_b")),
        )
        .groupBy("id_a", "id_b", "gap")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("_na"))
    zb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("_nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("n_common")
    )
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .filter(jac >= _SNM_MIN_JACCARD)
        .select("id_a", "id_b", "gap", jac.alias("_jac"))
    )


# ---------------------------------------------------------------------------
# contrastive negative sampling
# ---------------------------------------------------------------------------

_NEG_BUCKETS = 64
_NEG_K = 4


@register(
    "train_contrastive_negatives",
    # Deterministic negative mining for contrastive training (the
    # DPR in-batch-negatives shape): every doc hashes to one of 64
    # buckets (seeded md5); its k=4 negatives are the top-4 docs of
    # the NEXT bucket by a second md5 order. Anchor and negative are
    # in different buckets by construction, so no self-pairs.
    f"""
    WITH b AS (
        SELECT doc_id,
               ('0x' || substr(md5('neg|' || CAST(doc_id AS VARCHAR)), 1, 8))
                   ::BIGINT % {_NEG_BUCKETS} AS bucket,
               md5('negrank|' || CAST(doc_id AS VARCHAR)) AS rkey
        FROM documents
    ),
    negs AS (
        SELECT bucket, negative_id, neg_rank FROM (
            SELECT bucket, doc_id AS negative_id,
                   CAST(row_number() OVER (PARTITION BY bucket
                                           ORDER BY rkey, doc_id) AS INT)
                       AS neg_rank
            FROM b
        ) WHERE neg_rank <= {_NEG_K}
    )
    SELECT a.doc_id AS anchor_id, n.neg_rank, n.negative_id
    FROM b a JOIN negs n ON n.bucket = (a.bucket + 1) % {_NEG_BUCKETS}
    """,
    "deterministic contrastive negative sampling: k=4 pseudo-random "
    "negatives per anchor document from a shifted md5 bucket, "
    "reproducible across engines and runs",
    tags=("training", "sampling", "ml"),
)
def train_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pair generation without a shuffle of the corpus: the
    negative pool is a per-bucket top-k (keyed window, WindowGroupLimit
    pushes the k filter below the sort) of B·k = 256 rows, BROADCAST to
    the anchors — the anchor side never moves. Determinism comes from
    the seeded-md5 bucket and rank keys (same idiom as the sampling
    suite), so a re-run — or the DuckDB oracle — mines the identical
    pairs. At 100 TB, raise B so B·k stays a broadcast-sized pool while
    per-anchor negatives stay collision-free."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    b = docs.select(
        "doc_id",
        (
            md5_long32(F.concat(F.lit("neg|"), F.col("doc_id").cast("string")))
            % _NEG_BUCKETS
        ).alias("bucket"),
        F.md5(F.concat(F.lit("negrank|"), F.col("doc_id").cast("string"))).alias(
            "rkey"
        ),
    )
    w = Window.partitionBy("bucket").orderBy("rkey", "doc_id")
    negs = (
        b.withColumn("neg_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("neg_rank") <= _NEG_K)
        .select(
            F.col("bucket").alias("_nb"),
            F.col("doc_id").alias("negative_id"),
            "neg_rank",
        )
    )
    return (
        b.select(
            F.col("doc_id").alias("anchor_id"),
            ((F.col("bucket") + 1) % _NEG_BUCKETS).alias("_tgt"),
        )
        .join(F.broadcast(negs), F.col("_nb") == F.col("_tgt"))
        .select("anchor_id", "neg_rank", "negative_id")
    )


# ---------------------------------------------------------------------------
# multi-pass-blocking entity resolution
# ---------------------------------------------------------------------------


@register(
    "dedup_entity_resolution",
    # End-to-end entity resolution with MULTI-PASS blocking (the
    # Hernandez & Stolfo multi-pass rule: one blocking key misses what
    # another catches): pass 1 = sorted-neighborhood pairs at uncapped
    # trigram Jaccard >= 0.25, pass 2 = df-capped shingle-sharing
    # pairs at Jaccard >= 0.2; the union feeds a connected-components
    # closure and each entity emits one golden record (min doc_id =
    # entity id, member/source counts, max n_chars).
    f"""
    WITH RECURSIVE {{shingles}},
    csizes AS (
        SELECT doc_id, count(*) AS n_sh FROM shingle GROUP BY doc_id
    ),
    cinter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM shingle a JOIN shingle b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    jedges AS (
        SELECT id_a, id_b FROM cinter
        JOIN csizes sa ON sa.doc_id = id_a
        JOIN csizes sb ON sb.doc_id = id_b
        WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.2
    ),
    keyed AS (
        SELECT doc_id,
               coalesce(w[1], '') || ' ' || coalesce(w[2], '') || ' '
                   || coalesce(w[3], '') AS snm_key
        FROM norm
    ),
    ranked AS (
        SELECT doc_id, row_number() OVER (ORDER BY snm_key, doc_id) AS r
        FROM keyed
    ),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ranked a
        JOIN ranked b ON b.r > a.r AND b.r <= a.r + {_SNM_WINDOW}
    ),
    usizes AS (
        SELECT doc_id, count(*) AS n_sh FROM shingle_all GROUP BY doc_id
    ),
    uinter AS (
        SELECT c.id_a, c.id_b, count(*) AS n_common
        FROM cand c
        JOIN shingle_all sa ON sa.doc_id = c.id_a
        JOIN shingle_all sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
        GROUP BY c.id_a, c.id_b
    ),
    sedges AS (
        SELECT least(i.id_a, i.id_b) AS id_a,
               greatest(i.id_a, i.id_b) AS id_b
        FROM uinter i
        JOIN usizes za ON za.doc_id = i.id_a
        JOIN usizes zb ON zb.doc_id = i.id_b
        WHERE CAST(n_common AS DOUBLE) / (za.n_sh + zb.n_sh - n_common)
              >= {_SNM_MIN_JACCARD}
    ),
    edges AS (
        SELECT id_a, id_b FROM jedges
        UNION
        SELECT id_a, id_b FROM sedges
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
    ),
    comp AS (SELECT n AS doc_id, min(label) AS entity_id FROM reach GROUP BY n)
    SELECT CAST(c.entity_id AS BIGINT) AS entity_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
           CAST(max(d.n_chars) AS BIGINT) AS max_n_chars
    FROM comp c JOIN documents d USING (doc_id)
    GROUP BY c.entity_id
    """.replace("{shingles}", _SQL_SHINGLE_CTES),
    "end-to-end entity resolution: multi-pass blocking (sorted "
    "neighborhood + shingle sharing) -> Jaccard-verified edges -> "
    "connected components -> one golden record per entity",
    tags=("dedup", "graph", "pipeline"),
)
def dedup_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The record-linkage capstone over the dedup kernels: multi-pass
    blocking unions two CHEAP candidate generators with different
    failure modes (key-locality misses reordered prefixes; shingle
    sharing misses short docs and is df-capped for skew), so recall
    comes from the union while each pass stays equi-join-shaped.
    100-TB shape: both passes are the already-audited SNM / capped-
    shingle plans (the SNM ordering-kernel offset window keeps this
    query's single-partition budget at 2); the closure is the
    iterative min-label propagation of operators/graph.py (diameter-
    bounded rounds, each one keyed shuffle); golden-record emission is
    one doc-keyed join + one aggregate. Oracle: both passes replayed
    inline, closure as a recursive CTE (the dedup_connected_components
    pattern)."""
    from ..operators.graph import connected_components

    from .dedup import _jaccard_pairs

    snm = _snm_verified_pairs(spark, sf_dir).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    )
    docs = table(spark, sf_dir, "documents")
    jac = _jaccard_pairs(docs, threshold=0.2).select("id_a", "id_b")
    edges = snm.unionByName(jac).distinct()
    labels = connected_components(edges, src="id_a", dst="id_b")
    return (
        labels.join(docs, labels.node == docs.doc_id)
        .groupBy(F.col("component").cast("bigint").alias("entity_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.max("n_chars").cast("bigint").alias("max_n_chars"),
        )
    )


@register(
    "ml_calibration_bins",
    # Model-calibration audit (reliability diagram + expected
    # calibration error, Guo et al. 2017): decile-bin a model score,
    # compare each bin's mean predicted probability to its observed
    # positive rate, and fold the bins into the ECE scalar. The
    # "model" is the deterministic hash-uniform score
    # (o_orderkey % 9973) / 9973 against the o_orderstatus='F' label,
    # so the gate pins the OPERATOR arithmetic, not a trained model:
    # every per-bin statistic reduces to exact integers (score sums
    # stay integer via the % 9973 numerator), and ECE's numerator
    # |9973·n_pos − Σscore_num| is an exact integer too — one double
    # division per output cell, bit-identical cross-engine.
    """
    WITH s AS (
        SELECT CAST(o_orderkey % 9973 AS BIGINT) AS num,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
        FROM orders
    ),
    b AS (
        SELECT least(CAST(floor(num * 10.0 / 9973.0) AS INT), 9) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(num) AS BIGINT) AS s_num,
               CAST(sum(label) AS BIGINT) AS n_pos
        FROM s GROUP BY bin
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM b)
    SELECT bin, n,
           round(s_num / (9973.0 * n) * 1000000.0) / 1000000.0 + 0.0
               AS mean_score,
           round(CAST(n_pos AS DOUBLE) / n * 1000000.0) / 1000000.0 + 0.0
               AS obs_rate,
           round((SELECT sum(abs(9973 * n_pos - s_num)) / (9973.0 * t.n_total)
                  FROM b) * 1000000.0) / 1000000.0 + 0.0 AS ece
    FROM b, t
    """,
    "calibration reliability bins: decile-binned deterministic score "
    "vs observed positive rate per bin, with the expected calibration "
    "error riding every row as a broadcast scalar",
    tags=("ml", "stats"),
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One map-side-combinable 10-key aggregate over the scan, then the
    ECE folds from the 10-row bin table (a zero-grouping-key aggregate
    crossJoined back as the query's one broadcast scalar) — the
    reliability-diagram shape at any scale. Integer numerators make
    mean/rate/ECE each a single double division."""
    orders = table(spark, sf_dir, "orders")
    s = orders.select(
        (F.col("o_orderkey") % 9973).cast("bigint").alias("num"),
        (F.col("o_orderstatus") == "F").cast("int").alias("label"),
    )
    b = s.groupBy(
        F.least(F.floor(F.col("num") * 10.0 / 9973.0).cast("int"), F.lit(9)).alias(
            "bin"
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("num").cast("bigint").alias("s_num"),
        F.sum("label").cast("bigint").alias("n_pos"),
    )
    ece = b.agg(
        (
            F.sum(F.abs(F.lit(9973) * F.col("n_pos") - F.col("s_num")))
            / (9973.0 * F.sum("n"))
        ).alias("_ece")
    )
    return (
        b.crossJoin(F.broadcast(ece))
        .select(
            "bin",
            "n",
            dround(F.col("s_num") / (9973.0 * F.col("n")), 6).alias("mean_score"),
            dround(F.col("n_pos").cast("double") / F.col("n"), 6).alias("obs_rate"),
            dround(F.col("_ece"), 6).alias("ece"),
        )
    )


@register(
    "ml_ols_normal_equations",
    # Closed-form multivariate OLS (normal equations, Cramer's rule):
    # l_extendedprice ~ l_quantity + l_discount over lineitem. The d=2
    # feature moments (X'X, X'y, y'y) accumulate as EXACT integers —
    # price rounds to whole dollars, discount to integer cents, so
    # every sum is a BIGINT — and the 3x3 solve + R² are pure double
    # polynomials over those integers, written with IDENTICAL
    # association order in both engines (casts to DOUBLE before any
    # product that could overflow BIGINT). One map-side-combinable
    # aggregate touches the data; the solve is O(d³) on one row.
    """
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS BIGINT)   AS sq,
               CAST(sum(d) AS BIGINT)   AS sd,
               CAST(sum(q * q) AS BIGINT) AS sqq,
               CAST(sum(q * d) AS BIGINT) AS sqd,
               CAST(sum(d * d) AS BIGINT) AS sdd,
               CAST(sum(y) AS BIGINT)   AS sy,
               CAST(sum(q * y) AS BIGINT) AS sqy,
               CAST(sum(d * y) AS BIGINT) AS sdy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM (
            SELECT CAST(l_quantity AS BIGINT) AS q,
                   CAST(round(l_discount * 100.0) AS BIGINT) AS d,
                   CAST(round(l_extendedprice) AS BIGINT) AS y
            FROM lineitem
        )
    ),
    f AS (
        SELECT n,
               CAST(n AS DOUBLE) AS fn, CAST(sq AS DOUBLE) AS fsq,
               CAST(sd AS DOUBLE) AS fsd, CAST(sqq AS DOUBLE) AS fsqq,
               CAST(sqd AS DOUBLE) AS fsqd, CAST(sdd AS DOUBLE) AS fsdd,
               CAST(sy AS DOUBLE) AS fsy, CAST(sqy AS DOUBLE) AS fsqy,
               CAST(sdy AS DOUBLE) AS fsdy, CAST(syy AS DOUBLE) AS fsyy
        FROM m
    ),
    s AS (
        SELECT n, fsy, fsqy, fsdy, fsyy, fn,
               fn * (fsqq * fsdd - fsqd * fsqd)
                 - fsq * (fsq * fsdd - fsqd * fsd)
                 + fsd * (fsq * fsqd - fsqq * fsd) AS det,
               fsy * (fsqq * fsdd - fsqd * fsqd)
                 - fsq * (fsqy * fsdd - fsqd * fsdy)
                 + fsd * (fsqy * fsqd - fsqq * fsdy) AS det0,
               fn * (fsqy * fsdd - fsqd * fsdy)
                 - fsy * (fsq * fsdd - fsqd * fsd)
                 + fsd * (fsq * fsdy - fsqy * fsd) AS det1,
               fn * (fsqq * fsdy - fsqy * fsqd)
                 - fsq * (fsq * fsdy - fsqy * fsd)
                 + fsy * (fsq * fsqd - fsqq * fsd) AS det2
        FROM f
    )
    SELECT n,
           round(det0 / det * 1000000.0) / 1000000.0 + 0.0 AS b0,
           round(det1 / det * 1000000.0) / 1000000.0 + 0.0 AS b1,
           round(det2 / det * 1000000.0) / 1000000.0 + 0.0 AS b2,
           round((1.0 - (fsyy - (det0 / det) * fsy - (det1 / det) * fsqy
                              - (det2 / det) * fsdy)
                      / (fsyy - fsy * fsy / fn)) * 1000000.0)
               / 1000000.0 + 0.0 AS r2
    FROM s
    """,
    "closed-form OLS via normal equations + Cramer (price ~ quantity + "
    "discount): exact-integer moment aggregate, 3x3 solve, coefficients "
    "and R² at 6 dp",
    tags=("ml", "stats"),
)
def ml_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d-features generalization of udf_grouped_ols_slope's 1-D fit
    and the exact-linear-algebra sibling of ml_logreg_gd's iterative
    path: at 100 TB the ONLY data-sized step is one combinable
    aggregate producing the (d+1)x(d+2)/2 integer moments; the solve is
    a driver-side O(d³) on one collected row (bounded, like the kmeans
    k-row contract). The Python Cramer below mirrors the oracle's
    double polynomials term-for-term, so both engines run the same
    IEEE expression tree."""
    li = table(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_discount") * 100.0).cast("bigint").alias("d"),
        F.round(F.col("l_extendedprice")).cast("bigint").alias("y"),
    )
    m = src.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sqq"),
        F.sum(F.col("q") * F.col("d")).cast("bigint").alias("sqd"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("q") * F.col("y")).cast("bigint").alias("sqy"),
        F.sum(F.col("d") * F.col("y")).cast("bigint").alias("sdy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    ).collect()[0]  # bounded: one moments row
    import math

    fn, fsq, fsd = float(m["n"]), float(m["sq"]), float(m["sd"])
    fsqq, fsqd, fsdd = float(m["sqq"]), float(m["sqd"]), float(m["sdd"])
    fsy, fsqy, fsdy, fsyy = (
        float(m["sy"]), float(m["sqy"]), float(m["sdy"]), float(m["syy"])
    )
    det = (
        fn * (fsqq * fsdd - fsqd * fsqd)
        - fsq * (fsq * fsdd - fsqd * fsd)
        + fsd * (fsq * fsqd - fsqq * fsd)
    )
    det0 = (
        fsy * (fsqq * fsdd - fsqd * fsqd)
        - fsq * (fsqy * fsdd - fsqd * fsdy)
        + fsd * (fsqy * fsqd - fsqq * fsdy)
    )
    det1 = (
        fn * (fsqy * fsdd - fsqd * fsdy)
        - fsy * (fsq * fsdd - fsqd * fsd)
        + fsd * (fsq * fsdy - fsqy * fsd)
    )
    det2 = (
        fn * (fsqq * fsdy - fsqy * fsqd)
        - fsq * (fsq * fsdy - fsqy * fsd)
        + fsy * (fsq * fsqd - fsqq * fsd)
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    r2 = 1.0 - (fsyy - b0 * fsy - b1 * fsqy - b2 * fsdy) / (fsyy - fsy * fsy / fn)

    def _r6(v: float) -> float:
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6 + 0.0

    return spark.createDataFrame(
        [(m["n"], _r6(b0), _r6(b1), _r6(b2), _r6(r2))],
        "n bigint, b0 double, b1 double, b2 double, r2 double",
    )


@register(
    "ml_auc_rank_sum",
    # Exact ROC-AUC via the Mann-Whitney rank-sum identity with tie
    # correction:
    #   AUC = (Σ_{distinct s} pos_s · (neg_below_s + neg_s/2)) / (P·N)
    # i.e. each positive beats every negative with a lower score and
    # half of the tied negatives. Scores are the deterministic
    # hash-uniform (o_orderkey % 9973); labels o_orderstatus='F'. The
    # per-score histogram is ONE keyed aggregate (≤ 9973 rows, bounded
    # by the modulus literal), the cumulative negative count is a
    # window over that bounded table, and the final division is exact
    # integers → one double op. No global sort over data ever happens —
    # the classic histogram-AUC for bounded/quantized scores (the way
    # production eval pipelines compute AUC over billions of rows).
    """
    WITH h AS (
        SELECT CAST(o_orderkey % 9973 AS BIGINT) AS s,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
                    AS BIGINT) AS neg
        FROM orders GROUP BY s
    ),
    c AS (
        SELECT s, pos, neg,
               CAST(coalesce(sum(neg) OVER (ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS neg_below
        FROM h
    ),
    t AS (
        SELECT CAST(sum(pos) AS BIGINT) AS p_tot,
               CAST(sum(neg) AS BIGINT) AS n_tot,
               CAST(sum(pos * (2 * neg_below + neg)) AS BIGINT) AS num2
        FROM c
    )
    SELECT p_tot AS n_pos, n_tot AS n_neg,
           round(CAST(num2 AS DOUBLE) / (2.0 * p_tot * n_tot) * 1000000.0)
               / 1000000.0 + 0.0 AS auc
    FROM t
    """,
    "exact ROC-AUC via the tie-corrected Mann-Whitney rank sum over a "
    "bounded per-score histogram (no global sort over data): positive/"
    "negative counts + AUC at 6 dp",
    tags=("ml", "stats"),
)
def ml_auc_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval-harness twin of ml_calibration_bins: at 100 TB the
    only data-sized step is the per-score keyed aggregate (map-side
    combinable); everything after runs on the ≤9973-row histogram —
    including the one ordered window, whose single-partition exchange
    is bounded by the modulus LITERAL (plan-invariant allowlist entry
    documents this). Doubling the numerator (2·neg_below + neg) keeps
    the half-credit-for-ties term integer."""
    orders = table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    h = orders.groupBy((F.col("o_orderkey") % 9973).cast("bigint").alias("s")).agg(
        F.sum((F.col("o_orderstatus") == "F").cast("int"))
        .cast("bigint")
        .alias("pos"),
        F.sum((F.col("o_orderstatus") != "F").cast("int"))
        .cast("bigint")
        .alias("neg"),
    )
    w = W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    c = h.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0)).cast("bigint")
    )
    t = c.agg(
        F.sum("pos").cast("bigint").alias("p_tot"),
        F.sum("neg").cast("bigint").alias("n_tot"),
        F.sum(F.col("pos") * (2 * F.col("neg_below") + F.col("neg")))
        .cast("bigint")
        .alias("num2"),
    )
    return t.select(
        F.col("p_tot").alias("n_pos"),
        F.col("n_tot").alias("n_neg"),
        dround(
            F.col("num2").cast("double") / (2.0 * F.col("p_tot") * F.col("n_tot")),
            6,
        ).alias("auc"),
    )


@register(
    "ml_confusion_matrix_metrics",
    # Binary-classifier evaluation harness: confusion matrix +
    # precision/recall/F1/accuracy for the thresholded deterministic
    # HASH score (md5-uniform, so every cell is populated at every SF —
    # a raw o_orderkey % 9973 threshold left tp+fp = 0 at sf0.001 and
    # the 0/0 division diverged cross-engine) against the
    # o_orderstatus='F' label. All four cells are exact integers from
    # ONE conditional-sum aggregate; each metric is one double
    # division of exact integers (F1 via the 2TP/(2TP+FP+FN) identity
    # so no intermediate rounding compounds).
    """
    WITH m AS (
        SELECT CAST(sum(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN pred = 1 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN pred = 0 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(sum(CASE WHEN pred = 0 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM (
            SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                                  AS BIGINT) % 9973 >= 4987
                        THEN 1 ELSE 0 END AS pred,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
            FROM orders
        )
    )
    SELECT tp, fp, fn, tn,
           round(CAST(tp AS DOUBLE) / (tp + fp) * 1000000.0) / 1000000.0 + 0.0 AS precision_,
           round(CAST(tp AS DOUBLE) / (tp + fn) * 1000000.0) / 1000000.0 + 0.0 AS recall_,
           round(2.0 * tp / (2.0 * tp + fp + fn) * 1000000.0) / 1000000.0 + 0.0 AS f1,
           round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) * 1000000.0)
               / 1000000.0 + 0.0 AS accuracy
    FROM m
    """,
    "binary confusion matrix + precision/recall/F1/accuracy from one "
    "conditional-sum aggregate (exact integer cells, one double "
    "division per metric)",
    tags=("ml", "stats"),
)
def ml_confusion_matrix_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the eval-harness family (calibration bins, rank-sum
    AUC): the whole matrix is ONE map-side-combinable aggregate — the
    shape that evaluates a classifier over any corpus size with a
    single scan and a 1-row result."""
    orders = table(spark, sf_dir, "orders")
    pred = (md5_long32(F.col("o_orderkey").cast("string")) % 9973 >= 4987).cast(
        "int"
    )
    label = (F.col("o_orderstatus") == "F").cast("int")
    m = orders.select(pred.alias("pred"), label.alias("label")).agg(
        F.sum(((F.col("pred") == 1) & (F.col("label") == 1)).cast("int"))
        .cast("bigint")
        .alias("tp"),
        F.sum(((F.col("pred") == 1) & (F.col("label") == 0)).cast("int"))
        .cast("bigint")
        .alias("fp"),
        F.sum(((F.col("pred") == 0) & (F.col("label") == 1)).cast("int"))
        .cast("bigint")
        .alias("fn"),
        F.sum(((F.col("pred") == 0) & (F.col("label") == 0)).cast("int"))
        .cast("bigint")
        .alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        dround(tp.cast("double") / (tp + fp), 6).alias("precision_"),
        dround(tp.cast("double") / (tp + fn), 6).alias("recall_"),
        dround(2.0 * tp / (2.0 * tp + fp + fn), 6).alias("f1"),
        dround((tp + tn).cast("double") / (tp + fp + fn + tn), 6).alias("accuracy"),
    )
