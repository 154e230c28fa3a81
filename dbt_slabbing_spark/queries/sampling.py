"""Reproducible sampling / splitting operators for training-data
pipelines. Random sampling (``df.sample``, ``TABLESAMPLE``) is
nondeterministic across engines, partitionings, and reruns — a training
pipeline needs SAMPLES THAT ARE A PURE FUNCTION OF THE KEY, so every
operator here buckets rows by a portable md5 of the key (same idiom as
the dedup suite: Spark ``conv(substr(md5,1,8),16,10)`` ⟷ DuckDB
``('0x'||substr(md5,1,8))::BIGINT``) and filters on the bucket.

Scale notes (100 TB): bernoulli-by-hash and weighted-mixture are pure
per-row filters — zero shuffles, fully parallel, and compose with column
pruning (the scan reads only key + projected columns). The train/test
split is the same filter followed by a partial-aggregated count. Only
the stratified per-group quota shuffles (one exchange on the stratum
key); at scale the stratum histogram is the skew to watch — mitigate by
pre-filtering with an over-sampled bernoulli pass so the window sees
quota×fudge rows per stratum, not the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.hashing import md5_long32
from ..operators import text as T
from . import dround, register

# DuckDB twin of operators.hashing.md5_long32 over a seeded key.
_DUCK_BUCKET = "(('0x' || substr(md5({key}), 1, 8))::BIGINT % 100)"


def _bucket(col, seed: str = "") -> F.Column:
    """Deterministic bucket in [0, 100) from a key column + seed."""
    key = F.concat(F.lit(seed), col.cast("string")) if seed else col.cast("string")
    return md5_long32(key) % 100


@register(
    "sample_hash_bernoulli",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_DUCK_BUCKET.format(key="CAST(doc_id AS VARCHAR)")} < 10
    """,
    "reproducible 10% bernoulli sample keyed on md5(doc_id) — a pure "
    "filter, rerun-stable on any partitioning",
    tags=("sampling", "training"),
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.filter(_bucket(F.col("doc_id")) < 10).select("doc_id", "lang", "source")


@register(
    "sample_train_test_split",
    f"""
    SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM (
        SELECT lang,
               CASE WHEN {_DUCK_BUCKET.format(key="'split|' || CAST(doc_id AS VARCHAR)")} < 80
                        THEN 'train'
                    WHEN {_DUCK_BUCKET.format(key="'split|' || CAST(doc_id AS VARCHAR)")} < 90
                        THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY split, lang
    """,
    "80/10/10 train/valid/test assignment as a pure function of the doc "
    "key (seeded so it is independent of other sampling decisions)",
    tags=("sampling", "training"),
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _bucket(F.col("doc_id"), seed="split|")
    split = (
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test").alias("split")
    )
    return (
        table(spark, sf_dir, "documents")
        .select(split, "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "sample_stratified_quota",
    """
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5('strat|' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= 20
    """,
    "stratified sample: 20 docs per language, chosen by deterministic "
    "hash order (equal representation regardless of stratum skew)",
    tags=("sampling", "training", "window"),
)
def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    order_key = F.md5(F.concat(F.lit("strat|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(order_key, "doc_id")
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "sample_weighted_mixture",
    f"""
    SELECT source, CAST(count(*) AS BIGINT) AS n_sampled
    FROM (
        SELECT source,
               CASE WHEN source IN ('src0', 'src1') THEN 80
                    WHEN source IN ('src2', 'src3') THEN 50
                    ELSE 10 END AS rate,
               {_DUCK_BUCKET.format(key="'mix|' || CAST(doc_id AS VARCHAR)")} AS b
        FROM documents
    )
    WHERE b < rate
    GROUP BY source
    """,
    "training-mixture sampling: per-source keep-rates (up-weight curated "
    "sources, down-weight bulk web) as one shuffle-free filter",
    tags=("sampling", "training"),
)
def sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    rate = (
        F.when(F.col("source").isin("src0", "src1"), 80)
        .when(F.col("source").isin("src2", "src3"), 50)
        .otherwise(10)
    )
    return (
        table(spark, sf_dir, "documents")
        .filter(_bucket(F.col("doc_id"), seed="mix|") < rate)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


def _sql_group_split_oracle() -> str:
    from .dedup import _SQL_SHINGLE_CTES

    bucket = _DUCK_BUCKET.format(
        key="'groupsplit|' || CAST(coalesce(c.component, d.doc_id) AS VARCHAR)"
    )
    return f"""
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
    ),
    comp AS (
        SELECT n AS doc_id, min(label) AS component FROM reach GROUP BY n
    )
    SELECT d.doc_id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS group_id,
           CASE WHEN {bucket} < 80 THEN 'train'
                WHEN {bucket} < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """


@register(
    "sample_group_aware_split",
    _sql_group_split_oracle(),
    "leakage-safe train/valid/test split: near-duplicate documents "
    "(Jaccard>=0.2 connected components) are assigned AS A GROUP — a "
    "per-doc split would put one near-dup in train and its twin in "
    "test, leaking eval data; singletons group as themselves",
    tags=("sampling", "dedup", "training"),
)
def sample_group_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite of the dedup stack and hash-splitting: the split key is
    the near-dup CLUSTER id, not the doc id, so a whole cluster lands in
    one split (the standard benchmark-leakage defence in pretraining
    pipelines). At 100 TB the components come from the banded/df-capped
    edge generation (see dedup.py); the split itself stays a pure
    per-row hash filter on the group key."""
    from ..operators.graph import connected_components
    from .dedup import _jaccard_pairs

    docs = table(spark, sf_dir, "documents")
    edges = _jaccard_pairs(docs, threshold=0.2).select("id_a", "id_b")
    comp = connected_components(edges, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), F.col("component").cast("long").alias("component")
    )
    grouped = docs.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).cast("bigint").alias("group_id"),
    )
    b = _bucket(F.col("group_id"), seed="groupsplit|")
    split = F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    return grouped.select("doc_id", "group_id", split.alias("split"))


@register(
    "sample_token_budget_mixture",
    """
    WITH tok AS (
        SELECT doc_id, source,
               CAST(len(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM tok
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
           CAST(max(cum_tokens) AS BIGINT) AS budget_used
    FROM cum WHERE cum_tokens <= 12000
    GROUP BY source
    """,
    "token-budget data mixing: per source, keep docs in doc_id order "
    "until a 12k-token budget fills — the deterministic form of "
    "mixture reweighting a training-data pipeline runs per epoch",
    tags=("sampling", "mixture", "tokens"),
)
def sample_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture control by TOKEN budget, not doc count: sources mix to a
    target token share, so long-doc-heavy sources don't dominate. The
    deterministic doc_id order makes the kept SET reproducible (a
    production pipeline would order by a quality or md5 key — same
    dataflow). At 100 TB the mixture has a HANDFUL of sources, so a
    plain `sum() OVER (PARTITION BY source)` would sweep each source's
    entire slice of the corpus in one task — the running sum instead
    comes from the distributed two-pass prefix-sum operator
    (operators/ordering.py::grouped_prefix_sum: range-partition,
    per-partition partials, broadcast offsets), every stage parallel;
    plan-guarded in test_plan_quality.py against regressing to a
    per-source window.
    """
    from ..operators.ordering import grouped_prefix_sum

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", T.token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    cum = grouped_prefix_sum(
        tok, ["source"], [F.col("doc_id")], "n_tokens", out_col="cum_tokens"
    )
    return (
        cum.filter(F.col("cum_tokens") <= 12000)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
            F.max("cum_tokens").cast("bigint").alias("budget_used"),
        )
    )


@register(
    "sample_mixture_rebalance",
    # Rebalance the corpus toward EQUAL token share per source:
    # rate_s = min(1, target_tokens / tokens_s) with target = total/K,
    # then a pure deterministic per-doc hash filter at that rate
    # (u = md5-unit in [0,1), kept iff u < rate — both engines compute
    # the identical 32-bit integer and the identical double compare).
    """
    WITH tok AS (
        SELECT doc_id, source,
               CAST(len(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    src AS (
        SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM tok GROUP BY source
    ),
    tots AS (
        SELECT CAST(sum(tokens_total) AS BIGINT) AS grand, CAST(count(*) AS BIGINT) AS k
        FROM src
    ),
    rates AS (
        SELECT source, tokens_total, n_docs,
               least(1.0, (CAST(grand AS DOUBLE) / k) / tokens_total) AS rate
        FROM src CROSS JOIN tots
    ),
    kept AS (
        SELECT t.source, t.n_tokens
        FROM tok t JOIN rates r USING (source)
        WHERE CAST(('0x' || substr(md5('mix|' || CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT
                   AS DOUBLE) / 4294967296.0 < r.rate
    )
    SELECT r.source, r.n_docs, r.tokens_total,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(k.tokens_kept, 0) AS BIGINT) AS tokens_kept,
           round(r.rate * 10000.0) / 10000.0 + 0.0 AS rate,
           round((coalesce(k.tokens_kept, 0)
                  / ((SELECT CAST(grand AS DOUBLE) FROM tots) / (SELECT k FROM tots))) * 10000.0)
               / 10000.0 + 0.0 AS share_of_target
    FROM rates r
    LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
                      CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
               FROM kept GROUP BY source) k USING (source)
    """,
    "mixture rebalancing to equal token share per source: "
    "deterministic hash downsampling at rate min(1, target/actual); "
    "per-source kept counts + achieved share of target",
    tags=("sampling", "mixture", "tokens", "training"),
)
def sample_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: one per-source rollup (map-side combined), ONE
    single-partition exchange for the tiny grand-total row (the corpus
    invariant's budget), rates broadcast back, and the sample itself is
    a pure per-row hash filter — zero extra shuffles over the corpus,
    rerun-stable on any partitioning."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", T.token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    src = tok.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tots = src.agg(
        F.sum("tokens_total").cast("bigint").alias("grand"), F.count(F.lit(1)).alias("k")
    )
    rates = src.crossJoin(F.broadcast(tots)).select(
        "source",
        "tokens_total",
        "n_docs",
        "grand",
        "k",
        F.least(
            F.lit(1.0), (F.col("grand").cast("double") / F.col("k")) / F.col("tokens_total")
        ).alias("_rate"),
    )
    u = (
        md5_long32(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))).cast("double")
        / F.lit(4294967296.0)
    )
    from . import dround

    # ONE pass over tok: the broadcast rates dim rides along and the
    # keep decision becomes conditional aggregation, so `rates` (and
    # its scalar-totals subplan) is referenced exactly once — a dual
    # reference would re-plan the totals agg and double the
    # single-partition exchange the corpus invariant budgets.
    keep = (u < F.col("_rate")).cast("int")
    target = F.col("grand").cast("double") / F.col("k")
    return (
        tok.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.any_value("n_docs").alias("n_docs"),
            F.any_value("tokens_total").alias("tokens_total"),
            F.sum(keep).cast("bigint").alias("n_kept"),
            F.coalesce(F.sum(keep * F.col("n_tokens")), F.lit(0)).cast("bigint").alias("tokens_kept"),
            dround(F.any_value("_rate"), 4).alias("rate"),
            dround(
                F.coalesce(F.sum(keep * F.col("n_tokens")), F.lit(0)) / F.any_value(target), 4
            ).alias("share_of_target"),
        )
    )


@register(
    "sample_temperature_mixture",
    # Temperature-scaled source sampling (the mBERT/XLM-R multilingual
    # data recipe, Devlin et al. 2019 §A / Conneau et al. 2020 §3):
    # sampling share q_i ∝ p_i^α with α=0.5 flattens the source
    # distribution — big sources down-weighted, small ones boosted —
    # under a total char budget B = 30% of the corpus. α=0.5 is chosen
    # deliberately: p^0.5 = sqrt(p), which is IEEE-EXACT (unlike libm
    # pow), so the per-source factors are bit-identical cross-engine;
    # the keep decision is an exact INTEGER compare (md5-unit ppm <
    # round(rate·1e6)) — no float boundary can flip a row.
    f"""
    WITH stats AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_total
        FROM documents GROUP BY source
    ),
    tot AS (
        -- ONE global aggregate: sqrt(chars/N)/sum_j sqrt(chars_j/N)
        -- algebraically equals sqrt(chars)/sum_j sqrt(chars_j) — the
        -- corpus term cancels, so no second normalization pass exists
        SELECT sum(sqrt(chars_total)) AS s1, sum(chars_total) AS big_n FROM stats
    ),
    rates AS (
        SELECT s.source, s.n_docs, s.chars_total,
               round((sqrt(s.chars_total) / t.s1) * 10000.0) / 10000.0 + 0.0 AS q,
               CAST(round(least(1.0,
                    sqrt(s.chars_total) / t.s1 * 0.3 * t.big_n / s.chars_total
               ) * 1000000.0) AS BIGINT) AS rate_ppm
        FROM stats s, tot t
    )
    SELECT r.source, r.n_docs, r.chars_total, r.q, r.rate_ppm,
           CAST(count(*) FILTER (
               ('0x' || substr(md5('temp|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 1000000 < r.rate_ppm
           ) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(d.n_chars) FILTER (
               ('0x' || substr(md5('temp|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 1000000 < r.rate_ppm
           ), 0) AS BIGINT) AS kept_chars
    FROM rates r JOIN documents d USING (source)
    GROUP BY r.source, r.n_docs, r.chars_total, r.q, r.rate_ppm
    """,
    "temperature-scaled source mixture (alpha=0.5, the mBERT/XLM-R "
    "recipe): per-source sampling share proportional to sqrt(char "
    "share), renormalized under a 30%-of-corpus char budget; keep "
    "rates derived FROM corpus statistics (vs the hand-fixed rates of "
    "sample_weighted_mixture) and applied as a deterministic "
    "md5-ppm filter",
    tags=("sampling", "training"),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: source stats are ONE map-side-combined aggregation
    (rows = number of sources); the sqrt/renormalize arithmetic happens
    on that tiny frame; rates broadcast back onto the scan; the keep
    decision is codegen'd integer hashing — one corpus pass for stats,
    one for the filter, zero wide shuffles. Temperature sampling is the
    standard fix for multilingual/source imbalance (a uniform-by-corpus
    sample is dominated by the biggest source; alpha in (0,1) flattens
    toward uniform-by-source)."""
    docs = table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
    )
    # ONE global aggregate (the query's single-partition-exchange
    # budget): sqrt(chars/N) / Σ_j sqrt(chars_j/N) algebraically equals
    # sqrt(chars) / Σ_j sqrt(chars_j) — the corpus term cancels, so the
    # normalizer and the budget base come from the same 1-row frame.
    tot = stats.agg(
        F.sum(F.sqrt(F.col("chars_total"))).alias("s1"),
        F.sum("chars_total").cast("double").alias("big_n"),
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "chars_total",
        dround(F.sqrt(F.col("chars_total")) / F.col("s1"), 4).alias("q"),
        F.round(
            F.least(
                F.lit(1.0),
                F.sqrt(F.col("chars_total")) / F.col("s1") * 0.3 * F.col("big_n")
                    / F.col("chars_total"),
            )
            * 1000000.0
        )
        .cast("bigint")
        .alias("rate_ppm"),
    )
    kept = (
        md5_long32(F.concat(F.lit("temp|"), F.col("doc_id").cast("string"))) % 1000000
            < F.col("rate_ppm")
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "chars_total", "q", "rate_ppm")
        .agg(
            F.sum(kept.cast("long")).cast("bigint").alias("n_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("n_chars"))), F.lit(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
    )


@register(
    "sample_halfsample_bootstrap_se",
    # Deterministic resampling standard error (the Poisson/online-
    # bootstrap shape of Chamandy et al., hash-derived so both engines
    # draw the SAME replicates): replicate r of 8 keeps the orders
    # whose portable 32-bit md5 hash has bit r set (~half each),
    # estimates mean revenue, and the spread of the 8 half-sample means
    # gives the SE of the full-sample mean (half-sampling inflates
    # variance 1x, so SE = std/sqrt(8) is reported as-is alongside the
    # full mean). ONE scan: each replicate is a pair of conditional
    # sums (integer cents / counts), every mean ONE double division of
    # exact integers, and the mean/variance of the 8 replicate means
    # are written as explicit left-associated expressions so both
    # engines run the identical IEEE tree.
    """
    WITH h AS (
        SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents,
               CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                    AS BIGINT) AS hv
        FROM orders
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               {reps}
        FROM h
    ),
    e AS (
        SELECT n, s / (100.0 * n) AS full_mean,
               {means}
        FROM m
    ),
    g AS (
        SELECT n, full_mean, m0, m1, m2, m3, m4, m5, m6, m7,
               (((((((m0 + m1) + m2) + m3) + m4) + m5) + m6) + m7) / 8.0
                   AS gm
        FROM e
    )
    SELECT n,
           round(full_mean * 1000000.0) / 1000000.0 + 0.0 AS full_mean,
           round(gm * 1000000.0) / 1000000.0 + 0.0 AS replicate_mean,
           round(sqrt((((((((
                 (m0 - gm) * (m0 - gm) + (m1 - gm) * (m1 - gm))
               + (m2 - gm) * (m2 - gm)) + (m3 - gm) * (m3 - gm))
               + (m4 - gm) * (m4 - gm)) + (m5 - gm) * (m5 - gm))
               + (m6 - gm) * (m6 - gm)) + (m7 - gm) * (m7 - gm)) / 7.0 / 8.0)
                 * 1000000.0) / 1000000.0 + 0.0 AS se_mean
    FROM g
    """.format(
        reps=",\n               ".join(
            f"CAST(sum(CASE WHEN ((hv >> {r}) & 1) = 1 THEN cents ELSE 0 END) AS BIGINT) AS s{r}, "
            f"CAST(sum(CASE WHEN ((hv >> {r}) & 1) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n{r}"
            for r in range(8)
        ),
        means=",\n               ".join(
            f"s{r} / (100.0 * n{r}) AS m{r}" for r in range(8)
        ),
    ),
    "deterministic half-sample bootstrap of mean order revenue: 8 "
    "hash-bit replicates in one scan, replicate-mean spread -> SE of "
    "the mean (6 dp), beside the full-sample mean",
    tags=("sampling", "stats"),
)
def sample_halfsample_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resampling-variance machinery at corpus scale: replicates
    are CONDITIONAL SUMS inside one map-side-combinable aggregate (no
    Expand, no per-replicate scan), so 8 — or 512 — replicates cost one
    pass. All randomness is the portable md5 bit so the draw is
    reproducible cross-engine; the 8-term mean/variance combine runs
    driver-side on the collected 1-row moments with the same
    left-associated IEEE expression the oracle writes."""
    import math

    from ..operators.hashing import md5_long32

    orders = table(spark, sf_dir, "orders")
    h = orders.select(
        F.round(F.col("o_totalprice") * 100.0).cast("bigint").alias("cents"),
        md5_long32(F.col("o_orderkey").cast("string")).alias("hv"),
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    ]
    for r in range(8):
        bit = (F.shiftright(F.col("hv"), r).bitwiseAND(F.lit(1)) == 1)
        aggs.append(
            F.sum(F.when(bit, F.col("cents")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"s{r}")
        )
        aggs.append(
            F.sum(F.when(bit, 1).otherwise(0)).cast("bigint").alias(f"n{r}")
        )
    row = h.agg(*aggs).collect()[0]  # bounded: one moments row
    full_mean = row["s"] / (100.0 * row["n"])
    ms = [row[f"s{r}"] / (100.0 * row[f"n{r}"]) for r in range(8)]
    acc = ms[0]
    for r in range(1, 8):
        acc = acc + ms[r]
    gm = acc / 8.0
    var = (ms[0] - gm) * (ms[0] - gm)
    for r in range(1, 8):
        var = var + (ms[r] - gm) * (ms[r] - gm)
    se = math.sqrt(var / 7.0 / 8.0)

    def _r6(v: float) -> float:
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6 + 0.0

    return spark.createDataFrame(
        [(row["n"], _r6(full_mean), _r6(gm), _r6(se))],
        "n bigint, full_mean double, replicate_mean double, se_mean double",
    )
