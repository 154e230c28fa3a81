"""Aggregation surface: distinct aggs, multi-level grouping (rollup /
cube / grouping sets), filtered aggregation, exact percentiles, pivot.

Type-parity notes vs the DuckDB oracle (driver hashes schema + values):
- DuckDB ``sum(INTEGER)`` returns HUGEINT → oracle casts to BIGINT.
- DuckDB ``grouping()`` returns BIGINT, Spark returns byte → both cast INT.
- exact ``percentile``/``quantile_cont`` use the same linear
  interpolation in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import dround, register


@register(
    "agg_count_distinct",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    "exact distinct aggregation (expand+two-phase agg under the hood)",
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_customers"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "agg_stats_moments",
    """
    SELECT l_returnflag,
           round((stddev_samp(l_quantity)) * 10000.0) / 10000.0 + 0.0 AS sd_qty,
           round((var_samp(l_quantity)) * 10000.0) / 10000.0 + 0.0    AS var_qty,
           round((quantile_cont(l_quantity, 0.5)) * 10000.0) / 10000.0 + 0.0 AS median_qty,
           round((min(l_quantity)) * 100.0) / 100.0 + 0.0 AS min_qty,
           round((max(l_quantity)) * 100.0) / 100.0 + 0.0 AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    "statistical aggregates incl. exact interpolated median",
    tags=("agg",),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dround(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        dround(F.var_samp("l_quantity"), 4).alias("var_qty"),
        dround(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        dround(F.min("l_quantity"), 2).alias("min_qty"),
        dround(F.max("l_quantity"), 2).alias("max_qty"),
    )


@register(
    "agg_rollup_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           CAST(count(*) AS BIGINT) AS n,
           round((sum(l_quantity)) * 100.0) / 100.0 + 0.0 AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "ROLLUP with grouping() indicators (subtotal + grand-total rows)",
    tags=("agg", "grouping"),
)
def agg_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "agg_cube_priority_status",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round((sum(o_totalprice)) * 100.0) / 100.0 + 0.0 AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    "CUBE over two dimensions",
    tags=("agg", "grouping"),
)
def agg_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dround(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "agg_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
    "explicit GROUPING SETS (SQL-text path; no DataFrame equivalent)",
    tags=("agg", "grouping", "sql"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("_agg_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM _agg_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


@register(
    "agg_filtered_counts",
    """
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)    AS n_errors,
           round((sum(value) FILTER (WHERE event_type = 'purchase')) * 100.0) / 100.0 + 0.0     AS purchase_value
    FROM events GROUP BY user_id
    """,
    "conditional/filtered aggregation",
    tags=("agg",),
)
def agg_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.sum(F.when(is_purchase, 1).otherwise(0)).cast("bigint").alias("n_purchases"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("bigint").alias("n_errors"),
        dround(F.sum(F.when(is_purchase, F.col("value"))), 2).alias("purchase_value"),
    )


@register(
    "agg_histogram_buckets",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY bucket
    """,
    "value bucketing + counts (histogram primitive)",
    tags=("agg",),
)
def agg_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_pivot_status",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
    "pivot: one column per o_orderstatus value",
    tags=("agg", "pivot"),
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("status_f"),
        F.coalesce("O", F.lit(0)).alias("status_o"),
        F.coalesce("P", F.lit(0)).alias("status_p"),
    )


@register(
    "agg_collect_list_sorted",
    """
    SELECT c_nationkey,
           string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) AS custkeys_csv,
           CAST(count(*) AS BIGINT) AS n_custkeys
    FROM customer
    WHERE c_acctbal > 9000
    GROUP BY c_nationkey
    """,
    "deterministic collect_list (sorted — collect order is undefined in Spark), "
    "emitted as a CSV string so the result is canonicalizer-safe (no array columns)",
    tags=("agg", "array"),
)
def agg_collect_list_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sort numerically FIRST, then stringify — sorting the strings would put
    # "10" before "2" and diverge from the oracle's ORDER BY c_custkey.
    sorted_keys = F.sort_array(F.collect_list("c_custkey"))
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.transform(sorted_keys, lambda x: x.cast("string")), ",").alias(
                "custkeys_csv"
            ),
            F.count(F.lit(1)).alias("n_custkeys"),
        )
    )


@register(
    "agg_approx_distinct",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_rsd
    FROM events GROUP BY event_type
    """,
    "approx_count_distinct (HLL) with an in-engine bounded-error verdict: the "
    "oracle checks the exact count and expects the sketch to land within 3 "
    "relative-standard-deviations of it (HLL is deterministic for fixed data, "
    "so the boolean is reproducible)",
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Default rsd = 0.05; 3·rsd = 15% is a ~3σ bound the sketch must satisfy.
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id").alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.15 * F.col("exact_users")
            ).alias("approx_within_rsd"),
        )
    )


@register(
    "agg_approx_percentiles",
    """
    SELECT l_returnflag,
           TRUE AS q25_ok, TRUE AS q50_ok, TRUE AS q75_ok, TRUE AS q95_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    "percentile_approx (Greenwald-Khanna quantile sketch) per group — the "
    "mergeable 100 TB path where exact median cannot scale. Emits verdict "
    "booleans (approx value inside the exact [p-0.005, p+0.005] quantile "
    "band) instead of raw arrays so the driver canonicalizer never sees a "
    "list column; GK is deterministic for fixed data, so the booleans are "
    "reproducible and the oracle expects all-true",
    tags=("agg", "approx"),
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # accuracy=10000 → rank error ≤ n/10000; the ±0.005-quantile band is ~50×
    # looser, so a healthy sketch always passes and a broken one never does.
    #
    # r14 (guide §1.2 "per-task work"): both percentile functions take an
    # ARRAY of percentages, so the 4 approx + 8 exact single-percentage
    # aggregates — 12 independent per-group buffers, 4 identical GK
    # sketch builds and 8 identical full-column sort buffers over the
    # whole fact — fuse into ONE GK sketch and ONE exact-percentile
    # buffer queried at every band edge. Same sketch, same exact
    # algorithm, same per-percentage answers (pinned by
    # tests/test_percentile_fused.py); measured 11.1 s → see
    # OPTIMIZATION_r14.md.
    col = "l_extendedprice"
    ps = [0.25, 0.50, 0.75, 0.95]
    lo_hi = [max(p - 0.005, 0.0) for p in ps] + [min(p + 0.005, 1.0) for p in ps]
    grouped = table(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.percentile_approx(col, F.lit(ps), 10000).alias("_a"),
        F.percentile(col, F.lit(lo_hi)).alias("_b"),
    )
    checks = [
        F.element_at("_a", i + 1)
        .between(F.element_at("_b", i + 1), F.element_at("_b", i + 1 + len(ps)))
        .alias(f"q{int(p * 100)}_ok")
        for i, p in enumerate(ps)
    ]
    return grouped.select("l_returnflag", *checks)


@register(
    "agg_kmv_distinct_estimate",
    # KMV / bottom-k sketch (Bar-Yossef et al. 2002; the k-minimum-
    # values distinct estimator behind Theta sketches): hash every key
    # to a 60-bit integer (portable md5 idiom), keep the k=256 smallest
    # DISTINCT hash values, estimate |D| = (k-1) / u_k with u_k = the
    # k-th minimum normalized to [0,1). The estimator arithmetic is one
    # double division of exact integers — bit-identical cross-engine —
    # and the gate publishes the sketch boundary (k-th min hash), the
    # estimate, the exact count, and an integer 1e4-scaled relative
    # error so the accuracy claim itself is hash-checked.
    """
    WITH h AS (
        SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                             AS BIGINT) AS hv
        FROM lineitem
    ),
    bottom AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
    agg AS (
        SELECT CAST(max(hv) AS BIGINT) AS kth_min_hash,
               CAST(count(*) AS BIGINT) AS k
        FROM bottom
    ),
    exact AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS true_distinct
        FROM lineitem
    )
    SELECT a.k,
           a.kth_min_hash,
           CAST(round((a.k - 1) * 1152921504606846976.0 / a.kth_min_hash)
                AS BIGINT) AS est_distinct,
           e.true_distinct,
           CAST(round(abs((a.k - 1) * 1152921504606846976.0 / a.kth_min_hash
                          - e.true_distinct)
                      / e.true_distinct * 10000.0) AS BIGINT) AS rel_err_x10k
    FROM agg a CROSS JOIN exact e
    """,
    "KMV bottom-k distinct-count sketch (k=256, 60-bit portable md5 "
    "hashes): k-th-minimum estimator vs the exact count, relative "
    "error integer-scaled — the mergeable Theta-sketch building block",
    tags=("aggregation", "sketch"),
)
def agg_kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale story: the bottom-k set is MERGEABLE (union two sketches =
    bottom-k of the merged values), so at 100 TB each partition keeps
    its local bottom-256 and one k-row merge finishes the job — here
    expressed as the bounded driver collect of the TakeOrdered action
    (256 rows), the same contract as kmeans' per-iteration k-row
    aggregate. The hash distinct is keyed (map-side combinable);
    nothing global beyond 256 rows ever moves."""
    from ..operators.hashing import hex_to_long

    li = table(spark, sf_dir, "lineitem")
    h = li.select(
        hex_to_long(
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 15)
        ).alias("hv")
    ).distinct()
    bottom = h.orderBy("hv").limit(256).collect()  # bounded: k rows
    k = len(bottom)
    kth = max(r["hv"] for r in bottom)
    true_distinct = li.select("l_orderkey").distinct().count()
    est = (k - 1) * 1152921504606846976.0 / kth

    def _round_half_up(v: float) -> int:
        # DuckDB round() is half-away-from-zero; Python round() is
        # banker's — an exact .5 would diverge cross-engine.
        import math

        return int(math.copysign(math.floor(abs(v) + 0.5), v))

    return spark.createDataFrame(
        [
            (
                k,
                kth,
                _round_half_up(est),
                true_distinct,
                _round_half_up(abs(est - true_distinct) / true_distinct * 10000.0),
            )
        ],
        "k bigint, kth_min_hash bigint, est_distinct bigint, "
        "true_distinct bigint, rel_err_x10k bigint",
    )


@register(
    "agg_theta_sketch_setops",
    # Theta-sketch set operations (Dasgupta et al., "Theta-Sketch
    # Framework"; the KMV gate above is the single-set building
    # block): per-segment bottom-k sketches over the hashed order-key
    # domain, then
    #   union:        theta = min(theta_A, theta_B);
    #                 est = |{h in S_A ∪ S_B : h < theta}| / theta
    #   intersection: est = |{h in S_A ∩ S_B : h < theta}| / theta
    # with theta kept as the EXACT 60-bit integer k-th-min hash
    # (normalization by 2^60 folds into the estimator as one double
    # multiply of exact integers — bit-identical cross-engine). The
    # exact counts and integer 1e4-scaled relative errors ride along
    # so the accuracy claim itself is hash-checked. Segments: orders
    # with a returned line (l_returnflag='R') vs orders with a bulk
    # line (l_quantity>=25) — ~75%/89% of orders, ~69% overlap.
    """
    WITH ha AS (
        SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                             AS BIGINT) AS hv
        FROM lineitem WHERE l_returnflag = 'R'
    ),
    hb AS (
        SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                             AS BIGINT) AS hv
        FROM lineitem WHERE l_quantity >= 25
    ),
    ba AS (SELECT hv FROM ha ORDER BY hv LIMIT 256),
    bb AS (SELECT hv FROM hb ORDER BY hv LIMIT 256),
    th AS (
        SELECT least((SELECT max(hv) FROM ba), (SELECT max(hv) FROM bb)) AS theta,
               (SELECT CAST(count(*) AS BIGINT) FROM ba) AS k_a,
               (SELECT CAST(count(*) AS BIGINT) FROM bb) AS k_b
    ),
    uni AS (
        SELECT CAST(count(*) AS BIGINT) AS n_u FROM (
            SELECT hv FROM ba UNION SELECT hv FROM bb
        ) u, th WHERE u.hv < th.theta
    ),
    its AS (
        SELECT CAST(count(*) AS BIGINT) AS n_i
        FROM ba JOIN bb USING (hv), th WHERE ba.hv < th.theta
    ),
    fl AS (
        SELECT l_orderkey,
               max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS fa,
               max(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS fb
        FROM lineitem GROUP BY l_orderkey
    ),
    ex AS (
        SELECT CAST(sum(CASE WHEN fa = 1 OR fb = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS exact_union,
               CAST(sum(fa * fb) AS BIGINT) AS exact_intersect
        FROM fl
    )
    SELECT th.k_a, th.k_b, CAST(th.theta AS BIGINT) AS theta_hash,
           CAST(round(uni.n_u * 1152921504606846976.0 / th.theta) AS BIGINT)
               AS est_union,
           ex.exact_union,
           CAST(round(abs(uni.n_u * 1152921504606846976.0 / th.theta
                          - ex.exact_union) / ex.exact_union * 10000.0)
                AS BIGINT) AS err_union_x10k,
           CAST(round(its.n_i * 1152921504606846976.0 / th.theta) AS BIGINT)
               AS est_intersect,
           ex.exact_intersect,
           CAST(round(abs(its.n_i * 1152921504606846976.0 / th.theta
                          - ex.exact_intersect) / ex.exact_intersect * 10000.0)
                AS BIGINT) AS err_intersect_x10k
    FROM th, uni, its, ex
    """,
    "Theta-sketch set operations over per-segment KMV bottom-k sketches "
    "(k=256): union and intersection distinct-count estimates of "
    "returned-line vs bulk-line order populations, each beside its "
    "exact count with an integer-scaled relative error",
    tags=("aggregation", "sketch"),
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct-count analogue of agg_bitmap_audience_overlap that
    survives 100 TB where exact bitmaps don't: each segment keeps a
    256-row mergeable bottom-k sketch (per-partition local bottom-k,
    one k-row merge — here the bounded TakeOrdered collect, same
    contract as agg_kmv_distinct_estimate), and ALL set-operation
    arithmetic happens on the two collected sketches driver-side —
    exactly how a production Theta-sketch library evaluates set ops on
    tiny sketch summaries. The corpus-sized work is the two keyed
    distinct aggregates and one per-order flag aggregate (all
    map-side combinable); nothing data-sized ever funnels through one
    task. tests/test_theta_sketch.py pins the merge lemma
    (bottom_k(A ∪ B) == bottom_k(bottom_k(A) ∪ bottom_k(B))) the
    per-partition scale path relies on."""
    import math

    from ..operators.hashing import hex_to_long

    li = table(spark, sf_dir, "lineitem")
    hv = hex_to_long(
        F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 15)
    ).alias("hv")
    bot_a = (
        li.filter(F.col("l_returnflag") == "R")
        .select(hv).distinct().orderBy("hv").limit(256).collect()
    )  # bounded: k rows
    bot_b = (
        li.filter(F.col("l_quantity") >= 25)
        .select(hv).distinct().orderBy("hv").limit(256).collect()
    )  # bounded: k rows
    sa = {r["hv"] for r in bot_a}
    sb = {r["hv"] for r in bot_b}
    theta = min(max(sa), max(sb))
    n_u = sum(1 for h in sa | sb if h < theta)
    n_i = sum(1 for h in sa & sb if h < theta)
    scale = 1152921504606846976.0  # 2^60
    est_u = n_u * scale / theta
    est_i = n_i * scale / theta
    exact = (
        li.groupBy("l_orderkey")
        .agg(
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("fa"),
            F.max((F.col("l_quantity") >= 25).cast("int")).alias("fb"),
        )
        .agg(
            F.sum(((F.col("fa") == 1) | (F.col("fb") == 1)).cast("int"))
            .cast("bigint")
            .alias("exact_union"),
            F.sum(F.col("fa") * F.col("fb")).cast("bigint").alias("exact_intersect"),
        )
        .collect()[0]
    )  # bounded: 1 row

    def _round_half_up(v: float) -> int:
        return int(math.copysign(math.floor(abs(v) + 0.5), v))

    return spark.createDataFrame(
        [
            (
                len(sa),
                len(sb),
                theta,
                _round_half_up(est_u),
                exact["exact_union"],
                _round_half_up(
                    abs(est_u - exact["exact_union"]) / exact["exact_union"] * 10000.0
                ),
                _round_half_up(est_i),
                exact["exact_intersect"],
                _round_half_up(
                    abs(est_i - exact["exact_intersect"])
                    / exact["exact_intersect"]
                    * 10000.0
                ),
            )
        ],
        "k_a bigint, k_b bigint, theta_hash bigint, est_union bigint, "
        "exact_union bigint, err_union_x10k bigint, est_intersect bigint, "
        "exact_intersect bigint, err_intersect_x10k bigint",
    )


@register(
    "agg_weighted_median",
    # Quantity-weighted median price per return flag: the smallest
    # price whose cumulative quantity reaches half the group's total.
    # The cumulative window orders by (price, quantity); rows tied on
    # both sort keys may accumulate in either order, but every tied row
    # shares the same price, so min(price) over the qualifying rows is
    # deterministic — the standard weighted-median-by-prefix-sum
    # recipe, expressed identically in both engines.
    """
    WITH c AS (
        SELECT l_returnflag, l_extendedprice AS p,
               CAST(l_quantity AS BIGINT) AS q,
               sum(CAST(l_quantity AS BIGINT))
                   OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_quantity
                         ROWS UNBOUNDED PRECEDING) AS cumq,
               sum(CAST(l_quantity AS BIGINT))
                   OVER (PARTITION BY l_returnflag) AS totq
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(max(totq) AS BIGINT) AS total_weight,
           round((min(p)) * 100.0) / 100.0 + 0.0 AS weighted_median_price
    FROM c WHERE 2 * cumq >= totq
    GROUP BY l_returnflag
    """,
    "quantity-weighted median price per return flag via group-keyed "
    "cumulative-weight windows (first price reaching half the total "
    "weight)",
    tags=("agg", "window", "stats"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PHASE distributed weighted median (the naive plan —
    `sum(q) OVER (PARTITION BY flag ORDER BY price)` — puts each of
    the 3 flags' ENTIRE row set through one task: measured 19 s at
    sf3, a by-design skew serial sort). Phase 1: a keyed histogram
    aggregate (flag × 1000-wide price bucket — a few hundred rows)
    locates the bucket containing the weighted median and the weight
    accumulated BEFORE it. Phase 2: only that bucket's rows (~1/100 of
    each group) go through the ordered window, offset by the carried
    prefix weight. The windows in phase 1 run over the bucket table;
    the phase-2 window is group-keyed but bucket-pruned, so the serial
    span shrinks with the bucket width — the classic scalable
    weighted-quantile recipe, same answer as the one-pass SQL oracle
    by construction (min-over-qualifying keeps sort-key ties
    harmless)."""
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("p"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    li = li.withColumn("bkt", F.floor(F.col("p") / 1000).cast("long"))
    hist = li.groupBy("l_returnflag", "bkt").agg(F.sum("q").alias("w"))
    w_cum = (
        W.partitionBy("l_returnflag")
        .orderBy("bkt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_tot = W.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "bkt",
        "w",
        F.sum("w").over(w_cum).alias("cumw"),
        F.sum("w").over(w_tot).alias("totw"),
    )
    med_bkt = (
        cum.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("bkt").alias("bkt"),
            F.max("totw").alias("totw"),
        )
        .join(cum.select("l_returnflag", "bkt", "w", "cumw"), ["l_returnflag", "bkt"])
        .select(
            "l_returnflag",
            "bkt",
            "totw",
            (F.col("cumw") - F.col("w")).alias("prevw"),  # weight before bucket
        )
    )
    in_bkt = li.join(F.broadcast(med_bkt), ["l_returnflag", "bkt"])
    w_fine = (
        W.partitionBy("l_returnflag")
        .orderBy("p", "q")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fine = in_bkt.withColumn("cumq", F.col("prevw") + F.sum("q").over(w_fine))
    return (
        fine.filter(2 * F.col("cumq") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(
            F.max("totw").cast("bigint").alias("total_weight"),
            dround(F.min("p"), 2).alias("weighted_median_price"),
        )
    )
