"""Non-equi joins Spark lacks natively: as-of join and range join.

The as-of Spark implementation is the union + ordered-window carry
(operators/asof.py) — one shuffle on the key, no quadratic pair
explosion. The DuckDB oracle uses its native ASOF JOIN, which gives us
an independent implementation to diff against.

The range join keeps an equality key (user_id) so Spark executes it as
a hash join with the range as a post-filter — never a broadcast
nested-loop over the full fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.asof import asof_join
from . import register


@register(
    "asof_purchase_attribution",
    """
    SELECT v.event_id, v.user_id, p.ts AS purchase_ts,
           CASE WHEN p.ts IS NULL THEN NULL
                ELSE epoch_ms(v.ts) - epoch_ms(p.ts) END AS ms_since_purchase
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
    "as-of join: each view attributed to the user's most recent purchase",
    tags=("join", "asof"),
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("p_ts"))
    joined = asof_join(
        views,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="p_ts",
        value_cols=[],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_time").alias("purchase_ts"),
        F.when(
            F.col("asof_time").isNotNull(),
            F.unix_millis(F.col("ts")) - F.unix_millis(F.col("asof_time")),
        ).alias("ms_since_purchase"),
    )


@register(
    "range_join_error_context",
    """
    SELECT e.event_id, e.user_id,
           CAST(count(c.event_id) AS BIGINT) AS n_preceding_5min
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN events c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts - INTERVAL 5 MINUTE
     AND c.ts < e.ts
    GROUP BY e.event_id, e.user_id
    """,
    "range join: activity count in the 5 minutes before each error (equi key + range filter)",
    tags=("join", "range"),
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    context = ev.select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id"))
    joined = errors.join(
        context,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 5 MINUTE"))
        & (F.col("c_ts") < F.col("e_ts")),
        "left",
    )
    return (
        joined.groupBy("e_id", "e_user")
        .agg(F.count("c_id").alias("n_preceding_5min"))
        .select(F.col("e_id").alias("event_id"), F.col("e_user").alias("user_id"), "n_preceding_5min")
    )


@register(
    "join_scd2_point_in_time",
    """
    WITH changes AS (
        SELECT user_id, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
               CAST(floor(value / 50.0) AS BIGINT) AS tier
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    pit AS (
        SELECT c.event_id, c.user_id, d.tier
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        LEFT JOIN changes d
          ON c.user_id = d.user_id
         AND c.ts >= d.valid_from
         AND (d.valid_to IS NULL OR c.ts < d.valid_to)
    )
    SELECT tier, CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM pit GROUP BY tier
    """,
    "SCD2 point-in-time join: purchase events become a slowly-changing "
    "tier dimension (lead-window validity intervals); each click joins "
    "the tier valid AT ITS TIMESTAMP — the leakage-free feature lookup",
    tags=("join", "scd2", "temporal"),
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension build + point-in-time (PIT) correctness, the
    feature-store join: a training example must see the feature value
    that was CURRENT at example time, not the latest one (future
    leakage) nor an arbitrary one.

    Build: one lead() window turns a change log into [valid_from,
    valid_to) intervals — non-overlapping per user by construction, so
    the PIT join matches at most one dim row per fact (no fan-out).
    Join: user_id equality keeps it a hash join; the interval predicate
    is a post-join filter, never a nested-loop over the fact (same
    stance as range_join_error_context). Clicks before the user's
    first change keep tier NULL (left join) — visible, not dropped.

    At 100 TB: the dimension is bounded by change count, not fact
    count; both sides shuffle once on user_id, and a same-timestamp
    double change collapses to an empty interval deterministically
    ((ts, event_id) window order).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    changes = (
        ev.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.floor(F.col("value") / 50.0).cast("bigint").alias("tier"),
            "event_id",
        )
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .drop("event_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    pit = clicks.join(
        changes,
        (clicks["user_id"] == changes["user_id"])
        & (clicks["ts"] >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (clicks["ts"] < F.col("valid_to"))),
        "left",
    ).select(clicks["event_id"], clicks["user_id"], "tier")
    return pit.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count_distinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# portable bloom-filter membership (explicit bloom semi-join prefilter)
# ---------------------------------------------------------------------------


@register(
    "join_bloom_prefilter_membership",
    """
    WITH mem AS (SELECT DISTINCT o_custkey AS k FROM orders),
    lanes AS (SELECT * FROM (VALUES (0), (1), (2), (3)) j(j)),
    bits AS (
        SELECT DISTINCT
            ('0x' || substr(md5(CAST(j.j AS VARCHAR) || '|' ||
                                CAST(m.k AS VARCHAR)), 1, 8))::BIGINT
            % 32768 AS pos
        FROM mem m, lanes j
    ),
    probe AS (
        SELECT c.c_custkey,
            ('0x' || substr(md5(CAST(j.j AS VARCHAR) || '|' ||
                                CAST(c.c_custkey AS VARCHAR)), 1, 8))::BIGINT
            % 32768 AS pos
        FROM customer c, lanes j
    ),
    hits AS (
        SELECT p.c_custkey, count(b.pos) AS nb
        FROM probe p LEFT JOIN bits b ON p.pos = b.pos
        GROUP BY p.c_custkey
    )
    SELECT h.c_custkey,
           (m.k IS NOT NULL) AS is_member,
           (h.nb = 4) AS bloom_hit
    FROM hits h LEFT JOIN mem m ON h.c_custkey = m.k
    """,
    "portable bloom-filter membership: k=4 seeded-md5 bit positions "
    "mod 32768 over the distinct order-placing customers; every "
    "customer probed -- is_member vs bloom_hit exposes the exact "
    "false-positive population (no false negatives by construction)",
    tags=("join", "sketch"),
)
def join_bloom_prefilter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bloom semi-join prefilter as an EXPLICIT reusable operator
    (Spark's own runtime bloom injection -- InjectRuntimeFilter --
    declines any creation side that isn't a selective filter over a
    scan, e.g. q3's orders JOIN customer; this is the hand-rolled
    equivalent for those shapes). Portable hashing (one seeded md5 per
    lane, operators/hashing.py) makes the bit set BIT-REPRODUCIBLE in
    DuckDB, so unlike sketch gates with order-dependent state the
    false positives themselves are value-hash-checked data.

    100 TB shape: the 'filter' is a DISTINCT-position relation bounded
    by m=32768 rows regardless of member count -- build is one
    k-lane explode + distinct (shuffle capped at m output rows),
    membership is a BROADCAST join against the probe side's k exploded
    lanes + one count-per-key aggregation. Used as a prefilter, the
    false-positive rate (observable here as bloom_hit & !is_member)
    is the fraction of useless rows the expensive downstream join
    still sees."""
    from ..operators.hashing import hex_to_long, seeded_md5

    m_bits, k = 32768, 4

    def pos(seed: int, key):
        # NB: seeded_md5 already returns the md5 hex — take its first
        # 32 bits directly (md5_long32 would hash a second time and
        # silently diverge from the oracle's single-md5 positions)
        return (
            hex_to_long(F.substring(seeded_md5(seed, key.cast("string")), 1, 8))
            % m_bits
        ).alias("pos")

    members = (
        table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    )
    bits = members.select(
        F.explode(F.array(*[pos(j, F.col("k")) for j in range(k)])).alias("pos")
    ).distinct()
    probe = (
        table(spark, sf_dir, "customer")
        .select("c_custkey")
        .select(
            "c_custkey",
            F.explode(
                F.array(*[pos(j, F.col("c_custkey")) for j in range(k)])
            ).alias("pos"),
        )
    )
    hits = (
        probe.join(F.broadcast(bits.withColumn("_b", F.lit(1))), "pos", "left")
        .groupBy("c_custkey")
        .agg(F.count("_b").alias("nb"))
    )
    return hits.join(
        F.broadcast(members.withColumn("_m", F.lit(1))),
        hits.c_custkey == members.k,
        "left",
    ).select(
        "c_custkey",
        F.col("_m").isNotNull().alias("is_member"),
        (F.col("nb") == k).alias("bloom_hit"),
    )
