"""Property-based tests for the round-3 analytics operators: the Spark
funnel / cohort / weighted-sample queries must agree with direct Python
fold models on ARBITRARY event streams, not just the shipped testdata.

Mirrors the test_fold_properties.py pattern: hypothesis generates small
in-memory tables, a plain-Python model computes the expected answer,
and the same DataFrame pipeline the registry query uses runs on a
parallelized frame.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_T0 = dt.datetime(2024, 1, 1)

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # user_id
        st.sampled_from(["view", "click", "purchase", "other"]),
        st.integers(min_value=0, max_value=10_000),  # minutes offset
    ),
    min_size=0,
    max_size=60,
)


def _funnel_model(rows):
    """view → first click after first view → first purchase after that."""
    by_user: dict[int, list[tuple[str, int]]] = {}
    for uid, typ, m in rows:
        by_user.setdefault(uid, []).append((typ, m))
    v = c = p = 0
    for evs in by_user.values():
        tv = min((m for t, m in evs if t == "view"), default=None)
        if tv is None:
            continue
        v += 1
        tc = min((m for t, m in evs if t == "click" and m > tv), default=None)
        if tc is None:
            continue
        c += 1
        tp = min((m for t, m in evs if t == "purchase" and m > tc), default=None)
        if tp is not None:
            p += 1
    return {"view": v, "view>click": c, "view>click>purchase": p}


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_events)
def test_funnel_matches_python_fold(spark, rows):
    df = spark.createDataFrame(
        [(uid, typ, _T0 + dt.timedelta(minutes=m)) for uid, typ, m in rows],
        "user_id long, event_type string, ts timestamp",
    )
    ev = df.select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("tv"))
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    got = {"view": v.count(), "view>click": c.count(), "view>click>purchase": p.count()}
    assert got == _funnel_model(rows)


def _cohort_model(rows):
    """first-seen day per user → distinct (cohort, offset≤7) user counts."""
    first: dict[int, int] = {}
    for uid, _typ, m in rows:
        day = m // (24 * 60)
        first[uid] = min(first.get(uid, day), day)
    seen = set()
    for uid, _typ, m in rows:
        off = m // (24 * 60) - first[uid]
        if off <= 7:
            seen.add((first[uid], off, uid))
    out: dict[tuple[int, int], int] = {}
    for cohort, off, _uid in seen:
        out[(cohort, off)] = out.get((cohort, off), 0) + 1
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_events)
def test_retention_cohorts_match_python_fold(spark, rows):
    df = spark.createDataFrame(
        [(uid, _T0 + dt.timedelta(minutes=m)) for uid, _typ, m in rows],
        "user_id long, ts timestamp",
    )
    ev = df.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("_day"))
    cohorts = ev.groupBy("user_id").agg(F.min("_day").alias("cohort_day"))
    got_rows = (
        ev.join(cohorts, "user_id")
        .select("user_id", "cohort_day", F.datediff("_day", "cohort_day").alias("day_offset"))
        .filter(F.col("day_offset") <= 7)
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .collect()
    )
    got = {
        ((r["cohort_day"] - _T0.date()).days, r["day_offset"]): r["n_users"] for r in got_rows
    }
    assert got == _cohort_model(rows)


def test_weighted_sample_is_deterministic_and_weight_biased(spark):
    # Deterministic: same input → same draw, twice.
    docs = [(i, 10 if i < 50 else 1000) for i in range(100)]
    df = spark.createDataFrame(docs, "doc_id long, n_chars long")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") + 1
    ) / F.lit(4294967296.0)
    key = F.round(-F.log(u) / F.col("n_chars"), 9)
    pick = lambda: tuple(
        r["doc_id"]
        for r in df.select("doc_id", key.alias("k"))
        .orderBy(F.asc("k"), F.asc("doc_id"))
        .limit(20)
        .collect()
    )
    a, b = pick(), pick()
    assert a == b
    # Weight bias: heavy docs (w=1000, half the corpus) should dominate
    # the draw. P(light doc ranked above heavy) is tiny at 100:1 odds.
    heavy = sum(1 for d in a if d >= 50)
    assert heavy >= 15, a
    # And the exponential-key model reproduces the exact same ranking.
    def py_key(doc_id, w):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 1
        return round(-math.log(h / 4294967296.0) / w, 9)

    expected = tuple(
        d for d, _w in sorted(docs, key=lambda t: (py_key(t[0], t[1]), t[0]))[:20]
    )
    assert a == expected


def test_hll_sketch_estimate_envelope(spark, sf_dir):
    # The probabilistic verdict lives HERE, not in the driver-gated
    # output (the driver's value hash is exact and testdata regenerates
    # between rounds; a ~3σ tail miss would flip the gate red for no
    # engine reason). lgConfigK=12 → ~1.6% RSE; 5% ≈ 3σ.
    from dbt_slabbing_spark.queries.analytics_extra import hll_sketch_estimate_report

    rows = hll_sketch_estimate_report(spark, sf_dir).collect()
    assert len(rows) >= 2  # per-priority scopes + __ALL__
    for r in rows:
        assert abs(r["est_nd"] - r["exact_nd"]) <= max(0.05 * r["exact_nd"], 2), r


def test_attribution_credit_sums_to_attributed_conversions(spark):
    """Position-based attribution invariant: summed channel credit ==
    number of conversions that had at least one lookback touch (each
    such conversion distributes exactly 1.0)."""
    from pyspark.sql import functions as F

    from dbt_slabbing_spark.catalog import table
    from dbt_slabbing_spark.queries import registry
    from tests.conftest import SF_SMOKE

    out = registry()["ts_attribution_position_based"].fn(spark, SF_SMOKE).collect()
    total_credit = sum(r["credit"] for r in out)

    ev = table(spark, SF_SMOKE, "events")
    convs = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id", F.col("ts").alias("cts")
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts"
    )
    attributed = (
        touches.join(convs, "user_id")
        .filter(
            (F.col("ts") < F.col("cts"))
            & (F.col("ts") >= F.col("cts") - F.expr("INTERVAL 7 DAYS"))
        )
        .select("conv_id")
        .distinct()
        .count()
    )
    assert attributed > 0
    assert abs(total_credit - attributed) < 1e-3


def test_naive_bayes_separates_disjoint_vocab_corpora(spark):
    """On a corpus where each language has a disjoint vocabulary NB
    must classify every doc correctly, including docs containing words
    unseen in the winning class (add-1 smoothing keeps scores finite)."""
    import os
    import tempfile

    from dbt_slabbing_spark.queries import registry

    rows = [
        (1, "aaa bbb aaa", "xx"),
        (2, "bbb aaa aaa aaa", "xx"),
        (3, "ccc ddd ccc", "yy"),
        (4, "ddd ccc ddd ddd", "yy"),
        # mixed doc: majority-xx words plus one yy word -> xx wins
        (5, "aaa aaa bbb ccc", "xx"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, t, l, "s", len(t)) for i, t, l in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
        got = {
            r["doc_id"]: r
            for r in registry()["ml_naive_bayes_langid"].fn(spark, tmp).collect()
        }
    assert len(got) == 5
    for i, _t, lang in rows:
        assert got[i]["pred_lang"] == lang, (i, got[i])
        assert got[i]["correct"]


def test_holt_linear_matches_python_fold(spark):
    """ts_holt_linear_forecast: replay the exact (level, trend) integer
    recursion in Python from the same hour-ordered series."""
    from pyspark.sql import functions as F

    from dbt_slabbing_spark.catalog import table
    from dbt_slabbing_spark.queries import registry
    from dbt_slabbing_spark.rounding import dround
    from tests.conftest import SF_SMOKE

    hourly = (
        table(spark, SF_SMOKE, "events")
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(dround(F.sum("value"), 2).alias("x"))
        .collect()
    )
    import math

    def r9(v: float) -> float:
        # Spark/DuckDB round() is half-AWAY-FROM-ZERO; Python's round()
        # banker's-rounds, and the dyadic halving in this recursion
        # lands on exact .5 at the 10th digit constantly (a 9-dp value
        # halved ends in ...5), so the convention matters every step.
        return math.copysign(math.floor(abs(v) * 1e9 + 0.5), v) / 1e9 + 0.0

    series: dict[int, list[tuple]] = {}
    for r in hourly:
        series.setdefault(r["user_id"], []).append((r["h"], r["x"]))
    want = {}
    for uid, hx in series.items():
        xs = [x for _h, x in sorted(hx)]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            nl = r9(0.5 * x + 0.5 * (l + b))
            b = r9(0.5 * (nl - l) + 0.5 * b)
            l = nl
        want[uid] = (len(xs), r9(l), r9(b), r9(l + b))
    got = {
        r["user_id"]: (r["n_hours"], r["level"], r["trend"], r["forecast_1"])
        for r in registry()["ts_holt_linear_forecast"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 5
