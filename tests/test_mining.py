"""Mining-wave pins: association rules, PMI collocations, MAD
outliers, Gini concentration, sorted-neighborhood dedup and
contrastive negative sampling, each checked against an independent
pure-Python re-implementation on the sf0.001 tables (the Hilbert-key
standard: not the oracle SQL, a from-scratch model)."""

from __future__ import annotations

import hashlib
import math
import statistics
from decimal import ROUND_HALF_UP, Decimal

from dbt_slabbing_spark.queries import registry
from tests.conftest import SF_SMOKE

_REG = registry()


def _round(x: float, n: int) -> float:
    q = Decimal(1).scaleb(-n)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)) + 0.0


def _words(text: str) -> list[str]:
    t = text.strip().lower()
    return t.split() if t else []


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _run(spark, name):
    return _REG[name].fn(spark, SF_SMOKE).collect()


def test_assoc_rules_match_python_model(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    part = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF_SMOKE}/part.parquet").collect()
    }
    baskets: set[tuple[int, str]] = {
        (r["l_orderkey"], part[r["l_partkey"]]) for r in li
    }
    n_orders = len({o for o, _ in baskets})
    supp: dict[str, int] = {}
    for _o, b in baskets:
        supp[b] = supp.get(b, 0) + 1
    by_order: dict[int, list[str]] = {}
    for o, b in baskets:
        by_order.setdefault(o, []).append(b)
    pairs: dict[tuple[str, str], int] = {}
    for brands in by_order.values():
        bs = sorted(brands)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                pairs[(bs[i], bs[j])] = pairs.get((bs[i], bs[j]), 0) + 1
    scored = []
    for (a, b), c in pairs.items():
        if c < 3:
            continue
        scored.append(
            (
                a,
                b,
                c,
                _round(c / n_orders, 6),
                _round(c / supp[a], 6),
                _round(c * n_orders / (supp[a] * supp[b]), 6),
            )
        )
    scored.sort(key=lambda t: (-t[5], t[0], t[1]))
    expected = scored[:20]
    got = sorted(
        (
            (
                r["brand_a"],
                r["brand_b"],
                r["pair_count"],
                r["support"],
                r["confidence"],
                r["lift"],
            )
            for r in _run(spark, "ml_assoc_rules_pairs")
        ),
        key=lambda t: (-t[5], t[0], t[1]),
    )
    assert got == expected


def test_pmi_collocations_match_python_model(spark):
    rows = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    t = bt = 0
    c1: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    for r in rows:
        w = _words(r["text"])
        t += len(w)
        bt += max(len(w) - 1, 0)
        for tok in w:
            c1[tok] = c1.get(tok, 0) + 1
        for a, b in zip(w, w[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    scored = [
        (w1, w2, c, _round(math.log((c / bt) / ((c1[w1] / t) * (c1[w2] / t))), 6))
        for (w1, w2), c in c2.items()
        if c >= 5
    ]
    scored.sort(key=lambda x: (-x[3], x[0], x[1]))
    expected = scored[:20]
    got = sorted(
        (
            (r["w1"], r["w2"], r["pair_count"], r["pmi"])
            for r in _run(spark, "text_pmi_collocations")
        ),
        key=lambda x: (-x[3], x[0], x[1]),
    )
    assert got == expected


def test_mad_outliers_match_python_model(spark):
    rows = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    expected = {}
    for et, xs in by_type.items():
        med = _round(statistics.median(xs), 6)
        devs = [_round(abs(x - med), 6) for x in xs]
        mad = _round(statistics.median(devs), 6)
        thr = _round(3 * mad, 6)
        n_out = sum(1 for d in devs if d > thr)
        expected[et] = (len(xs), med, mad, n_out, _round(n_out / len(xs), 6))
    got = {
        r["event_type"]: (
            r["n_events"],
            r["median_value"],
            r["mad_value"],
            r["n_outliers"],
            r["outlier_frac"],
        )
        for r in _run(spark, "profile_mad_outliers")
    }
    assert got == expected


def test_gini_matches_python_model_and_closed_form(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
    }
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF_SMOKE}/nation.parquet").collect()
    }
    cnt: dict[int, int] = {}
    for r in orders:
        cnt[r["o_custkey"]] = cnt.get(r["o_custkey"], 0) + 1
    by_nation: dict[str, list[tuple[int, int]]] = {}
    for ck, x in cnt.items():
        by_nation.setdefault(nation[cust[ck]], []).append((x, ck))
    expected = {}
    for nm, xs in by_nation.items():
        xs.sort()
        n = len(xs)
        s0 = sum(x for x, _ in xs)
        s1 = sum((i + 1) * x for i, (x, _) in enumerate(xs))
        gini = _round((2.0 * s1 - (n + 1.0) * s0) / (n * 1.0 * s0), 6)
        expected[nm] = (n, s0, gini)
    got = {
        r["n_name"]: (r["n_customers"], r["total_orders"], r["gini"])
        for r in _run(spark, "profile_gini_concentration")
    }
    assert got == expected
    # closed-form sanity: a nation where every customer has the same
    # count has gini 0; gini is always in [0, 1)
    for nm, (_n, _tot, g) in got.items():
        assert 0.0 <= g < 1.0
        xs = sorted(x for x, _ in by_nation[nm])
        if xs and xs[0] == xs[-1]:
            assert g == 0.0


def test_sorted_neighborhood_matches_python_model(spark):
    rows = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    def key(text: str) -> str:
        w = _words(text)
        return " ".join((w + ["", "", ""])[:3])
    def shingles(text: str) -> set[str]:
        w = _words(text)
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    ranked = sorted(((key(r["text"]), r["doc_id"], r["text"]) for r in rows))
    expected = {}
    for i in range(len(ranked)):
        for j in range(i + 1, min(i + 9, len(ranked))):
            ia, ib = ranked[i][1], ranked[j][1]
            sa, sb = shingles(ranked[i][2]), shingles(ranked[j][2])
            common = len(sa & sb)
            union = len(sa) + len(sb) - common
            if union and common / union >= 0.25:
                expected[(ia, ib)] = (j - i, _round(common / union, 4))
    got = {
        (r["id_a"], r["id_b"]): (r["gap"], r["jaccard"])
        for r in _run(spark, "dedup_sorted_neighborhood")
    }
    assert got == expected
    assert got, "SNM gate is vacuous at sf0.001 — no verified pairs"


def test_contrastive_negatives_match_python_model(spark):
    rows = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    ids = [r["doc_id"] for r in rows]
    bucket = {d: _md5_32(f"neg|{d}") % 64 for d in ids}
    rkey = {d: hashlib.md5(f"negrank|{d}".encode()).hexdigest() for d in ids}
    by_bucket: dict[int, list[int]] = {}
    for d in ids:
        by_bucket.setdefault(bucket[d], []).append(d)
    negs = {
        b: [d for d in sorted(ds, key=lambda x: (rkey[x], x))[:4]]
        for b, ds in by_bucket.items()
    }
    expected = {
        (a, rank + 1, n)
        for a in ids
        for rank, n in enumerate(negs.get((bucket[a] + 1) % 64, []))
    }
    got = {
        (r["anchor_id"], r["neg_rank"], r["negative_id"])
        for r in _run(spark, "train_contrastive_negatives")
    }
    assert got == expected
    # structural guarantees: never a self-pair, <= 4 negatives each
    assert all(a != n for a, _r, n in got)
    per_anchor: dict[int, int] = {}
    for a, _r, _n in got:
        per_anchor[a] = per_anchor.get(a, 0) + 1
    assert max(per_anchor.values()) <= 4


def test_entity_resolution_matches_python_union_find(spark):
    rows = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()

    def words(text: str) -> list[str]:
        return _words(text)

    def shingles(text: str) -> set[str]:
        w = words(text)
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    # pass 1: sorted-neighborhood pairs at uncapped Jaccard >= 0.25
    def key(text: str) -> str:
        w = words(text)
        return " ".join((w + ["", "", ""])[:3])

    ranked = sorted(((key(r["text"]), r["doc_id"], r["text"]) for r in rows))
    edges: set[tuple[int, int]] = set()
    for i in range(len(ranked)):
        for j in range(i + 1, min(i + 9, len(ranked))):
            sa, sb = shingles(ranked[i][2]), shingles(ranked[j][2])
            common = len(sa & sb)
            union = len(sa) + len(sb) - common
            if union and common / union >= 0.25:
                a, b = sorted((ranked[i][1], ranked[j][1]))
                edges.add((a, b))
    # pass 2: df-capped (50) shingle-sharing pairs at Jaccard >= 0.2
    df_count: dict[str, int] = {}
    doc_sh = {r["doc_id"]: shingles(r["text"]) for r in rows}
    for shs in doc_sh.values():
        for s in shs:
            df_count[s] = df_count.get(s, 0) + 1
    capped = {d: {s for s in shs if df_count[s] <= 50} for d, shs in doc_sh.items()}
    by_sh: dict[str, list[int]] = {}
    for d, shs in capped.items():
        for s in shs:
            by_sh.setdefault(s, []).append(d)
    cand = {
        (a, b)
        for ds in by_sh.values()
        for a in ds
        for b in ds
        if a < b
    }
    for a, b in cand:
        common = len(capped[a] & capped[b])
        union = len(capped[a]) + len(capped[b]) - common
        if union and common / union >= 0.2:
            edges.add((a, b))
    # union-find closure
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for d in parent:
        comp.setdefault(find(d), []).append(d)
    meta = {r["doc_id"]: (r["source"], r["n_chars"]) for r in rows}
    expected = {
        min(ms): (
            len(ms),
            len({meta[d][0] for d in ms}),
            max(meta[d][1] for d in ms),
        )
        for ms in comp.values()
    }
    got = {
        r["entity_id"]: (r["n_members"], r["n_sources"], r["max_n_chars"])
        for r in _run(spark, "dedup_entity_resolution")
    }
    assert got == expected
    assert got, "ER gate is vacuous at sf0.001 — no entities"


# --------------------------------------------------------------------------
# hypothesis properties (the test_analytics_properties.py pattern: tiny
# generated tables, plain-Python model, the same pipeline the gate runs)
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=30))
def test_gini_rank_sum_identity_matches_pairwise_definition(spark, xs):
    """The gate's rank-sum formula G = (2*S1 - (n+1)*S0)/(n*S0) must
    equal the definitional mean-absolute-difference Gini
    sum_ij |xi-xj| / (2*n*sum x) on ARBITRARY positive counts —
    including ties, singletons and all-equal lists."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n = len(xs)
    pairwise = sum(abs(a - b) for a in xs for b in xs) / (2.0 * n * sum(xs))
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "custkey long, x long"
    )
    w = Window.orderBy("x", "custkey")
    ranked = df.withColumn("i", F.row_number().over(w))
    nn = F.count(F.lit(1))
    s0 = F.sum("x")
    s1 = F.sum(F.col("i") * F.col("x"))
    [row] = ranked.agg(
        (
            (F.lit(2.0) * s1.cast("double") - (nn + F.lit(1.0)) * s0.cast("double"))
            / (nn.cast("double") * s0.cast("double"))
        ).alias("g")
    ).collect()
    assert abs(row["g"] - pairwise) < 1e-9


_WORDS_ALPHABET = ["alpha", "beta", "gamma", "delta", "eps"]
_docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS_ALPHABET), min_size=0, max_size=6),
    min_size=0,
    max_size=12,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_docs_strategy)
def test_snm_pairs_property_on_generated_corpora(spark, word_lists):
    """snm_pairs_over must equal the brute-force sorted-window model on
    arbitrary tiny corpora: duplicate texts (tied sort keys), empty
    texts, docs under 3 words (no shingles -> never verified)."""
    from dbt_slabbing_spark.queries.mining import (
        _SNM_MIN_JACCARD,
        _SNM_WINDOW,
        snm_pairs_over,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows or [(0, "")], "doc_id long, text string")
    if not rows:
        rows = [(0, "")]

    def key(text):
        w = text.split()
        return " ".join((w + ["", "", ""])[:3])

    def shingles(text):
        w = text.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    ranked = sorted(((key(t), d, t) for d, t in rows))
    expected = {}
    for i in range(len(ranked)):
        for j in range(i + 1, min(i + 1 + _SNM_WINDOW, len(ranked))):
            sa, sb = shingles(ranked[i][2]), shingles(ranked[j][2])
            common = len(sa & sb)
            union = len(sa) + len(sb) - common
            if union and common / union >= _SNM_MIN_JACCARD:
                expected[(ranked[i][1], ranked[j][1])] = j - i
    got = {
        (r["id_a"], r["id_b"]): r["gap"]
        for r in snm_pairs_over(df).collect()
    }
    assert got == expected


# --------------------------------------------------------------------------
# plan guards: the mining wave's scale claims, pinned structurally
# --------------------------------------------------------------------------


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_contrastive_negatives_anchors_never_shuffle(spark):
    """The negative pool (B*k rows) must BROADCAST to the anchors: the
    only hash exchange allowed is the pool-side bucket window; the
    anchor scan flows straight into a BroadcastHashJoin."""
    import re

    plan = _executed_plan(
        _REG["train_contrastive_negatives"].fn(spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:3000]
    assert "Exchange SinglePartition" not in plan, plan[:3000]


def test_assoc_rules_top20_is_take_ordered_not_rank_window(spark):
    """The top-20 selection must compile to TakeOrderedAndProject (no
    global rank window), and the brand-support dims must broadcast —
    the one single-partition exchange is the scalar basket count."""
    plan = _executed_plan(_REG["ml_assoc_rules_pairs"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert plan.count("Exchange SinglePartition") <= 1, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_pmi_top20_is_take_ordered_and_totals_fused(spark):
    """PMI's top-20 must be a TakeOrderedAndProject and both corpus
    totals must come from ONE single-partition aggregate."""
    plan = _executed_plan(_REG["text_pmi_collocations"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert plan.count("Exchange SinglePartition") <= 1, plan[:3000]


def test_mad_outliers_has_no_single_partition_exchange(spark):
    """Both median passes are keyed group-bys with broadcast dims —
    nothing in the plan may collapse to a single partition."""
    plan = _executed_plan(_REG["profile_mad_outliers"].fn(spark, SF_SMOKE))
    assert "Exchange SinglePartition" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]
