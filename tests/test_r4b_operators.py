"""Independent-model checks for the late-round-4 operators: SQ8
quantization, duplicate-n-gram fraction, shingle containment, and the
C4 filter ruleset — each recomputed in pure stdlib Python so a formula
bug mirrored into the SQL oracle still fails here (the FIXTURES.md
double-blind strategy, same as test_r4_operators.py).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.operators.quantize import sq8_codes, sq8_topk
from dbt_slabbing_spark.queries import registry
from tests.conftest import SF_SMOKE

_REG = registry()


def _words(text: str) -> list[str]:
    t = text.strip().lower()
    return re.split(r"\s+", t) if t else []


def _ngrams(ws: list[str], k: int) -> list[str]:
    return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]


def _docs() -> dict[int, str]:
    t = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _embeddings() -> dict[int, list[float]]:
    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet", columns=["vec_id", "embedding"])
    return dict(zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()))


def _sq8(vec: list[float]) -> list[float]:
    s = max(abs(float(x)) for x in vec) if vec else 0.0
    if s == 0.0:
        return [0.0] * len(vec)
    return [math.floor(float(x) * 127.0 / s + 0.5) for x in vec]


# ---------------------------------------------------------------- SQ8


def test_sq8_codes_match_python_model(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = {
        r["vec_id"]: r["q"]
        for r in emb.select("vec_id", sq8_codes(F.col("embedding")).alias("q")).collect()
    }
    want = {vid: _sq8(v) for vid, v in _embeddings().items()}
    assert got == want


def test_sq8_zero_vector_codes_to_zeros(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id int, embedding array<float>")
    [row] = df.select(sq8_codes(F.col("embedding")).alias("q")).collect()
    assert row["q"] == [0.0, 0.0, 0.0]


def test_sq8_codes_bounded_and_extreme_hits_127(spark):
    codes = _sq8([0.5, -1.0, 0.25, 1.0])
    assert codes == [64.0, -127.0, 32.0, 127.0]
    assert all(-127 <= c <= 127 for c in _sq8([3.7, -0.2, 1e-9]))


def test_sq8_topk_matches_python_brute_force(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = [
        (r["query_id"], r["vec_id"], r["dot_q"])
        for r in sq8_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
        .orderBy("query_id", "vec_id")
        .collect()
    ]
    coded = {vid: _sq8(v) for vid, v in _embeddings().items()}
    want = []
    for qid in sorted(v for v in coded if v < 5):
        qv = coded[qid]
        nq = math.sqrt(sum(x * x for x in qv))
        scored = []
        for vid, cv in coded.items():
            if vid == qid:
                continue
            nv = math.sqrt(sum(x * x for x in cv))
            if nq == 0 or nv == 0:
                continue
            d = sum(a * b for a, b in zip(qv, cv))
            scored.append((round(d / (nq * nv) * 1e6) / 1e6, -vid, int(d)))
        scored.sort(reverse=True)
        want.extend((qid, -mvid, d) for _, mvid, d in scored[:3])
    assert got == sorted(want, key=lambda t: (t[0], t[1]))


def test_sq8_ranking_tracks_float_cosine_closely(spark):
    """Quantization must preserve neighborhood structure: the top-3 sets
    from SQ8 codes and from exact float cosine overlap on >= 2 of 3 for
    every probe (on this corpus they agree exactly or near-exactly)."""
    coded = {vid: _sq8(v) for vid, v in _embeddings().items()}
    floats = {vid: [float(x) for x in v] for vid, v in _embeddings().items()}

    def topk(vecs, qid, k=3):
        qv = vecs[qid]
        nq = math.sqrt(sum(x * x for x in qv))
        scored = sorted(
            (
                (sum(a * b for a, b in zip(qv, v)) / (nq * math.sqrt(sum(x * x for x in v))), -vid)
                for vid, v in vecs.items()
                if vid != qid and any(v) and nq > 0
            ),
            reverse=True,
        )
        return {-mvid for _, mvid in scored[:k]}

    for qid in range(5):
        assert len(topk(coded, qid) & topk(floats, qid)) >= 2


# ------------------------------------- duplicate-n-gram fraction


def test_duplicate_ngram_fraction_matches_python_model(spark):
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["flagged"])
        for r in _REG["text_duplicate_ngram_fraction"].fn(spark, SF_SMOKE).collect()
    }
    docs = {d: _ngrams(_words(t), 5) for d, t in _docs().items()}
    df = Counter()
    for d, grams in docs.items():
        for g in set(grams):
            df[g] += 1
    want = {}
    for d, grams in docs.items():
        if not grams:
            continue
        dup = sum(1 for g in grams if df[g] >= 2)
        want[d] = (len(grams), dup, round(dup / len(grams) * 1e4) / 1e4 >= 0.3)
    assert got == want


def test_duplicate_ngram_short_docs_excluded(spark):
    """Docs with < 5 words produce no 5-grams and must not appear."""
    out = {r["doc_id"] for r in _REG["text_duplicate_ngram_fraction"].fn(spark, SF_SMOKE).collect()}
    short = {d for d, t in _docs().items() if len(_words(t)) < 5}
    assert out.isdisjoint(short)


# ------------------------------------------------- containment


def test_containment_pairs_match_python_model(spark):
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["c_a_in_b"], r["c_b_in_a"])
        for r in _REG["dedup_containment_pairs"].fn(spark, SF_SMOKE).collect()
    }
    sets = {d: set(_ngrams(_words(t), 3)) for d, t in _docs().items()}
    dfreq = Counter(g for s in sets.values() for g in s)
    capped = {d: {g for g in s if dfreq[g] <= 50} for d, s in sets.items()}
    want = {}
    ids = sorted(capped)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            common = capped[a] & capped[b]
            if not common or not capped[a] or not capped[b]:
                continue
            ca, cb = len(common) / len(capped[a]), len(common) / len(capped[b])
            if max(ca, cb) >= 0.6:
                want[(a, b)] = (
                    len(common),
                    round(ca * 1e4) / 1e4,
                    round(cb * 1e4) / 1e4,
                )
    assert got == want


def test_containment_catches_subset_jaccard_misses(spark):
    """The operator's reason to exist: a short doc embedded in a much
    longer one scores containment 1.0 but low Jaccard."""
    long_text = " ".join(f"w{i}" for i in range(40))
    short_text = " ".join(f"w{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, long_text), (2, short_text)], "doc_id long, text string"
    )
    from dbt_slabbing_spark.queries.dedup import capped_shingles

    sh = capped_shingles(df)
    a = {r["sh"] for r in sh.filter("doc_id = 2").collect()}
    b = {r["sh"] for r in sh.filter("doc_id = 1").collect()}
    assert a <= b  # fully contained
    jaccard = len(a & b) / len(a | b)
    assert jaccard < 0.2  # symmetric similarity would have missed it


# ------------------------------------------------- C4 filters


def test_c4_filters_match_python_model(spark):
    got = {
        r["doc_id"]: (r["n_terminal"], r["ends_terminal"], r["keep"])
        for r in _REG["text_c4_doc_filters"].fn(spark, SF_SMOKE).collect()
    }
    want = {}
    for d, t in _docs().items():
        n_words = len(_words(t))
        n_term = len(re.findall(r"[.!?]", t))
        ends = bool(re.search(r"[.!?]$", t.rstrip()))
        keep = (
            n_words >= 5
            and n_term >= 3
            and ends
            and "{" not in t
            and "lorem ipsum" not in t.lower()
        )
        want[d] = (n_term, ends, keep)
    assert got == want


@pytest.mark.parametrize(
    "text,keep",
    [
        ("", False),
        ("One two three four five. Six seven. Eight nine!", True),
        ("One two three four five. Six seven. Eight nine", False),  # no terminal end
        ("function() { return 1; }. Yes. No. Maybe.", False),  # brace
        ("Lorem ipsum dolor sit amet. More words here. And more.", False),
        ("Too. Short. Ha.", False),  # < 5 words
    ],
)
def test_c4_keep_rules_on_synthetic_docs(spark, text, keep):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    import dbt_slabbing_spark.queries.textanalysis as TA
    from unittest.mock import patch

    with patch.object(TA, "table", lambda s, sf, name, **kw: df):
        [row] = _REG["text_c4_doc_filters"].fn(spark, SF_SMOKE).collect()
    assert row["keep"] == keep


# ------------------------------------------- truncated rerank


def test_truncated_rerank_matches_python_model(spark):
    got = [
        (r["query_id"], r["vec_id"])
        for r in _REG["sim_truncated_rerank_topk"].fn(spark, SF_SMOKE)
        .orderBy("query_id", "vec_id")
        .collect()
    ]
    emb = {vid: [float(x) for x in v] for vid, v in _embeddings().items()}

    def rcos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb) * 1e6) / 1e6

    want = []
    for qid in sorted(v for v in emb if v < 5):
        cand_ids = [
            -m
            for _, m in sorted(
                ((rcos(emb[qid][:16], v[:16]), -vid) for vid, v in emb.items() if vid != qid),
                reverse=True,
            )[:20]
        ]
        rer = sorted(((rcos(emb[qid], emb[c]), -c) for c in cand_ids), reverse=True)[:3]
        want.extend(sorted((qid, -m) for _, m in rer))
    assert got == want


# ------------------------------------------- incremental dedup


def test_incremental_batch_matches_python_model(spark):
    got = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in _REG["dedup_incremental_batch"].fn(spark, SF_SMOKE).collect()
    }
    docs = _docs()
    norm = {d: re.sub(r"\s+", " ", t.strip().lower()) for d, t in docs.items()}
    import hashlib

    h = {d: hashlib.md5(n.encode()).hexdigest() for d, n in norm.items()}
    sets = {d: set(_ngrams(_words(t), 3)) for d, t in docs.items()}
    dfreq = Counter(g for s in sets.values() for g in s)
    capped = {d: {g for g in s if dfreq[g] <= 50} for d, s in sets.items()}
    want = {}
    for d in docs:
        if d % 2 == 0:
            continue
        exact = sorted(c for c in docs if c % 2 == 0 and h[c] == h[d])
        if exact:
            want[d] = ("exact", exact[0])
            continue
        best = None
        for c in docs:
            if c % 2 == 1 or not capped[d] or not capped[c]:
                continue
            common = capped[d] & capped[c]
            if not common:
                continue
            jac = len(common) / (len(capped[d]) + len(capped[c]) - len(common))
            if jac >= 0.5:
                key = (round(jac * 1e4) / 1e4, -c)
                if best is None or key > best[0]:
                    best = (key, c)
        want[d] = ("near", best[1]) if best else ("new", None)
    assert got == want


def test_incremental_batch_exact_beats_near(spark):
    """A batch doc byte-identical (post-normalization) to a corpus doc
    must report 'exact' with the lowest matching corpus id."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (2, "  Alpha   beta GAMMA delta epsilon zeta "),  # same normalized
        (1, "alpha beta gamma delta epsilon zeta"),  # batch: exact dup of 0 and 2
        (3, "totally unrelated content with other words entirely"),  # batch: new
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import dbt_slabbing_spark.queries.dedup as DD
    from unittest.mock import patch

    with patch.object(DD, "table", lambda s, sf, name, **kw: df):
        got = {
            r["doc_id"]: (r["verdict"], r["match_id"], r["score"])
            for r in _REG["dedup_incremental_batch"].fn(spark, SF_SMOKE).collect()
        }
    assert got[1] == ("exact", 0, 1.0)
    assert got[3] == ("new", None, None)


# ------------------------------------------- LSH-pruned PQ/ADC


def test_lshpq_matches_python_model(spark):
    got = [
        (r["query_id"], r["vec_id"])
        for r in _REG["sim_lshpq_adc_topk"].fn(spark, SF_SMOKE)
        .orderBy("query_id", "vec_id")
        .collect()
    ]
    emb = {vid: [float(x) for x in v] for vid, v in _embeddings().items()}

    def d(a, b):
        return sum(x * y for x, y in zip(a, b))

    planes = {p: emb[p] for p in range(4)}
    bucket = {
        vid: sum((1 << p) for p, pv in planes.items() if d(v, pv) > 0)
        for vid, v in emb.items()
    }
    sub = {(vid, s): v[s * 16 : (s + 1) * 16] for vid, v in emb.items() for s in range(4)}
    cb = {(c, s): sub[(c, s)] for c in range(16) for s in range(4)}
    codes = {}
    for (vid, s), sv in sub.items():
        codes[(vid, s)] = min(
            range(16),
            key=lambda c: (
                d(sv, sv) + d(cb[(c, s)], cb[(c, s)]) - 2 * d(sv, cb[(c, s)]),
                c,
            ),
        )
    want = []
    for qid in range(5):
        scored = []
        for vid in emb:
            if vid == qid or bucket[vid] != bucket[qid]:
                continue
            total = 0.0
            for s in range(4):
                qv, cv = sub[(qid, s)], cb[(codes[(vid, s)], s)]
                total += d(qv, qv) + d(cv, cv) - 2 * d(qv, cv)
            scored.append((round(total * 1e6) / 1e6, vid))
        scored.sort()
        want.extend(sorted((qid, vid) for _, vid in scored[:3]))
    assert got == want


def test_lshpq_candidates_strict_subset_of_corpus(spark):
    """Bucket pruning must actually prune: per query, the ADC join
    scores only same-bucket vectors, a strict subset of the corpus."""
    emb = {vid: [float(x) for x in v] for vid, v in _embeddings().items()}

    def d(a, b):
        return sum(x * y for x, y in zip(a, b))

    bucket = {
        vid: sum((1 << p) for p in range(4) if d(v, emb[p]) > 0) for vid, v in emb.items()
    }
    for qid in range(5):
        n_cand = sum(1 for vid in emb if vid != qid and bucket[vid] == bucket[qid])
        assert 0 < n_cand < len(emb) - 1


# ------------------------------------------- SCD2 point-in-time


def _events():
    t = pq.read_table(
        f"{SF_SMOKE}/events.parquet", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    return t.to_pylist()


def test_scd2_pit_matches_python_model(spark):
    got = {
        r["tier"]: (r["n_clicks"], r["n_users"])
        for r in _REG["join_scd2_point_in_time"].fn(spark, SF_SMOKE).collect()
    }
    evs = _events()
    changes = {}
    for e in sorted(
        (e for e in evs if e["event_type"] == "purchase" and e["value"] is not None),
        key=lambda e: (e["ts"], e["event_id"]),
    ):
        changes.setdefault(e["user_id"], []).append(
            (e["ts"], math.floor(e["value"] / 50.0))
        )
    assigned = []
    for c in (e for e in evs if e["event_type"] == "click"):
        tier = None
        hist = changes.get(c["user_id"], [])
        for i, (ts, t) in enumerate(hist):
            nxt = hist[i + 1][0] if i + 1 < len(hist) else None
            if c["ts"] >= ts and (nxt is None or c["ts"] < nxt):
                tier = t
                break
        assigned.append((c["user_id"], tier))
    want = {}
    for tier in {t for _, t in assigned}:
        rows = [(u, t) for u, t in assigned if t == tier]
        want[tier] = (len(rows), len({u for u, _ in rows}))
    assert got == want


def test_scd2_pit_no_fanout(spark):
    """Validity intervals are non-overlapping per user, so the PIT join
    must match each click at most once: total clicks in = rows out."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')"
    )
    n_clicks_in = con.sql("SELECT count(*) FROM events WHERE event_type = 'click'").fetchone()[0]
    out = _REG["join_scd2_point_in_time"].fn(spark, SF_SMOKE).agg(F.sum("n_clicks")).collect()
    assert out[0][0] == n_clicks_in


# ------------------------------------------- rolling 7d feature


def test_rolling_7d_spend_matches_python_model(spark):
    got = {
        r["event_id"]: (r["spend_7d_cents"], r["n_prior"])
        for r in _REG["ts_rolling_7d_user_spend"].fn(spark, SF_SMOKE).collect()
    }
    purchases = {}
    for e in _events():
        if e["event_type"] == "purchase" and e["value"] is not None:
            purchases.setdefault(e["user_id"], []).append(
                (int(e["ts"].timestamp()), e["event_id"], round(e["value"] * 100))
            )
    want = {}
    for hist in purchases.values():
        for ts, eid, _ in hist:
            prior = [c for t2, e2, c in hist if ts - 604800 <= t2 <= ts - 1]
            want[eid] = (sum(prior), len(prior))
    assert got == want


def test_rolling_7d_frame_excludes_current_row(spark):
    """The leakage property itself: a user's FIRST purchase must have
    spend_7d_cents == 0 — the frame never includes the current row."""
    out = _REG["ts_rolling_7d_user_spend"].fn(spark, SF_SMOKE)
    firsts = out.filter(F.col("n_prior") == 0).select("spend_7d_cents").distinct().collect()
    assert [r[0] for r in firsts] == [0]


def test_sq8_synthetic_edge_vectors_match_python_model(spark):
    """Seeded synthetic vectors + adversarial edges (all-zero, single
    dominant axis, tiny magnitudes, sign flips): Spark codes must equal
    the Python model bit-for-bit — the determinism claim the oracle
    gate rests on."""
    import numpy as np

    rng = np.random.default_rng(42)
    vecs = [[float(np.float32(x)) for x in rng.normal(0, 1, 16)] for _ in range(50)]
    vecs += [
        [0.0] * 16,
        [1e-30] * 16,
        [float(np.float32(1e30))] * 16,
        [1.0] + [0.0] * 15,
        [-1.0, 1.0] * 8,
        [float(np.float32(1 / 256))] * 16,
    ]
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["q"]
        for r in df.select("vec_id", sq8_codes(F.col("embedding")).alias("q")).collect()
    }
    # model must see the same float32-rounded values Spark stores
    import numpy as np

    want = {i: _sq8([float(np.float32(x)) for x in v]) for i, v in rows}
    assert got == want


# --------------------------------------- histogram quantile rollup


def test_histogram_quantile_tracks_exact_median(spark):
    """The W=8000 bucket bound: every estimated quantile must sit
    within one bucket width of the exact quantile, per scope AND at
    the merged global level."""
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_SMOKE}/orders.parquet')")
    exact = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            """SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5),
                      quantile_cont(o_totalprice, 0.9)
               FROM orders GROUP BY 1
               UNION ALL
               SELECT '__ALL__', quantile_cont(o_totalprice, 0.5),
                      quantile_cont(o_totalprice, 0.9) FROM orders"""
        ).fetchall()
    }
    got = {
        r["scope"]: (r["est_median"], r["est_p90"])
        for r in _REG["agg_histogram_quantile_rollup"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(exact)
    for scope, (em, ep) in got.items():
        xm, xp = exact[scope]
        assert abs(em - xm) <= 8000.0, (scope, em, xm)
        assert abs(ep - xp) <= 8000.0, (scope, ep, xp)


def test_histogram_rollup_merge_equals_direct_build(spark):
    """Mergeability: the __ALL__ row (merged per-priority counts) must
    equal a histogram built directly on the ungrouped data."""
    out = _REG["agg_histogram_quantile_rollup"].fn(spark, SF_SMOKE)
    [allrow] = out.filter("scope = '__ALL__'").collect()
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_SMOKE}/orders.parquet')")
    [direct] = con.sql(
        """WITH cum AS (
             SELECT b, cnt,
                    sum(cnt) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS c,
                    sum(cnt) OVER () AS n
             FROM (SELECT CAST(least(floor(o_totalprice / 8000.0), 63) AS BIGINT) AS b,
                          count(*) AS cnt FROM orders GROUP BY b)
           )
           SELECT round((b * 8000.0 + 8000.0 * ((CAST(n AS DOUBLE) * 0.5 - (c - cnt)) / cnt)) * 100.0) / 100.0 + 0.0
           FROM cum WHERE c >= CAST(n AS DOUBLE) * 0.5 ORDER BY b LIMIT 1"""
    ).fetchall()
    assert allrow["est_median"] == direct[0]


# ------------------------------------------- residual IVF-PQ


def _ivfpq_model(emb, n_queries=5, k=3, n_cells=8, m=4, sd=16, ks=16):
    def d(a, b):
        return sum(x * y for x, y in zip(a, b))

    def l2(a, b):
        return d(a, a) + d(b, b) - 2 * d(a, b)

    cents = {c: emb[c] for c in range(n_cells)}
    cell = {vid: min(cents, key=lambda c: (l2(v, cents[c]), c)) for vid, v in emb.items()}
    resid = {vid: [a - b for a, b in zip(v, cents[cell[vid]])] for vid, v in emb.items()}
    sub = {(vid, s): r[s * sd : (s + 1) * sd] for vid, r in resid.items() for s in range(m)}
    cb = {(c, s): sub[(c, s)] for c in range(ks) for s in range(m)}
    codes = {
        (vid, s): min(range(ks), key=lambda c: (l2(sv, cb[(c, s)]), c))
        for (vid, s), sv in sub.items()
    }
    out = []
    for qid in range(n_queries):
        scored = []
        for vid in emb:
            if vid == qid or cell[vid] != cell[qid]:
                continue
            total = sum(l2(sub[(qid, s)], cb[(codes[(vid, s)], s)]) for s in range(m))
            scored.append((round(total * 1e6) / 1e6, vid))
        scored.sort()
        out.extend(sorted((qid, vid) for _, vid in scored[:k]))
    return out, cell, resid, codes, cb, sub


def test_ivfpq_residual_matches_python_model(spark):
    emb = {vid: [float(x) for x in v] for vid, v in _embeddings().items()}
    want, *_ = _ivfpq_model(emb)
    got = [
        (r["query_id"], r["vec_id"])
        for r in _REG["sim_ivfpq_residual_topk"].fn(spark, SF_SMOKE)
        .orderBy("query_id", "vec_id")
        .collect()
    ]
    assert got == want


def test_residual_pq_error_collapses_to_noise_on_clustered_data(spark):
    """The mechanism residual encoding exploits: on clustered data
    (points = centroid + small noise, the regime IVF-PQ targets),
    residuals concentrate near zero, so the residual codebook's
    reconstruction error is a tiny fraction of the signal energy. (On
    the isotropic random TESTDATA embeddings residuals do NOT
    concentrate — nearest-of-8 random centroids in 64-dim are
    near-orthogonal, measured mean |r|² ≈ 1.6 vs |v|² = 1.0 — which is
    exactly why this structural property is asserted on synthetic
    clustered vectors rather than the gate corpus.)"""
    import random

    rng = random.Random(7)
    anchors = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(8)]
    emb = {}
    for vid in range(100):
        a = anchors[vid % 8]
        emb[vid] = [x + rng.gauss(0, 0.05) for x in a] if vid >= 8 else list(a)

    def d(a, b):
        return sum(x * y for x, y in zip(a, b))

    def l2(a, b):
        return d(a, a) + d(b, b) - 2 * d(a, b)

    _, cell, resid, codes, cb, sub = _ivfpq_model(emb, n_queries=0)
    resid_err = sum(
        l2(sub[(vid, s)], cb[(codes[(vid, s)], s)]) for vid in emb for s in range(4)
    )
    signal = sum(d(v, v) for v in emb.values())
    assert resid_err < 0.02 * signal  # reconstruction error ≈ noise floor
