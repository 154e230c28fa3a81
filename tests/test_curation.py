"""Independent-model tests for the round-9 curation wave
(`queries/curation.py`) — each gate also has a DuckDB oracle checked by
test_oracle_parity; these pin the SEMANTICS against plain-Python
re-implementations so an oracle bug can't hide an engine bug."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.queries import registry
from dbt_slabbing_spark.queries.curation import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    DECON_BENCH_MOD,
    DECON_K,
    MMR_CAND,
    MMR_PICKS,
    MMR_QUERIES,
)
from tests.conftest import SF_SMOKE

_REG = registry()


def _words(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    return t.split(" ") if t else []


def _doc_words(spark) -> dict[int, list[str]]:
    return {
        r["doc_id"]: _words(r["text"])
        for r in table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }


def test_chunk_overlap_matches_python_model(spark):
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["token_start"], r["token_end"], r["n_tokens"], r["chunk_hash"]
        )
        for r in _REG["text_chunk_overlap"].fn(spark, SF_SMOKE).collect()
    }
    want = {}
    for doc_id, w in _doc_words(spark).items():
        n = len(w)
        if n < 1:
            continue
        for i in range((n - 1) // CHUNK_STRIDE + 1):
            start = i * CHUNK_STRIDE + 1
            end = min(start + CHUNK_SIZE - 1, n)
            chunk = " ".join(w[start - 1 : end])
            want[(doc_id, i)] = (
                start, end, end - start + 1,
                hashlib.md5(chunk.encode()).hexdigest(),
            )
    assert got == want and len(want) > len(_doc_words(spark))  # some multi-chunk docs


def test_decontaminate_matches_python_model(spark):
    words = _doc_words(spark)
    sh = {
        d: {
            " ".join(w[i : i + DECON_K])
            for i in range(len(w) - DECON_K + 1)
        }
        for d, w in words.items()
    }
    bench = set().union(*(s for d, s in sh.items() if d % DECON_BENCH_MOD == 0))
    want = {}
    for d, s in sh.items():
        if d % DECON_BENCH_MOD == 0:
            continue
        n_overlap = len(s & bench)
        if n_overlap:
            want[d] = (n_overlap, len(s), 10 * n_overlap >= len(s))
    got = {
        r["doc_id"]: (r["n_overlap"], r["n_shingles"], r["contaminated"])
        for r in _REG["text_decontaminate_ngram"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want and len(want) > 0


def test_pii_mask_round_trips_the_last_two_digits(spark):
    rows = _REG["pii_mask_identifiers"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert re.fullmatch(r"Customer#X{7}\d{2}", r["name_masked"]), r["name_masked"]
        assert not re.search(r"\d", r["name_masked"][:-2])
        assert r["n_digits_masked"] == 7  # Customer#NNNNNNNNN keeps last 2 of 9
        assert re.fullmatch(r"[0-9a-f]{32}", r["pseudonym"])
    # pseudonym is injective over distinct identities (tokenization contract)
    assert len({r["pseudonym"] for r in rows}) == len(rows)


def test_knn_label_audit_votes_are_consistent(spark):
    rows = _REG["ml_knn_label_audit"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_votes"] <= 5
        assert r["label_agrees"] == (r["pred_label"] == r["true_label"])


def test_mmr_matches_python_greedy_model(spark):
    """Replay the greedy MMR loop in Python from the SAME rounded
    cosine inputs the engine uses and demand identical picks."""
    from dbt_slabbing_spark.operators.similarity import brute_force_topk, cosine
    from dbt_slabbing_spark.rounding import dround

    emb = table(spark, SF_SMOKE, "embeddings")
    cand = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < MMR_QUERIES), k=MMR_CAND
    )
    rel = {
        (r["query_id"], r["vec_id"]): r["cos"] for r in cand.collect()
    }
    vecs = emb.select("vec_id", "embedding")
    pair_rows = (
        cand.select("query_id", F.col("vec_id").alias("cid"))
        .join(cand.select("query_id", F.col("vec_id").alias("sid")), on="query_id")
        .filter(F.col("cid") != F.col("sid"))
        .join(vecs.withColumnRenamed("vec_id", "cid").withColumnRenamed("embedding", "a"), on="cid")
        .join(vecs.withColumnRenamed("vec_id", "sid").withColumnRenamed("embedding", "b"), on="sid")
        .select("query_id", "cid", "sid", dround(cosine(F.col("a"), F.col("b")), 6).alias("sim"))
        .collect()
    )
    sim = {(r["query_id"], r["cid"], r["sid"]): r["sim"] for r in pair_rows}

    want = {}
    for q in sorted({k[0] for k in rel}):
        cands = sorted(c for qq, c in rel if qq == q)
        picked = []
        first = max(cands, key=lambda c: (rel[(q, c)], -c))
        picked.append(first)
        want[(q, 1)] = (first, round(0.5 * rel[(q, first)], 7))
        for step in range(2, MMR_PICKS + 1):
            best, best_key = None, None
            for c in cands:
                if c in picked:
                    continue
                ms = max(sim[(q, c, s)] for s in picked)
                score = 0.5 * (rel[(q, c)] - ms)
                key = (score, -c)
                if best_key is None or key > best_key:
                    best, best_key = c, key
            picked.append(best)
            want[(q, step)] = (best, round(best_key[0], 7))

    got = {
        (r["qid"], r["step"]): (r["vec_id"], r["mmr_score"])
        for r in _REG["search_mmr_diversify"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) == MMR_QUERIES * MMR_PICKS


def _bm25_s4(spark):
    """Python model of the integer-scaled per-(doc, term) BM25 partials
    used by search_prf_expansion_topk."""
    import math

    words = _doc_words(spark)
    feats = {d: w for d, w in words.items() if len(w) > 0}
    n_docs = len(feats)
    avgdl = sum(len(w) for w in feats.values()) / n_docs
    tf = {}
    for d, w in feats.items():
        for t in w:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (_d, t) in tf:
        df[t] = df.get(t, 0) + 1
    s4 = {}
    for (d, t), f in tf.items():
        idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        dl = len(feats[d])
        score = idf * (f * 2.2) / (f + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        s4[(d, t)] = round(score * 10000.0)
    return feats, tf, s4


def test_prf_expansion_matches_python_model(spark):
    from dbt_slabbing_spark.queries.textsearch import (
        BM25_TERMS,
        PRF_EXPANSION_TERMS,
        PRF_FEEDBACK_DOCS,
        PRF_W_EXP,
        PRF_W_ORIG,
    )
    from dbt_slabbing_spark.operators.text import STOPWORDS

    feats, tf, s4 = _bm25_s4(spark)
    base = {}
    for (d, t), v in s4.items():
        if t in BM25_TERMS:
            base[d] = base.get(d, 0) + v
    fb = [d for d, _ in sorted(base.items(), key=lambda kv: (-kv[1], kv[0]))[:PRF_FEEDBACK_DOCS]]
    fb_tf = {}
    for (d, t), f in tf.items():
        if d in fb and t not in BM25_TERMS and t not in STOPWORDS:
            fb_tf[t] = fb_tf.get(t, 0) + f
    exp = [t for t, _ in sorted(fb_tf.items(), key=lambda kv: (-kv[1], kv[0]))[:PRF_EXPANSION_TERMS]]
    weights = {t: PRF_W_ORIG for t in BM25_TERMS} | {t: PRF_W_EXP for t in exp}
    fused = {}
    for (d, t), v in s4.items():
        if t in weights:
            fused[d] = fused.get(d, 0) + weights[t] * v
    # display score = round-half-up(total4/2)/1e4: an ODD total4 lands
    # exactly on a .5 4-dp boundary, where Spark's BigDecimal HALF_UP
    # and DuckDB's half-away-from-zero agree (positive values) but
    # Python's round() banker's-rounds — so the model uses the integer
    # ceil closed form instead of float round()
    want = {
        d: (tot, ((tot + 1) // 2) / 10000.0)
        for d, tot in sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    }
    got = {
        r["doc_id"]: (r["total4"], r["score"])
        for r in _REG["search_prf_expansion_topk"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) == 20


def test_tree_depth2_matches_python_model(spark):
    emb = {
        r["vec_id"]: (list(r["embedding"]), 1 if r["label"] < 5 else 0)
        for r in table(spark, SF_SMOKE, "embeddings").collect()
    }

    def best_split(rows):
        # rows: list of (bucketed-feature-values[8], y)
        hist = {}
        for vals, y in rows:
            for f in range(8):
                k = (f, vals[f])
                n, sy = hist.get(k, (0, 0))
                hist[k] = (n + 1, sy + y)
        best = None
        for f in range(8):
            buckets = sorted(b for (ff, b) in hist if ff == f)
            tn = sum(hist[(f, b)][0] for b in buckets)
            tsy = sum(hist[(f, b)][1] for b in buckets)
            cn = csy = 0
            for b in buckets:
                n, sy = hist[(f, b)]
                cn, csy = cn + n, csy + sy
                if cn >= tn:
                    continue
                gain = round(
                    (tsy - tsy * tsy / tn)
                    - (csy - csy * csy / cn)
                    - ((tsy - csy) - (tsy - csy) ** 2 / (tn - cn)),
                    9,
                ) + 0.0
                key = (gain, -f, -b)
                if best is None or key > best[0]:
                    best = (key, f, b, tn, cn, csy, gain)
        return best

    rows = [
        ([round(v * 100.0) / 100.0 + 0.0 for v in e[:8]], y) for e, y in emb.values()
    ]
    root = best_split(rows)
    _k, rf, rt, tn, cn, csy, gain = root
    want = {"root": (rf, rt, tn, cn, csy, gain)}
    for node, side in (("left", True), ("right", False)):
        sub = [r for r in rows if (r[0][rf] <= rt) == side]
        _k2, f2, t2, tn2, cn2, csy2, g2 = best_split(sub)
        want[node] = (f2, t2, tn2, cn2, csy2, g2)

    got = {
        r["node"]: (
            r["f"], r["threshold"], r["n_node"], r["n_left"], r["sy_left"], r["gain"]
        )
        for r in _REG["ml_tree_depth2_splits"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
