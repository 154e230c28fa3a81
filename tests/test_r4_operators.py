"""Independent-model checks for the round-4 operators: PQ/ADC
identities, BM25 and repetition profiling vs pure-Python models, and
incremental-materialization split invariance.

These complement the DuckDB differential gate with a SECOND independent
recomputation (stdlib Python), the FIXTURES.md strategy: a bug shared
by the Spark expression and its hand-mirrored SQL oracle (same wrong
formula on both sides) still fails here.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.pq import (
    adc_distances,
    fixed_codebook,
    pq_adc_topk,
    pq_codes,
    subvectors,
)
from dbt_slabbing_spark.operators.similarity import dot
from dbt_slabbing_spark.queries import registry
from tests.conftest import SF_SMOKE

_REG = registry()


def _words(text: str) -> list[str]:
    t = text.strip().lower()
    return re.split(r"\s+", t) if t else []


def _round(x: float, n: int) -> float:
    # engine dround = round(x·10ⁿ)/10ⁿ, HALF_UP; x ≥ 0 here
    p = float(10**n)
    return math.floor(x * p + 0.5) / p


def test_pq_codebook_vectors_encode_to_themselves(spark):
    """A codebook vector's nearest codebook entry is itself (d²=0), in
    every subspace — the quantizer's identity property."""
    emb = table(spark, SF_SMOKE, "embeddings")
    sub = subvectors(emb, m=4, sub_dim=16)
    cb = fixed_codebook(sub, ks=16)
    codes = pq_codes(sub, cb).filter(F.col("vec_id") < 16).collect()
    assert len(codes) == 16 * 4
    for row in codes:
        assert row["code"] == row["vec_id"], (row, "codebook vector mis-encoded")


def test_pq_adc_exact_for_codebook_candidates(spark):
    """For a candidate INSIDE the codebook the quantized representation
    is exact, so the ADC distance must equal the true L2² distance."""
    emb = table(spark, SF_SMOKE, "embeddings")
    sub = subvectors(emb, m=4, sub_dim=16)
    cb = fixed_codebook(sub, ks=16)
    codes = pq_codes(sub, cb)
    qsub = sub.filter(F.col("vec_id") < 3)
    adc = adc_distances(codes, qsub, cb, m=4)
    approx = (
        adc.filter((F.col("vec_id") < 16) & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id",
            "vec_id",
            (F.col("p0") + F.col("p1") + F.col("p2") + F.col("p3")).alias("approx_d2"),
        )
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("qv")
    )
    dv = F.col("embedding").cast("array<double>")
    exact = (
        emb.filter(F.col("vec_id") < 16)
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (dot(dv, dv) + dot(F.col("qv"), F.col("qv")) - 2 * dot(dv, F.col("qv"))).alias(
                "exact_d2"
            ),
        )
    )
    rows = approx.join(exact, ["query_id", "vec_id"]).collect()
    assert len(rows) == 3 * 15
    for row in rows:
        assert row["approx_d2"] == pytest.approx(row["exact_d2"], abs=1e-9), row


def test_pq_topk_never_beats_exact_nearest(spark):
    """ADC estimates distance to the QUANTIZED candidate; sanity: the
    reported top-1 approx distance is finite, non-negative, and the
    result has exactly k rows per query with unique candidates."""
    emb = table(spark, SF_SMOKE, "embeddings")
    out = pq_adc_topk(emb, n_queries=5, k=3).collect()
    per_q = Counter(r["query_id"] for r in out)
    assert set(per_q) == {0, 1, 2, 3, 4} and all(v == 3 for v in per_q.values())
    assert all(r["approx_d2"] >= 0 for r in out)
    seen = {(r["query_id"], r["vec_id"]) for r in out}
    assert len(seen) == len(out)


def _docs_pandas():
    return pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()


def test_bm25_matches_python_model(spark):
    from dbt_slabbing_spark.queries.textsearch import BM25_B, BM25_K1, BM25_TERMS

    docs = _docs_pandas()
    feats = []
    for _, r in docs.iterrows():
        w = _words(r["text"])
        if w:
            feats.append((int(r["doc_id"]), len(w), [w.count(t) for t in BM25_TERMS]))
    n_docs = len(feats)
    avgdl = sum(f[1] for f in feats) / n_docs
    dfs = [sum(1 for f in feats if f[2][i] > 0) for i in range(len(BM25_TERMS))]
    scored = []
    for doc_id, dl, tfs in feats:
        s = 0.0
        for tf, df_ in zip(tfs, dfs):
            idf = math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))
            s += idf * (tf * (BM25_K1 + 1.0)) / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
        scored.append((doc_id, dl, _round(s, 4)))
    expect = sorted(scored, key=lambda t: (-t[2], t[0]))[:20]

    got = [
        (r["doc_id"], r["dl"], r["score"])
        for r in _REG["text_bm25_topk"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_repetition_profile_matches_python_model(spark):
    docs = _docs_pandas()
    expect = {}
    for _, r in docs.iterrows():
        w = _words(r["text"])
        if len(w) < 2:
            continue
        uni, bi = Counter(w), Counter(zip(w, w[1:]))
        tt, nt = max(uni.values()), sum(uni.values())
        tb, nb = max(bi.values()), sum(bi.values())
        expect[int(r["doc_id"])] = (
            nt, tt, _round(tt / nt, 4), nb, tb, _round(tb / nb, 4),
            tt / nt > 0.2 or tb / nb > 0.05,
        )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["top_token"], r["top_token_frac"],
            r["n_bigrams"], r["top_bigram"], r["top_bigram_frac"], r["repetitive"],
        )
        for r in _REG["text_repetition_profile"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_unigram_surprisal_matches_python_model(spark):
    docs = _docs_pandas()
    toks = {int(r["doc_id"]): _words(r["text"]) for _, r in docs.iterrows()}
    freq = Counter(t for w in toks.values() for t in w)
    total = sum(freq.values())
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_surprisal"])
        for r in _REG["text_unigram_surprisal"].fn(spark, SF_SMOKE).collect()
    }
    for doc_id, w in toks.items():
        if not w:
            assert doc_id not in got
            continue
        mean = sum(-math.log(freq[t] / total) for t in w) / len(w)
        assert got[doc_id][0] == len(w)
        assert got[doc_id][1] == pytest.approx(mean, abs=2e-4)


@pytest.mark.parametrize("frac", [0.25, 0.75])
def test_incremental_model_split_invariance(spark, tmp_path, frac):
    """run_incremental's final state must equal the full recompute for
    ANY first-build/incremental split point, not just the gate's 50%."""
    from dbt_slabbing_spark.plans.model_runner import run_incremental

    events = table(spark, SF_SMOKE, "events")
    b = events.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    split = b["lo"] + (b["hi"] - b["lo"]) * frac

    model = """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               concat(CAST(date_trunc('hour', ts) AS STRING), '|', event_type) AS _key
        FROM {{ source('events') }}
        {% if is_incremental() %}
        WHERE ts >= (SELECT max(hour) FROM {{ this }})
        {% endif %}
        GROUP BY date_trunc('hour', ts), event_type
    """
    target = str(tmp_path / f"mart_{int(frac * 100)}")
    run_incremental(
        spark, model, target,
        sources={"events": events.filter(F.col("ts") < F.lit(split))},
        unique_key="_key",
    )
    final = run_incremental(spark, model, target, sources={"events": events}, unique_key="_key")

    full = (
        events.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    got = {(r["hour"], r["event_type"]): r["n_events"] for r in final.collect()}
    expect = {(r["hour"], r["event_type"]): r["n_events"] for r in full.collect()}
    assert got == expect


def test_group_aware_split_is_leak_free_and_nonvacuous(spark):
    """No near-dup group may span two splits (the leakage property the
    operator exists for), and the check must be non-vacuous: the corpus
    must contain at least one multi-doc group."""
    rows = _REG["sample_group_aware_split"].fn(spark, SF_SMOKE).collect()
    by_group: dict[int, set[str]] = {}
    sizes: Counter = Counter()
    for r in rows:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
        sizes[r["group_id"]] += 1
    assert all(len(s) == 1 for s in by_group.values()), "a group spans splits"
    assert max(sizes.values()) >= 2, "no multi-doc group — leakage check vacuous"
    assert {r["split"] for r in rows} == {"train", "valid", "test"}


def test_pagerank_mass_conserved_and_positive(spark):
    """On a symmetric graph (no dangling nodes) every iteration
    redistributes all rank mass: total rank stays 1 (to per-iteration
    rounding), every rank is positive, and high-degree nodes outrank
    the minimum."""
    from dbt_slabbing_spark.operators.graph import pagerank_fixed

    li = table(spark, SF_SMOKE, "lineitem")
    pairs = (
        li.select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    sym = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank_fixed(sym, iters=3).collect()
    total = sum(r["rank"] for r in ranks)
    assert total == pytest.approx(1.0, abs=1e-6)
    assert all(r["rank"] > 0 for r in ranks)
    top = max(ranks, key=lambda r: r["rank"])
    assert top["outdeg"] > min(r["outdeg"] for r in ranks)


def test_bloom_membership_no_false_negatives_and_portable_positions(spark):
    """Every order-placing customer must bloom-hit (no false negatives),
    and the engine's bit positions must equal a hashlib replica of the
    portable single-md5 lane hash (guards the double-md5 trap where the
    filter stays self-consistent but silently diverges from the
    oracle)."""
    import hashlib

    from dbt_slabbing_spark.queries import registry
    from tests.conftest import SF_SMOKE

    rows = registry()["join_bloom_prefilter_membership"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r["bloom_hit"] for r in rows if r["is_member"])

    # portability: position of lane j for key k = first 32 md5 bits of
    # f"{j}|{k}" mod 32768 — recompute for one known member key
    from dbt_slabbing_spark.catalog import table
    from pyspark.sql import functions as F
    from dbt_slabbing_spark.operators.hashing import hex_to_long, seeded_md5

    key = table(spark, SF_SMOKE, "orders").agg(F.min("o_custkey")).collect()[0][0]
    got = (
        spark.range(1)
        .select(
            *[
                (hex_to_long(F.substring(seeded_md5(j, F.lit(str(key))), 1, 8)) % 32768).alias(f"p{j}")
                for j in range(4)
            ]
        )
        .collect()[0]
    )
    for j in range(4):
        want = int(hashlib.md5(f"{j}|{key}".encode()).hexdigest()[:8], 16) % 32768
        assert got[f"p{j}"] == want, (j, key)
