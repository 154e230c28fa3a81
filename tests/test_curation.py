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
