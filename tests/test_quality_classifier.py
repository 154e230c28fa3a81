"""Quality-classifier inference tests (operators/quality_classifier.py):
pure-Python independent model, feature construction, exact-sum
order-independence contract, and the optional funnel stage wiring."""

from __future__ import annotations

import hashlib
import math

from dbt_slabbing_spark.operators.quality_classifier import (
    DEFAULT_BIAS,
    deterministic_weights,
    hashed_ngram_buckets,
    linear_logit,
    quality_score,
)
from dbt_slabbing_spark.queries import registry
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _bucket(tok: str, n_buckets: int = 256) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _model_logit(text: str, weights, bias=DEFAULT_BIAS) -> float:
    toks = text.strip().lower().split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    acc = 0.0  # left fold, same order as F.aggregate
    for t in feats:
        acc += weights[_bucket(t, len(weights))]
    return bias + acc / len(feats)


def test_deterministic_weights_are_exact_dyadic():
    w = deterministic_weights(256)
    assert len(w) == 256 and all(-1.0 <= x <= 1.0 for x in w)
    # exact multiples of 2^-10: the order-independent-sum contract
    assert all(x * 1024 == int(x * 1024) for x in w)
    assert w == deterministic_weights(256)  # stable
    assert w != deterministic_weights(256, seed="other")


def test_hashed_ngram_buckets_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame([("alpha beta gamma",), ("solo",)], "text string")
    got = df.select(
        hashed_ngram_buckets(F.split(F.col("text"), " "), 256).alias("b")
    ).collect()
    assert got[0]["b"] == [
        _bucket("alpha"), _bucket("beta"), _bucket("gamma"),
        _bucket("alpha beta"), _bucket("beta gamma"),
    ]
    assert got[1]["b"] == [_bucket("solo")]  # no bigrams for 1 token


def test_logit_matches_python_model_exactly(spark):
    """Weights are exact dyadics -> the feature sum is exact in double
    and the Spark fold equals the Python fold BIT-FOR-BIT, not just to
    rounding."""
    w = deterministic_weights(256)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "single",
        "a b a b a b a b",
        "data data data quality classifier inference at scale",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(
        "text",
        quality_score(F.split(F.col("text"), " "), w).alias("logit"),
    ).collect()
    for r in got:
        assert r["logit"] == _model_logit(r["text"], w), r["text"]


def test_gate_query_matches_model_on_corpus(spark):
    """The registry gate's logit column vs the Python model on the real
    documents table (sf0.001): identical to the 4-dp rounding the gate
    applies (and the underlying double is bit-identical, so spot-check
    prob/keep consistency too)."""
    w = deterministic_weights(256)
    rows = registry()["text_quality_classifier_scores"].fn(spark, SF_SMOKE).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert len(rows) > 0
    for r in rows[:50]:
        logit = _model_logit(texts[r["doc_id"]], w)
        assert abs(r["logit"] - logit) <= 5e-5
        assert r["keep"] == (logit > 0)
        assert abs(r["prob"] - 1.0 / (1.0 + math.exp(-logit))) <= 5e-5


def test_funnel_optional_classifier_stage(spark):
    """classifier_weights= inserts the 'classifier' verdict between the
    rule stage and exact dedup; default None keeps the oracle-gated
    4-stage funnel byte-identical."""
    fn = registry()["pipeline_quality_funnel"].fn
    base = {r["doc_id"]: r["verdict"] for r in fn(spark, SF_SMOKE).collect()}
    assert "classifier" not in set(base.values())

    # all-negative weights + negative bias -> every doc surviving the
    # rules is rejected by the classifier stage
    w = [-1.0] * 256
    harsh = {
        r["doc_id"]: r["verdict"]
        for r in fn(spark, SF_SMOKE, classifier_weights=w, classifier_bias=-1.0).collect()
    }
    assert set(base) == set(harsh)
    for doc_id, v in base.items():
        if v in ("length", "repetition"):
            assert harsh[doc_id] == v  # cheaper stages still win
        else:
            assert harsh[doc_id] == "classifier"

    # all-positive weights -> classifier passes everyone: funnel
    # verdicts identical to the default path
    lenient = {
        r["doc_id"]: r["verdict"]
        for r in fn(spark, SF_SMOKE, classifier_weights=[1.0] * 256, classifier_bias=1.0).collect()
    }
    assert lenient == base


def test_property_random_ascii_texts_match_model(spark):
    """Hypothesis fuzz over printable-ASCII texts (including edge
    whitespace runs, empties, repeated tokens): engine logit equals the
    Python model bit-for-bit. ASCII-restricted on purpose: Spark
    tokenizes with Java \\s+ after trim/lower, whose semantics match
    Python's str.split() only on ASCII whitespace — the corpus contract
    (TESTDATA documents are ASCII-tokenizable) is what the operator is
    specified against."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    w = deterministic_weights(64)

    token = st.text(
        alphabet=st.sampled_from("abcdefgHIJ019.,!?'\"-_"), min_size=1, max_size=8
    )
    texts = st.lists(token, min_size=0, max_size=30).map(" ".join)

    @given(st.lists(texts, min_size=1, max_size=8))
    @settings(max_examples=15, deadline=None)
    def check(batch):
        df = spark.createDataFrame([(t,) for t in batch], "text string")
        got = df.select(
            "text",
            F.when(
                F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
                > 0,
                quality_score(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+"), w
                ),
            ).alias("logit"),
        ).collect()
        for r in got:
            toks = r["text"].strip().lower().split()
            if not toks:
                # empty/whitespace-only: split('') yields [''] in both
                # engines; the model treats '' as one token like Spark
                toks = [""]
            assert r["logit"] == _model_logit_tokens(toks, w), repr(r["text"])

    check()


def _model_logit_tokens(toks, weights, bias=DEFAULT_BIAS):
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    acc = 0.0
    for t in feats:
        acc += weights[_bucket(t, len(weights))]
    return bias + acc / len(feats)
