"""Supervised quality-classifier inference: a fasttext-style linear
scorer (Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification") as pure Column math.

The model is a frozen weight vector over hashed n-gram buckets:

    logit(doc) = bias + ( Σ_{f ∈ feats(doc)} w[bucket(f)] ) / |feats|
    prob(doc)  = sigmoid(logit)

with feats = unigrams + word bigrams and bucket(f) = md5-prefix(f) mod
n_buckets — exactly fasttext's inference shape (mean of per-feature
weights through a linear head; here the hidden dim is 1, i.e. the
already-composed w = A·B of the paper's two matrices).

100 TB shape: the weight vector ships as a LITERAL array in the plan —
the degenerate (and fastest) broadcast: no join, no shuffle, no UDF.
Scoring is map-only whole-stage codegen over the scan, so it composes
with the funnel's cheapest-first cost model as a pre-dedup pruning
stage (queries/funnel.py). A real trained model drops in by passing its
`weights` list; `deterministic_weights` provides the dependency-free
stand-in both engines (Spark here, DuckDB in the oracle twin) can
recompute bit-identically.

Cross-engine float contract: deterministic weights are exact multiples
of 2^-10 with |w| <= 1, so every partial sum is exact in double and the
feature-sum is ORDER-INDEPENDENT — Spark's left-fold `aggregate` and
DuckDB's `list_sum` agree bit-for-bit regardless of summation order.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import md5_long32

DEFAULT_N_BUCKETS = 256
DEFAULT_BIAS = 0.0625  # exact in binary (2^-4)


def deterministic_weights(n_buckets: int = DEFAULT_N_BUCKETS, seed: str = "w") -> list[float]:
    """Hash-derived stand-in weight vector, reproducible in ANSI SQL.

    w[b] = ((md5int32(f"{seed}:{b}") % 2049) - 1024) / 1024.0 — each an
    exact multiple of 2^-10 in [-1, 1], so sums of any realistic number
    of them are exact doubles (order-independent across engines).
    """
    out: list[float] = []
    for b in range(n_buckets):
        h = int(hashlib.md5(f"{seed}:{b}".encode()).hexdigest()[:8], 16)
        out.append(((h % 2049) - 1024) / 1024.0)
    return out


def hashed_ngram_buckets(words: Column, n_buckets: int = DEFAULT_N_BUCKETS) -> Column:
    """array<string> words -> array<bigint> feature buckets
    (unigrams + word bigrams, fasttext's default wordNgrams=2).

    Pure higher-order-function Column math: the per-document loops stay
    JVM-side inside whole-stage codegen.
    """
    n = F.size(words)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(words, bigrams)
    return F.transform(feats, lambda t: md5_long32(t) % n_buckets)


def linear_logit(buckets: Column, weights: list[float], bias: float = DEFAULT_BIAS) -> Column:
    """Mean weight of the feature buckets, plus bias.

    `weights` is embedded as a literal array — the broadcast-free way
    to ship a small frozen model to every executor; `element_at` on a
    literal array is codegen'd, no join appears in the plan.
    """
    warr = F.array(*[F.lit(float(x)) for x in weights])
    wsum = F.aggregate(
        buckets,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(warr, (b + 1).cast("int")),
    )
    return F.lit(float(bias)) + wsum / F.size(buckets)


def sigmoid(logit: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


def quality_score(
    words: Column,
    weights: list[float],
    bias: float = DEFAULT_BIAS,
    n_buckets: int | None = None,
) -> Column:
    """logit column for a document's word array under a frozen model."""
    nb = len(weights) if n_buckets is None else n_buckets
    if len(weights) != nb:
        raise ValueError(f"weights has {len(weights)} entries, expected n_buckets={nb}")
    return linear_logit(hashed_ngram_buckets(words, nb), weights, bias)
