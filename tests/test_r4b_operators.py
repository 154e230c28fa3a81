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

    with patch.object(TA, "table", lambda s, sf, name: df):
        [row] = _REG["text_c4_doc_filters"].fn(spark, SF_SMOKE).collect()
    assert row["keep"] == keep
