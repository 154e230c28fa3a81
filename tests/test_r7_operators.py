"""Round-7 operator pins: tf-idf keyword extraction, margin-based
bitext mining, and temperature mixture sampling, each checked against
an independent pure-Python re-implementation on the sf0.001 corpus
(the Hilbert-key standard: not the oracle SQL, a from-scratch model)."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from dbt_slabbing_spark.queries import registry
from tests.conftest import SF_SMOKE


def _round(x: float, n: int) -> float:
    q = Decimal(1).scaleb(-n)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)) + 0.0


def _words(text: str) -> list[str]:
    t = text.strip().lower()
    return t.split() if t else []


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()


def test_tfidf_top_terms_match_python_model(spark):
    rows = _docs(spark)
    n_docs = len(rows)
    tf: dict[tuple[int, str], int] = {}
    for r in rows:
        for w in _words(r["text"]):
            tf[(r["doc_id"], w)] = tf.get((r["doc_id"], w), 0) + 1
    df: dict[str, int] = {}
    for (_d, w) in tf:
        df[w] = df.get(w, 0) + 1
    scored: dict[int, list[tuple[float, str, int]]] = {}
    for (d, w), c in tf.items():
        s = _round(c * (math.log((n_docs + 1.0) / (df[w] + 1.0)) + 1.0), 6)
        scored.setdefault(d, []).append((s, w, c))
    expected = set()
    for d, terms in scored.items():
        terms.sort(key=lambda t: (-t[0], t[1]))
        for rk, (s, w, c) in enumerate(terms[:3], start=1):
            expected.add((d, w, c, s, rk))
    got = {
        (r["doc_id"], r["term"], r["tf"], r["score"], r["rk"])
        for r in registry()["text_tfidf_top_terms"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expected and len(got) > 0


def _dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def test_bitext_margin_pairs_match_python_model(spark):
    emb = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    lang = {r["doc_id"]: r["lang"] for r in _docs(spark)}
    joined = {i: v for i, v in emb.items() if i in lang}
    planes = [joined[i] for i in sorted(joined) if i < 4]
    assert len(planes) == 4

    def bucket(v):
        return sum((1 << p) for p, pv in enumerate(planes) if _dot(v, pv) > 0)

    b = {i: bucket(v) for i, v in joined.items()}
    xs = [i for i in joined if lang[i] == "en"]
    ys = [i for i in joined if lang[i] != "en"]
    cand = {}
    for x in xs:
        for y in ys:
            if b[x] == b[y]:
                nx, ny = math.sqrt(_dot(joined[x], joined[x])), math.sqrt(_dot(joined[y], joined[y]))
                cand[(x, y)] = _round(_dot(joined[x], joined[y]) / (nx * ny), 6)
    def topk_avg(keyed, k=4):
        out = {}
        for key, items in keyed.items():
            items.sort(key=lambda t: (-t[0], t[1]))
            top = [c for c, _ in items[:k]]
            out[key] = sum(top) / len(top)
        return out
    by_x: dict[int, list] = {}
    by_y: dict[int, list] = {}
    for (x, y), c in cand.items():
        by_x.setdefault(x, []).append((c, y))
        by_y.setdefault(y, []).append((c, x))
    ax, ay = topk_avg(by_x), topk_avg(by_y)
    kept = []
    for (x, y), c in cand.items():
        m = _round(c / (0.5 * (ax[x] + ay[y])), 4)
        if m >= 1.05 and c > 0:
            kept.append((x, y, lang[y], c, m))
    expected = set()
    by_en: dict[int, list] = {}
    for x, y, yl, c, m in kept:
        by_en.setdefault(x, []).append((m, y, yl, c))
    for x, items in by_en.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rk, (m, y, yl, c) in enumerate(items, start=1):
            expected.add((x, y, yl, c, m, rk))
    got = {
        (r["en_id"], r["cand_id"], r["cand_lang"], r["cos"], r["margin"], r["rk"])
        for r in registry()["sim_bitext_margin_pairs"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expected and len(got) > 0


def test_temperature_mixture_matches_python_model(spark):
    rows = _docs(spark)
    stats: dict[str, list[int]] = {}
    for r in rows:
        s = stats.setdefault(r["source"], [0, 0])
        s[0] += 1
        s[1] += int(r["n_chars"])
    big_n = float(sum(v[1] for v in stats.values()))
    f = {src: math.sqrt(v[1]) for src, v in stats.items()}
    fsum = sum(f.values())
    expected = {}
    for src, (n_docs, chars) in stats.items():
        q = _round(f[src] / fsum, 4)
        rate = min(1.0, f[src] / fsum * 0.3 * big_n / chars)
        rate_ppm = int(_round(rate * 1000000.0, 0))
        n_kept = kept_chars = 0
        for r in rows:
            if r["source"] == src and _md5_32(f"temp|{r['doc_id']}") % 1000000 < rate_ppm:
                n_kept += 1
                kept_chars += int(r["n_chars"])
        expected[src] = (n_docs, chars, q, rate_ppm, n_kept, kept_chars)
    got = {
        r["source"]: (
            r["n_docs"], r["chars_total"], r["q"], r["rate_ppm"], r["n_kept"], r["kept_chars"]
        )
        for r in registry()["sample_temperature_mixture"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expected
    # the recipe's point: small sources keep a HIGHER fraction than big
    big_src = max(stats, key=lambda s: stats[s][1])
    small_src = min(stats, key=lambda s: stats[s][1])
    assert expected[small_src][3] >= expected[big_src][3]
