"""BPE merge learning (operators/bpe.py): pinned against an
independent SYMBOL-LIST reference implementation (the real Sennrich
algorithm, no string-replace encoding), plus the overlap chain case
the double-space encoding exists to get right."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.bpe import apply_merges, learn_bpe_merges, symbolize
from tests.conftest import SF_SMOKE


def _ref_bpe(freqs: dict[str, int], n_merges: int):
    """Reference BPE on symbol LISTS: count adjacent pairs weighted by
    word freq, merge the (count DESC, pair ASC) argmax via a greedy
    left-to-right simultaneous pass."""
    words = {w: list(w) for w in freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freqs[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        merged = a + b
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
        merges.append((step, f"{a} {b}", merged, cnt))
    return merges, words


def test_bpe_matches_symbol_list_reference_on_corpus(spark):
    docs = table(spark, SF_SMOKE, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    freqs = {r["word"]: int(r["freq"]) for r in words.collect()}
    got = learn_bpe_merges(words, n_merges=8)
    want, _segmented = _ref_bpe(freqs, 8)
    assert got == want and len(got) == 8


def test_bpe_chain_overlap_merges_every_other_occurrence(spark):
    """`a a a a` must merge to [aa, aa] (greedy non-overlapping), and a
    triple to [aa, a] — the case a single-space string encoding gets
    wrong by consuming the shared delimiter."""
    df = spark.createDataFrame([("aaaa", 10), ("aaa", 1)], "word string, freq long")
    merges = learn_bpe_merges(df, n_merges=2)
    # step 1: pair 'a a' with count 3*10 + 2*1 = 32 (pairs per word =
    # len-1, counted over ALL adjacent positions like the reference)
    assert merges[0] == (1, "a a", "aa", 32)
    # step 2: after merging, 'aaaa'=[aa,aa] and 'aaa'=[aa,a] -> pairs:
    # ('aa','aa'): 10, ('aa','a'): 1
    assert merges[1] == (2, "aa aa", "aaaa", 10)

    seg = (
        df.select(apply_merges(symbolize(F.col("word")), merges).alias("s"))
        .orderBy(F.length("s"))
        .collect()
    )
    assert [r["s"] for r in seg] == [" aaaa ", " aa  a "]


def test_bpe_stops_when_no_pairs_remain(spark):
    df = spark.createDataFrame([("a", 5), ("b", 3)], "word string, freq long")
    assert learn_bpe_merges(df, n_merges=4) == []


def test_bpe_encode_matches_symbol_list_segmentation(spark):
    """text_bpe_encode_tokens' per-doc token stream must equal the
    reference symbol-list implementation's segmentation re-applied to
    each document's word sequence (same 6 merges the gate learns)."""
    import hashlib
    import re

    from dbt_slabbing_spark.queries import registry

    docs = table(spark, SF_SMOKE, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    freqs = {r["word"]: int(r["freq"]) for r in words.collect()}
    _merges, segmented = _ref_bpe(freqs, 6)

    got = {
        r["doc_id"]: r
        for r in registry()["text_bpe_encode_tokens"].fn(spark, SF_SMOKE).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert set(got) == set(texts) and len(got) > 0
    for doc_id, text in texts.items():
        ws = [w for w in re.split(r"\s+", text.lower()) if w != ""]
        toks = [t for w in ws for t in segmented[w]]
        row = got[doc_id]
        assert row["n_words"] == len(ws)
        assert row["n_bpe_tokens"] == len(toks), doc_id
        assert row["tokens_md5"] == hashlib.md5(" ".join(toks).encode()).hexdigest()


def test_bpe_checkpointing_bounds_lineage_and_preserves_merges(spark, monkeypatch):
    """Bounded-lineage training (the O(steps²) fix): with
    checkpoint_every=N, _truncate_lineage fires exactly
    floor(steps / N) times, every checkpointed frame's plan is cut to a
    scan (no stacked replace projections), and the learned merge table
    is IDENTICAL to the checkpoint-free run."""
    from dbt_slabbing_spark.operators import bpe

    docs = table(spark, SF_SMOKE, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )

    baseline = learn_bpe_merges(words, n_merges=9, checkpoint_every=10**9)

    real = bpe._truncate_lineage
    seen: list[int] = []

    def spy(df):
        out = real(df)
        # lineage really is cut: the checkpointed plan is a bare scan
        # of materialized rows, with none of the stacked replaces
        assert "replace" not in out._jdf.queryExecution().optimizedPlan().toString()
        seen.append(1)
        return out

    monkeypatch.setattr(bpe, "_truncate_lineage", spy)
    got = learn_bpe_merges(words, n_merges=9, checkpoint_every=3)
    assert got == baseline and len(got) == 9
    assert len(seen) == 3  # steps 3, 6, 9
