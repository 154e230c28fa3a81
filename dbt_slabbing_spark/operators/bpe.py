"""Distributed BPE merge learning (tokenizer induction) over a corpus.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units"): start from characters, repeatedly
merge the most frequent adjacent symbol pair. The engine already
COUNTS tokens with a fixed BPE-ish rule (queries/textanalysis.py);
this operator LEARNS the merge table — the missing tokenizer-induction
step of a training-data pipeline.

Distributed shape (the one SentencePiece/HF tokenizer trainers use):
BPE statistics only depend on the DISTINCT-WORD frequency table, which
is tiny relative to the corpus (Heaps' law), so:

- one pass builds (word, freq) — the only corpus-sized shuffle;
- each merge iteration is ONE aggregation over the word table
  (explode adjacent pairs weighted by freq, map-side partial sums,
  shuffle keyed by pair) + a 1-row TakeOrdered argmax collect —
  the same bounded driver-state-per-iteration contract as
  operators/kmeans.py (k×dim doubles there, one pair string here);
- the merge rewrite is a literal string replace (codegen, no UDF).

Word encoding: symbols joined with TWO spaces, single space at the
ends (`' a  b  c '`). A pair match then needs exactly ' x  y ' and its
replacement ' xy ' restores the invariant, so left-to-right
non-overlapping string replace — the semantics of both Spark's
`replace` and DuckDB's — reproduces BPE's greedy simultaneous pass
exactly: in `a a a` the first merge consumes symbols 1-2 and the
leftover single space correctly blocks an overlapping second match
(single-space joining would LOSE the shared delimiter and miss every
other occurrence in a chain — pinned by the chain test). No
end-of-word marker is modeled (a marker is one extra appended symbol;
the merge mechanics are identical), documented simplification.

Determinism: argmax tie-break is (count DESC, pair string ASC) —
counts are exact BIGINTs, so cross-engine replay needs no float
conventions at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symbolize(word) -> "F.Column":
    """`'abc'` → `' a  b  c '`: double-space joined symbols, single
    space at the ends (see module docstring for why double)."""
    return F.concat(
        F.lit(" "),
        F.rtrim(F.regexp_replace(word, "(.)", "$1  ")),
        F.lit(" "),
    )


def adjacent_pairs(sym_str) -> "F.Column":
    """array of 'x y' pair keys for adjacent symbols of an encoded
    word. zip_with the symbol array against its shift; the unmatched
    tail pairs with NULL and concat propagates it (filtered by the
    caller's explode-then-notnull or left to drop in the agg)."""
    syms = F.split(F.trim(sym_str), "  ")
    shifted = F.slice(syms, 2, F.greatest(F.size(syms), F.lit(1)))
    return F.filter(
        F.zip_with(syms, shifted, lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull(),
    )


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Bounded-lineage seam: materialize the working table and cut its
    logical plan (`localCheckpoint(eager=True)`), so the next iteration
    plans against the checkpointed data instead of re-deriving every
    prior merge's `replace` from the scan. The superseded checkpoint's
    cached blocks are reclaimed by Spark's ContextCleaner once the
    rebound reference drops. On a multi-executor cluster the same seam
    would use `checkpoint()` into a reliable directory (localCheckpoint
    blocks die with an executor); the plan contract is identical."""
    return df.localCheckpoint(eager=True)


def learn_bpe_merges(
    words: DataFrame,
    word_col: str = "word",
    freq_col: str = "freq",
    n_merges: int = 6,
    checkpoint_every: int = 32,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table; returns
    ``[(step, 'x y', 'xy', count), …]`` in merge order. Stops early if
    no pair remains (corpus fully merged).

    Bounded lineage (the kmeans bounded-driver-state contract's sibling):
    each iteration stacks one `replace` projection, so an unpersisted
    working table would make iteration N re-execute all N−1 prior
    replaces from the scan — O(steps²) total work and O(steps) plan
    depth, the dominant cost at a real 30k-merge vocabulary. Every
    ``checkpoint_every`` merges the table is materialized and its
    lineage cut (:func:`_truncate_lineage`), making training O(steps)
    with plan depth ≤ ``checkpoint_every`` while driver state stays one
    pair string per iteration."""
    cur = words.select(
        symbolize(F.col(word_col)).alias("s"), F.col(freq_col).alias("f")
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            cur.select("f", F.explode(adjacent_pairs(F.col("s"))).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("f").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()  # bounded: exactly one row per iteration
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        merged = pair.replace(" ", "")
        pat = " " + pair.replace(" ", "  ") + " "
        cur = cur.select(
            F.replace(F.col("s"), F.lit(pat), F.lit(" " + merged + " ")).alias("s"),
            "f",
        )
        if step % checkpoint_every == 0:
            cur = _truncate_lineage(cur)
        merges.append((step, pair, merged, cnt))
    return merges


def apply_merges(sym_str, merges: list[tuple[int, str, str, int]]) -> "F.Column":
    """Column expression applying a learned merge table (in order) to a
    symbolized word — the ENCODE side of the tokenizer, usable to
    segment the corpus after training."""
    cur = sym_str
    for _step, pair, merged, _cnt in merges:
        cur = F.replace(
            cur, F.lit(" " + pair.replace(" ", "  ") + " "), F.lit(" " + merged + " ")
        )
    return cur
