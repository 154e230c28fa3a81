"""Misra-Gries mergeable heavy-hitter summaries.

The frequent-items sketch of the summaries family the engine already
ships (HLL distinct, GK quantiles, bitmap exact distinct): k counters
per PARTITION maintained streamingly (Misra & Gries 1982), merged with
the counter-combine + (k+1)-th-largest subtraction of Agarwal et al.
2012 ("Mergeable Summaries", PODS) — which is what makes the sketch a
proper distributed aggregate: partial state is ≤ k counters per
partition regardless of partition size, the merge is associative, and
the classic error bound survives merging unchanged:

    est(w) ≤ true(w) ≤ est(w) + n/(k+1)

so every w with true(w) > n/(k+1) is GUARANTEED present in the merged
summary. At 100 TB this replaces a full groupBy(word) shuffle (distinct
words ≈ Heaps-law millions) with a ≤ k·P-row collect (P = partitions).

Estimates are stream-order-dependent (any MG property proof is about
bounds, not exact values), so the oracle-checked gate emits only the
GUARANTEED verdicts against exact counts, never raw estimates — the
same verdict-column idiom as sim_ivf_topk / dedup_mllib_minhash_lsh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_feed(counters: dict[str, int], items, k: int) -> None:
    """Feed items into an MG counter dict of capacity k (in place)."""
    for w in items:
        if w in counters:
            counters[w] += 1
        elif len(counters) < k:
            counters[w] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]


def mg_partition_summaries(
    df: DataFrame, key_col: str, k: int
) -> DataFrame:
    """(key, est) rows, ≤ k per partition — the distributed partial
    state of the sketch (Arrow-batched; the dict persists across a
    partition's batches, so this is the true streaming pass)."""

    def _partials(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            _mg_feed(counters, pdf[key_col], k)
        if counters:
            yield pd.DataFrame(
                {"key": list(counters), "est": list(counters.values())}
            )

    return df.select(F.col(key_col).alias(key_col)).mapInPandas(
        _partials, "key string, est long"
    )


def mg_merge(combined: list[tuple[str, int]], k: int) -> dict[str, int]:
    """Merge already key-summed partial counters down to capacity k:
    subtract the (k+1)-th largest value and drop non-positive counters
    (Agarwal et al. 2012, §3.1)."""
    if len(combined) <= k:
        return {w: int(c) for w, c in combined}
    vals = sorted((int(c) for _, c in combined), reverse=True)
    t = vals[k]  # (k+1)-th largest
    return {w: int(c) - t for w, c in combined if int(c) - t > 0}


def misra_gries(df: DataFrame, key_col: str, k: int) -> dict[str, int]:
    """Full distributed sketch: per-partition summaries → one
    groupBy(key) sum over ≤ k·P rows → driver-side capacity merge.
    The collect is bounded by k·P, independent of data size."""
    rows = (
        mg_partition_summaries(df, key_col, k)
        .groupBy("key")
        .agg(F.sum("est").alias("est"))
        .collect()
    )
    return mg_merge([(r["key"], r["est"]) for r in rows], k)
