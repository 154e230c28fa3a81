"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on a warm
local session; prints ONE JSON line.

Methodology (mirrors BASELINE.md §2 "steady-state (warm-run) query
execution, result fully fetched"):

- fixed warm session; JVM startup excluded (fixed overhead, like the
  oracle's process startup);
- per query: warmed twice (codegen + page cache), then timed best-of-N.
  Each timed run executes a FRESH DataFrame object end-to-end
  (analysis, optimization, every stage, full Arrow fetch) — re-running
  one prepared plan object would let Spark reuse the previous run's
  shuffle map outputs and silently time only the final stage (caught in
  round 2: a multi-stage dedup pipeline "ran" 300× faster than its real
  cost). Only the Python-side plan CONSTRUCTION (the py4j expression-
  building chatter, ~0.1-0.5 s of Python round trips) happens outside
  the timer: it is an artifact of driving the DSL from Python
  expression-by-expression, not engine work, and has no analogue in
  the oracle's sub-ms SQL parse;
- local-small-data tuning applied as runtime confs: scan split size
  AUTO-SIZED from the data (`_auto_split_bytes`: largest-table bytes
  / 6, clamped [2 MB, 32 MB] — the 2 MB floor reproduces the sf0.1
  hand-tuning exactly, and bigger inputs like the sf10 events slice
  get scale-appropriate splits with no env var) and 16 shuffle
  partitions. On a real cluster these are exactly the knobs sized per
  stage by AQE; see session.py.
"""

from __future__ import annotations

import json
import os
import time

from dbt_slabbing_spark.queries import registry
from dbt_slabbing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "7"))

# (short, registry_name, summed). summed=True marks the 8 queries whose
# sum is the BASELINE.md-comparable headline "value" (r1-r8 series);
# summed=False extras are timed and reported per-query only. The flag
# lives ON the tuple so adding an extra can't silently inflate the
# headline again (BENCH_r08's recorded 2.7843 s wrongly summed the new
# q21_bucketed because the old hand-maintained name list wasn't updated;
# comparable 8-query sum was 2.5502 s — footnoted in BASELINE.md).
HEADLINE = [
    ("q1", "q1_pricing_summary", True),
    ("q3", "q3_shipping_priority", True),
    ("q5", "q5_local_supplier", True),
    ("window_topk", "window_topk_orders_per_customer", True),
    ("events_hourly", None, True),  # batch twin of the streaming rollup, below
    ("q9", "q9_product_type_profit", True),  # join-heavy: 5-table + agg
    ("q21", "q21_sole_late_supplier", True),  # decorrelated EXISTS/NOT EXISTS
    ("minhash", "dedup_minhash_lsh", True),  # LLM-pipeline dedup representative
    # 100 TB distinct-count story: exact bitmap rollup (one scan, coarser
    # levels merge bitmaps not rows, no count_distinct Expand). Added in
    # round 4 so regressions in the Expand-free plan are caught; no
    # BASELINE.md twin (the reference has no sketch rollup) — tracked
    # round-over-round instead.
    ("bitmap_rollup", "agg_bitmap_exact_distinct_rollup", False),
    # round-7 extra (non-summed, like bitmap_rollup): q3 over the
    # order-key-bucketed layout — the warm-up runs pay the one-time
    # bucketed write (ensure_orderkey_bucketed_tables short-circuits
    # after that), so the timed runs measure the query alone. At the
    # floor-bound sf0.1 it tracks parity; the layout's win is the
    # sf1/sf3 table in BASELINE.md §Round-7 (−30%/−21%).
    ("q3_bucketed", "q3_bucketed_layout", False),
    # round-8 extra: q21 over the SAME bucketed tables — the layout-
    # REUSE claim measured round-over-round, not once (r8 interleaved
    # at sf0.1: 231-260 ms vs plain q21's 376-435 ms, ~−40%).
    ("q21_bucketed", "q21_bucketed_layout", False),
    # round-10 extra (VERDICT r9 "Next round #8"): the re-planned
    # benchmark decontamination — the one headline exercising the
    # wide-text explode/broadcast-membership path (map-local
    # array_distinct, no corpus-wide string shuffle; BASELINE.md
    # §Round-10 A/B: beats the r9 plan 1.6-1.8×, crosses under DuckDB
    # at sf10). Non-summed so the r1-r9 8-query series stays
    # comparable.
    ("decontaminate", "text_decontaminate_ngram", False),
    # round-11 extra (VERDICT r10 "Next round #8"): the manifest-prune
    # READ path measured round-over-round. Like q3_bucketed, the
    # warm-ups pay the one-time clustered write
    # (_manifest_prune_bench short-circuits once the table exists);
    # the timed runs measure the driver-side manifest prune + the
    # 2-of-8-file scan-filter-agg alone.
    ("manifest_prune", None, False),
    # round-12 extra (VERDICT r11 "Next round #7"): the DV-APPLIED read
    # path measured round-over-round — r11's 4.25 s → 1.02 s read-tax
    # re-plan lived only in BASELINE.md prose. Warm-ups pay the
    # one-time table build + DV delete (_dv_read_bench short-circuits
    # on the existing manifest); the timed runs measure the
    # dirty+clean-file scan with the INSET dead-position filter alone.
    ("dv_read", None, False),
]

#: custom callables for HEADLINE rows with no registry twin
_CUSTOM_FNS: dict[str, object] = {}

# round-15 extras (VERDICT r14 "Next round #2"): long-tail registry
# queries whose r14/r15 re-plans previously lived only in the sweep tool
# (tools/perf_sweep.py) — promoted to driver-tracked NON-SUMMED entries
# so PERF can confirm/deny the long-tail claims round-over-round.
# Methodology difference from HEADLINE, stated openly: the timed window
# INCLUDES the query-construction call fn(spark, SF_DIR), because these
# pipelines do real driver-side work while building (bounded collects —
# trained k-means centroids, the materialized reachability edge
# relation); excluding construction would hide genuine cost and make a
# construction-time collect look free. Best-of-3 (not N_RUNS): each is
# 1-3 s, far above the measurement floor, and the bench must stay
# inside the driver's budget. This is a NEW series first tracked in
# r15 — no prior numbers to stay comparable with; the 8-query headline
# sum is untouched.
LONGTAIL = [
    ("sim_neardup_pairs", "sim_neardup_pairs"),
    ("agg_approx_percentiles", "agg_approx_percentiles"),
    ("dedup_simhash", "dedup_simhash"),
    ("sql_recursive_reachability", "sql_recursive_reachability"),
]
N_RUNS_LONGTAIL = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS_LONGTAIL", "3"))


def _auto_split_bytes(sf_dir: str) -> int:
    """Scan split size derived from the data, not hand-tuned per scale.

    Rule: largest-table bytes / 6, clamped to [2 MB, 32 MB] — on these
    single-join-or-agg headline plans the per-task fixed cost (~10 ms)
    dominates well past "one task per core", so fewer, bigger scan
    tasks win until the 32 MB ceiling. Reproduces the measured optima:
    sf0.1 (largest file 10.8 MB) → the 2 MB floor, i.e. BYTE-IDENTICAL
    bench behavior at the driver's scale; the sf10 events slice
    (211 MB) → 32 MB, the best measured split both in round 5
    (280 ms vs 534 ms at the old 2 MB default) and re-measured round 7
    (332 ms vs 477 ms) — so the sf10 demonstration needs no manual
    SPARK_GRAFT_SPLIT; sf3 (lineitem 552 MB) → 32 MB (round 5 showed
    the knob is ±10% noise there). This is the split-sizing a real
    cluster gets from AQE + file listing per stage; env
    SPARK_GRAFT_SPLIT still overrides for A/B experiments.
    """
    import pathlib

    largest = max(
        (f.stat().st_size for f in pathlib.Path(sf_dir).glob("*.parquet")),
        default=0,
    )
    mb = 1024 * 1024
    return min(max(largest // 6, 2 * mb), 32 * mb)


def _events_hourly_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from dbt_slabbing_spark.catalog import table
    from dbt_slabbing_spark.rounding import dround

    return (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dround(F.sum("value"), 2).alias("total_value"))
    )


def _manifest_prune_bench(spark, sf_dir):
    """Pruned read over a persistent 8-file (value × event_type)-
    clustered manifest table (the layout_manifest_prune_read gate's
    table, built ONCE per sf dir — first call pays the write, later
    calls short-circuit on the existing manifest). The returned plan is
    the product read path: driver-side manifest prune (2 of 8 files
    survive the two-column box) → scan → row filter → aggregate."""
    import pathlib

    from pyspark.sql import functions as F

    from dbt_slabbing_spark.catalog import table
    from dbt_slabbing_spark.operators.layout import append_files, read_table
    from dbt_slabbing_spark.queries.coverage_extra import (
        _PRUNE_HI,
        _PRUNE_LO,
        _PRUNE_THI,
        _PRUNE_TLO,
        _PRUNE_TGROUPS,
        _PRUNE_VRANGES,
    )
    from dbt_slabbing_spark.rounding import dround

    tag = sf_dir.strip("/").replace("/", "_")
    work = f"/tmp/dbt_slabbing_bench_prune_{tag}"
    if not pathlib.Path(work, "_manifest.json").exists():
        ev = table(spark, sf_dir, "events").select(
            "user_id", "event_type", "value"
        )
        for vlo, vhi in _PRUNE_VRANGES:
            for tlo, thi in _PRUNE_TGROUPS:
                cond = (
                    (F.col("value") >= vlo)
                    & (F.col("event_type") >= tlo)
                    & (F.col("event_type") < thi)
                )
                if vhi is not None:
                    cond = cond & (F.col("value") < vhi)
                append_files(spark, work, ev.filter(cond).coalesce(1))
    pruned = read_table(
        spark,
        work,
        prune=[
            ("value", _PRUNE_LO, _PRUNE_HI),
            ("event_type", _PRUNE_TLO, _PRUNE_THI),
        ],
    ).filter(
        F.col("value").between(_PRUNE_LO, _PRUNE_HI)
        & F.col("event_type").between(_PRUNE_TLO, _PRUNE_THI)
    )
    return pruned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
        dround(F.sum("value"), 2).alias("sum_value"),
    )


def _dv_read_bench(spark, sf_dir):
    """DV-applied read over a persistent half-dirty manifest table
    (built ONCE per sf dir: 8 user_id-residue files from events, then
    one mode="dv" DELETE whose predicate lands positions in half of
    them — the adversarial merge-on-read layout from the r11 read-tax
    re-plan). The returned plan is the product read path:
    `_scan_with_dv`'s one multi-file scan over dirty files with the
    INSET dead-position filter + plain scan of clean files → filter →
    aggregate."""
    import pathlib

    from pyspark.sql import functions as F

    from dbt_slabbing_spark.catalog import table
    from dbt_slabbing_spark.operators.layout import (
        append_files,
        delete_rows,
        read_table,
    )
    from dbt_slabbing_spark.rounding import dround

    tag = sf_dir.strip("/").replace("/", "_")
    work = f"/tmp/dbt_slabbing_bench_dvread_{tag}"
    if not pathlib.Path(work, "_manifest.json").exists():
        ev = table(spark, sf_dir, "events").select(
            "user_id", "event_type", "value"
        )
        for i in range(8):
            append_files(
                spark, work, ev.filter(F.col("user_id") % 8 == i).coalesce(1)
            )
        # dirty half the files: even residues hold even user_ids only
        delete_rows(
            spark, work, "user_id % 2 = 0 AND value >= 400", mode="dv"
        )
    return read_table(spark, work).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
        dround(F.sum("value"), 2).alias("sum_value"),
    )


_CUSTOM_FNS["events_hourly"] = _events_hourly_batch
_CUSTOM_FNS["manifest_prune"] = _manifest_prune_bench
_CUSTOM_FNS["dv_read"] = _dv_read_bench


def _time_headline(spark, reg) -> dict[str, float]:
    times: dict[str, float] = {}
    for short, name, _summed in HEADLINE:
        fn = reg[name].fn if name else _CUSTOM_FNS[short]
        fn(spark, SF_DIR).toPandas()
        fn(spark, SF_DIR).toPandas()  # warm: codegen cache + OS page cache
        best = float("inf")
        for _ in range(N_RUNS):
            # drop persisted intermediates: an operator-level .persist()
            # must rebuild inside the timed window, not serve from the
            # previous run via the cache manager's plan matching
            spark.catalog.clearCache()
            df = fn(spark, SF_DIR)  # fresh plan: no shuffle-output reuse
            t0 = time.perf_counter()
            df.toPandas()  # analysis + optimize + ALL stages + fetch
            best = min(best, time.perf_counter() - t0)
        times[short] = round(best, 4)
    return times


def _time_longtail(spark, reg) -> dict[str, float]:
    """Non-summed long-tail extras: construction INCLUDED in the timed
    window (see the LONGTAIL comment), warm once, best-of-3."""
    times: dict[str, float] = {}
    for short, name in LONGTAIL:
        fn = reg[name].fn
        fn(spark, SF_DIR).toPandas()  # warm: codegen cache + OS page cache
        best = float("inf")
        for _ in range(N_RUNS_LONGTAIL):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).toPandas()  # construction + all stages + fetch
            best = min(best, time.perf_counter() - t0)
        times[short] = round(best, 4)
    return times


# Headline = PER-QUERY PINNED AQE config (BASELINE.md §"AQE
# decision table" — the frozen resolution of the r3/r4 on/off
# flip-flop). Both full sweeps still run and are published, so the
# headline is assembled from measured numbers, r1-r4 columns stay
# comparable, and the pin can be re-audited every round. Pins:
# AQE-on only where it wins the interleaved same-session A/B at
# the bench scale (sf0.1) — q21 only (on beat off in all three
# r5 interleaved rounds, 605/616, 419/470, 424/434 ms, agreeing
# with r4's decisive 388 vs 647 ms) — and AQE-off elsewhere,
# where the per-stage barrier is a pure 40-120 ms tax on
# sub-second plans (bitmap_rollup's apparent r4 deltas in both
# directions did not survive interleaved re-measurement: 384/319,
# 266/270, 234/253 ms = parity, so it takes the majority off
# config). At 100 TB AQE stays ON for everything (stage barriers
# amortize; skew/coalesce wins grow) — the pin is a STATEMENT
# ABOUT THIS BOX AND THE BENCH SCALE, which is what the bench
# measures; the sf1/sf3 crossover tables in BASELINE.md publish
# per-scale winners separately. Module-level (r15) so
# tools/capture_plans.py imports THIS map instead of a hand-copied
# duplicate that could silently drift from the timed config.
AQE_PIN = {
    "q1": "off",
    "q3": "off",
    "q5": "off",
    "window_topk": "off",
    "events_hourly": "off",
    "q9": "off",
    "q21": "on",
    "minhash": "off",
    "bitmap_rollup": "off",
    "q3_bucketed": "off",  # same pin as q3 (identical query shape)
    # OPPOSITE pin from plain q21: the write-time layout deletes the
    # skewed fact shuffle AQE was fixing, leaving only the per-stage
    # barrier tax — off won all three r8 interleaved sf0.1 A/Bs
    # (284/231, 304/260, 295/234 ms on/off).
    "q21_bucketed": "off",
    # round-10 extra: off wins 2 of 3 fresh interleaved sf0.1
    # sessions (917/980, 1021/968, 1128/1087 ms on/off) — noise
    # band, majority keeps the default off.
    "decontaminate": "off",
    # round-11 extra: off wins all three fresh interleaved sf0.1
    # sessions decisively (168/124, 196/146, 181/129 ms on/off) —
    # a 2-file scan + one tiny agg is pure stage-barrier tax
    # territory for AQE.
    "manifest_prune": "off",
    # round-12 extra: off wins 2 of 3 fresh interleaved sf0.1
    # rounds (198/174, 190/136, 152/162 ms on/off) — the DV read
    # is scan + one agg, same barrier-tax territory as
    # manifest_prune; majority keeps the default off.
    "dv_read": "off",
    # round-15 long-tail extras: pins from 3-round interleaved sf0.1
    # A/Bs (construction included, matching _time_longtail):
    # sim_neardup_pairs off 3/3 (2.37/2.12, 2.20/1.93, 2.18/2.05 on/off),
    # agg_approx_percentiles off 3/3 (1.40/1.31, 1.28/1.24, 1.56/1.23),
    # dedup_simhash off 2/3 noise band (0.87/0.92, 0.84/0.83, 0.82/0.80),
    # sql_recursive_reachability ON 3/3 decisively (1.88/2.50, 1.78/2.13,
    # 1.79/2.07) — the per-iteration UnionLoop stages benefit from AQE's
    # runtime coalescing of the frontier shuffles.
    "sim_neardup_pairs": "off",
    "agg_approx_percentiles": "off",
    "dedup_simhash": "off",
    "sql_recursive_reachability": "on",
}


def main() -> None:
    spark = get_spark("dbt_slabbing_spark_bench")
    # Local-small-data knobs (runtime confs; cluster runs re-size these).
    split = os.environ.get("SPARK_GRAFT_SPLIT") or str(_auto_split_bytes(SF_DIR))
    spark.conf.set("spark.sql.files.maxPartitionBytes", split)
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "16"))
    reg = registry()
    times_aqe_on = _time_headline(spark, reg)  # AQE on: the session default
    times_aqe_on.update(_time_longtail(spark, reg))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    times_aqe_off = _time_headline(spark, reg)
    times_aqe_off.update(_time_longtail(spark, reg))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    times = {
        s: (times_aqe_on[s] if AQE_PIN[s] == "on" else times_aqe_off[s])
        for s in [s for s, _, _summed in HEADLINE] + [s for s, _ in LONGTAIL]
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # "value" stays the sum of the 8 BASELINE.md-comparable queries so it
    # is comparable to BENCH_r1-r8 and the oracle; extras are reported
    # per-query but never summed (the summed flag is structural, on the
    # HEADLINE tuples).
    _base8 = [s for s, _, summed in HEADLINE if summed]
    assert len(_base8) == 8, f"headline series must stay 8-query comparable: {_base8}"
    print(
        json.dumps(
            {
                "metric": "sum_warm_query_sec_headline8",
                "value": round(sum(times[s] for s in _base8), 4),
                "unit": "sec",
                "queries": times,
                "aqe_pin": AQE_PIN,
                "queries_aqe_on": times_aqe_on,
                "value_aqe_on": round(sum(times_aqe_on[s] for s in _base8), 4),
                "queries_aqe_off": times_aqe_off,
                "value_aqe_off": round(sum(times_aqe_off[s] for s in _base8), 4),
                "sf": float(sf),
                "runs": N_RUNS,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "split": split,
            }
        )
    )


if __name__ == "__main__":
    main()
