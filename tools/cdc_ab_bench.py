"""A/B: change-feed extraction cost with vs without commit-time CDC.

The round-13 verdict's scale-killer: `read_changes` over any range
containing a DV delete fell back to reading BOTH boundary snapshots in
full and double-`exceptAll`-ing them — O(table) scan + O(table)
shuffle per incremental pull. Round 14 stages change rows at commit
time (Delta CDF's `_change_data`), so the same pull reads only the
staged change files. This tool measures both paths on the same table
and range — the steady-DV-delete tailing scenario (a consumer pulling
after each of K small deletes against a large fact).

Usage:
    python tools/cdc_ab_bench.py [--src /tmp/sf10/events.parquet]
                                 [--n-deletes 4] [--files 32]

Prints one JSON line:
    {"rows": N, "pull_commit_time_cdc": s, "pull_fallback": s,
     "speedup": x, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf10/events.parquet")
    ap.add_argument("--n-deletes", type=int, default=4)
    ap.add_argument("--files", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dbt_slabbing_spark.operators import layout
    from dbt_slabbing_spark.operators.layout import (
        append_files,
        delete_rows,
        manifest_versions,
        read_changes,
    )
    from dbt_slabbing_spark.session import get_spark

    spark = get_spark("cdc_ab_bench", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    work = tempfile.mkdtemp(prefix="cdc_ab_")
    shutil.rmtree(work)
    try:
        ev = spark.read.parquet(args.src).select(
            "event_id", "user_id", "event_type", "value"
        )
        t0 = time.time()
        append_files(spark, work, ev.repartition(args.files))
        build_s = time.time() - t0
        n_rows = spark.read.parquet(args.src).count()
        v0 = manifest_versions(work)[-1]
        # steady DV deletes: K small targeted deletes (the tailing
        # consumer's contention scenario)
        t0 = time.time()
        deleted = 0
        for i in range(args.n_deletes):
            st = delete_rows(
                spark, work, f"event_id % 100000 = {i}", mode="dv"
            )
            deleted += st["rows_deleted"]
        mutate_s = time.time() - t0
        v1 = manifest_versions(work)[-1]

        def _pull() -> tuple[float, int]:
            t = time.time()
            n = read_changes(spark, work, v0, v1).count()
            return time.time() - t, n

        # writer-side A/B: what does staging change rows cost the
        # mutation itself? Same deletes on a fresh clone of the table
        # with staging no-op'd (the pre-r14 writer shape).
        work2 = tempfile.mkdtemp(prefix="cdc_ab_nostage_")
        shutil.rmtree(work2)
        append_files(spark, work2, ev.repartition(args.files))
        real_stage = layout._stage_change_rows
        layout._stage_change_rows = lambda *a, **k: []
        try:
            t0 = time.time()
            for i in range(args.n_deletes):
                delete_rows(
                    spark, work2, f"event_id % 100000 = {i}", mode="dv"
                )
            mutate_nostage_s = time.time() - t0
        finally:
            layout._stage_change_rows = real_stage
            shutil.rmtree(work2, ignore_errors=True)

        # warm + measure the commit-time path (median of 3)
        _pull()
        a_times, a_n = [], 0
        for _ in range(3):
            s, a_n = _pull()
            a_times.append(s)
        # force the fallback: hide the CDC records from the reader
        real = layout._cdc_range_records
        layout._cdc_range_records = lambda *a, **k: None
        try:
            _pull()
            b_times, b_n = [], 0
            for _ in range(3):
                s, b_n = _pull()
                b_times.append(s)
        finally:
            layout._cdc_range_records = real
        a, b = sorted(a_times)[1], sorted(b_times)[1]
        print(
            json.dumps(
                {
                    "src": args.src,
                    "rows": int(n_rows),
                    "files": args.files,
                    "n_deletes": args.n_deletes,
                    "rows_deleted": int(deleted),
                    "build_s": round(build_s, 2),
                    "mutate_s": round(mutate_s, 2),
                    "mutate_nostage_s": round(mutate_nostage_s, 2),
                    "writer_overhead_pct": round(
                        100.0 * (mutate_s - mutate_nostage_s) / mutate_nostage_s, 1
                    ),
                    "pull_commit_time_cdc_s": round(a, 3),
                    "pull_fallback_s": round(b, 3),
                    "speedup": round(b / a, 1) if a > 0 else None,
                    "change_rows_cdc": int(a_n),
                    "change_rows_fallback": int(b_n),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
