"""Time every registry query (noop sink — guide §1.4) and rank them.

The optimization-round work queue builder: one warm run + best-of-N
timed runs per query against $SPARK_GRAFT_SF_DIR, computation timed via
`df.write.format("noop")` so the sink/fetch cost doesn't blur the
ranking (bench.py keeps its own toPandas methodology — this tool ranks,
it does not replace the bench).

Usage:
    python tools/perf_sweep.py [--runs 2] [--only a,b] [--start-at name]
                               [--tag substr] [--out /tmp/sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", default="")
    ap.add_argument("--start-at", default="")
    ap.add_argument("--tag", default="")
    ap.add_argument("--out", default="/tmp/perf_sweep.json")
    args = ap.parse_args()

    from bench import _auto_split_bytes
    from dbt_slabbing_spark.queries import registry
    from dbt_slabbing_spark.session import get_spark

    spark = get_spark("dbt_slabbing_spark_perf_sweep")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(_auto_split_bytes(SF_DIR)))
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "16"))

    only = {n for n in args.only.split(",") if n}
    reg = registry()
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    started = not args.start_at
    for name, q in reg.items():
        if not started:
            if name == args.start_at:
                started = True
            else:
                continue
        if only and name not in only:
            continue
        if args.tag and not any(args.tag in t for t in q.tags):
            continue
        spark.sparkContext.setJobDescription(f"perf_sweep: {name}")
        try:
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(args.runs):
                spark.catalog.clearCache()
                df = q.fn(spark, SF_DIR)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 4)
            print(f"{times[name]:8.3f}s  {name}", flush=True)
        except Exception:
            errs[name] = traceback.format_exc(limit=3)
            print(f"   ERROR  {name}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    with open(args.out, "w") as f:
        json.dump({"sf_dir": SF_DIR, "runs": args.runs, "times": ranked, "errors": errs}, f, indent=1)
    print(f"\n=== top 25 ({SF_DIR}) ===")
    for name, sec in list(ranked.items())[:25]:
        print(f"{sec:8.3f}s  {name}")
    print(f"total {sum(times.values()):.1f}s over {len(times)} queries; {len(errs)} errors -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
