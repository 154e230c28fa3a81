"""Capture `.explain("formatted")` for bench headline queries (and any
extra registry queries) into plans/<tag>/<short>_<suffix>.txt.

Mirrors the bench session exactly (same runtime confs, same per-query
AQE pin) so the captured plan is the shape the bench times.

Usage:
    python tools/capture_plans.py --tag r14 --suffix before
    python tools/capture_plans.py --tag r14 --suffix after --only minhash,q21
    python tools/capture_plans.py --tag r14 --suffix before --extra dedup_simhash_pairs
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, help="plans/<tag>/ output dir")
    ap.add_argument("--suffix", required=True, help="before|after")
    ap.add_argument("--only", default="", help="comma-separated headline shorts")
    ap.add_argument(
        "--extra",
        default="",
        help="comma-separated registry names (saved under their own name)",
    )
    args = ap.parse_args()

    from bench import _CUSTOM_FNS, HEADLINE, _auto_split_bytes
    from dbt_slabbing_spark.queries import registry
    from dbt_slabbing_spark.session import get_spark

    out = pathlib.Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag)
    out.mkdir(parents=True, exist_ok=True)

    spark = get_spark("dbt_slabbing_spark_plans")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(_auto_split_bytes(SF_DIR)))
    spark.conf.set("spark.sql.shuffle.partitions", "16")

    only = {n for n in args.only.split(",") if n}
    reg = registry()
    # the bench's per-query AQE pin, imported from bench.py itself so
    # the captured plan == the timed plan even when pins change
    from bench import AQE_PIN as aqe_pin
    from bench import LONGTAIL

    rows = [(s, n, None) for s, n, _summed in HEADLINE]
    rows += [(s, n, None) for s, n in LONGTAIL]
    for short, name, _ in rows:
        if only and short not in only:
            continue
        fn = reg[name].fn if name else _CUSTOM_FNS[short]
        spark.conf.set("spark.sql.adaptive.enabled", "true" if aqe_pin.get(short, "off") == "on" else "false")
        df = fn(spark, SF_DIR)
        path = out / f"{short}_{args.suffix}.txt"
        path.write_text(explain_str(df))
        print(f"wrote {path}")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    for name in (n for n in args.extra.split(",") if n):
        df = reg[name].fn(spark, SF_DIR)
        path = out / f"{name}_{args.suffix}.txt"
        path.write_text(explain_str(df))
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
