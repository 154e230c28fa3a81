"""Run any registry query from the command line.

    python tools/run_query.py q3_shipping_priority
    python tools/run_query.py dedup_minhash_lsh --sf-dir /root/testdata/sf0.1 -n 50
    python tools/run_query.py q3_bucketed_layout --explain
    python tools/run_query.py --list [--tag dedup]

The engine-as-a-product entry point: the registry is the query surface
(237 named queries, COVERAGE.md maps them to the reference + the §2.6
inventory), and this runner is how a shell user executes one against a
parquet directory — show rows, or `--explain` the executed physical
plan (the formatted mode the SCALE.md audits quote).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="registry query name")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("-n", "--rows", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the formatted physical plan instead of rows")
    ap.add_argument("--list", action="store_true", help="list registry queries (name, tags, description)")
    ap.add_argument("--tag", default=None, help="with --list: filter by tag substring")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    from dbt_slabbing_spark.queries import registry

    reg = registry()
    if args.list or not args.query:
        for name, q in reg.items():
            if args.tag and not any(args.tag in t for t in q.tags):
                continue
            tags = ",".join(q.tags)
            print(f"{name:42s} [{tags}] {q.description.splitlines()[0][:80]}")
        return 0

    if args.query not in reg:
        import difflib

        close = difflib.get_close_matches(args.query, reg.keys(), n=5)
        print(f"unknown query {args.query!r}; close matches: {close}", file=sys.stderr)
        return 2

    from dbt_slabbing_spark.session import get_spark

    spark = get_spark("dbt_slabbing_spark_cli", cpus=args.cpus)
    df = reg[args.query].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
