"""Local replica of the driver's sf0.01 correctness gate.

Runs every registry query that has an oracle against DuckDB on the same
parquet dir and reports, per query: row-count match, column-name match,
value match (canonical, type-tolerant) and pandas-dtype match (the
driver's value hash is dtype-sensitive — an int64 engine column vs a
float64 oracle column hashes differently even when values are equal, as
round 3's `text_rolling_hash_fingerprint` red row proved).

Usage:
    python tools/parity_sweep.py [--sf /root/testdata/sf0.01] [--prefix 50]
                                 [--only name1,name2] [--start-at name]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from dbt_slabbing_spark.queries import registry
from dbt_slabbing_spark.session import get_spark
from tests.canonical import canonical_rows

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--prefix", type=int, default=0, help="check only the first N registry entries (0 = all)")
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument("--start-at", default="", help="skip entries before this name")
    ap.add_argument("--out", default="/tmp/parity_sweep.json")
    args = ap.parse_args()

    reg = registry()
    names = list(reg)
    if args.prefix:
        names = names[: args.prefix]
    if args.only:
        names = [n for n in args.only.split(",") if n]
    if args.start_at and args.start_at in names:
        names = names[names.index(args.start_at):]

    spark = get_spark("parity_sweep", cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    results: dict[str, dict] = {}
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        q = reg[name]
        t0 = time.time()
        row: dict = {}
        try:
            spdf = q.fn(spark, args.sf).toPandas()
            if q.oracle is None:
                row = {"status": "rows_only", "rows": len(spdf)}
                n_rowsonly += 1
            else:
                opdf = con.sql(q.oracle).df()
                rows_match = len(spdf) == len(opdf)
                cols_match = sorted(spdf.columns) == sorted(opdf.columns)
                values_match = False
                dtype_diffs = {}
                if rows_match and cols_match:
                    values_match = canonical_rows(spdf) == canonical_rows(opdf)
                    for c in sorted(spdf.columns):
                        a, b = str(spdf[c].dtype), str(opdf[c].dtype)
                        if a != b:
                            # datetime64 unit (ns vs us) does not affect the
                            # driver's hash: r1-r3 green rows include
                            # date_trunc outputs where Spark/DuckDB differ
                            # in unit. int-vs-float DOES flip it (r3 red).
                            if a.startswith("datetime64") and b.startswith("datetime64"):
                                continue
                            # integer WIDTH is also tolerated (int32 vs
                            # int64 repr identically): ts_retention_cohorts
                            # was driver-green in r3 with exactly that pair.
                            if a.startswith("int") and b.startswith("int"):
                                continue
                            dtype_diffs[c] = [a, b]
                ok = rows_match and cols_match and values_match and not dtype_diffs
                row = {
                    "status": "pass" if ok else "FAIL",
                    "rows": [len(spdf), len(opdf)],
                    "rows_match": rows_match,
                    "cols_match": cols_match,
                    "values_match": values_match,
                    "dtype_diffs": dtype_diffs,
                }
                if ok:
                    n_pass += 1
                else:
                    n_fail += 1
                    if not cols_match:
                        row["cols"] = [sorted(spdf.columns), sorted(opdf.columns)]
                    if rows_match and cols_match and not values_match:
                        s, o = canonical_rows(spdf), canonical_rows(opdf)
                        row["first_diffs"] = [
                            (repr(a), repr(b)) for a, b in zip(s, o) if a != b
                        ][:3]
        except Exception as e:  # noqa: BLE001 — sweep must survive any query failure
            row = {"status": "ERROR", "error": f"{type(e).__name__}: {e}",
                   "trace": traceback.format_exc()[-1500:]}
            n_fail += 1
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        flag = row["status"]
        print(f"[{flag:>9}] {name} ({row['sec']}s)"
              + (f" dtype_diffs={row.get('dtype_diffs')}" if row.get("dtype_diffs") else ""),
              flush=True)

    summary = {"pass": n_pass, "fail": n_fail, "rows_only": n_rowsonly, "total": len(names)}
    print(json.dumps(summary))
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1, default=str)
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
