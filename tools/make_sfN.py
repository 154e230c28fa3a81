"""Scale the driver's sf0.1 testdata to sfN by replica key-shifting.

BASELINE.md's floor analysis predicts the engine/oracle crossover at
≈ sf1: seven of nine headline queries are sub-100 ms oracle rows at
sf0.1, below Spark's measured ~100-230 ms empty-plan floor, so the 2×
gate is unpassable there BY CONSTRUCTION. This tool materializes the
sf1 (or larger) dataset that turns the floor argument into a
measurement — run bench.py and tools/oracle_bench.py against the
output dir, same-day interleaved.

Method: K = N/0.1 shifted replicas of every sf0.1 table.

- Fact/entity keys shift by table-stride×replica (custkey, orderkey,
  suppkey, partkey, event_id, user_id, doc_id, vec_id), preserving
  every join relationship and per-key density: sfN has K× the
  customers with the same orders-per-customer, K× the orders with the
  same lines-per-order — the same shape the driver's generator
  produces as sf grows (its dims scale linearly with sf too).
- region/nation stay fixed (constant-size dims, TPC-H convention);
  nationkey/date/status/type columns keep their exact sf0.1
  distributions.
- documents: every token of replica i>0 is prefixed `r{i}` (and
  n_chars recomputed), so replicas share NO shingles — near-dup
  density per band key stays at the sf0.1 level instead of every doc
  gaining K-1 exact clones (which would quadratically distort the
  minhash workload, not scale it).
- embeddings replicate with shifted vec_id (bucket density grows K×,
  the honest effect of a bigger corpus on a fixed-grid LSH/IVF).

Deterministic (pure SQL over the frozen sf0.1 input, no RNG).

Usage: python tools/make_sfN.py [--out /tmp/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

STRIDES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
COPY_ONLY = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--tables",
        default="",
        help="comma-separated subset (default: all); dims region/nation always copied",
    )
    args = ap.parse_args()
    only = set(t for t in args.tables.split(",") if t)
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    for t in COPY_ONLY:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, strides in STRIDES.items():
        if only and t not in only:
            continue
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()]
        selects = []
        for i in range(args.factor):
            exprs = []
            for c in cols:
                if c in strides:
                    exprs.append(f"{c} + {i * strides[c]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    exprs.append(rf"regexp_replace(text, '(\S+)', 'r{i}\1', 'g') AS text")
                elif t == "documents" and c == "n_chars" and i > 0:
                    exprs.append(
                        rf"CAST(len(regexp_replace(text, '(\S+)', 'r{i}\1', 'g')) AS BIGINT) AS n_chars"
                    )
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM read_parquet('{SRC}/{t}.parquet')"
            )
        union = " UNION ALL ".join(selects)
        # ROW_GROUP_SIZE: DuckDB's default (122,880 rows) packs the
        # expensive-per-row tables into 1-2 row groups at sfN —
        # documents (wide text) and embeddings (wide arrays) then scan
        # with 1-2-way parallelism in ANY reader that splits at
        # row-group granularity (Spark tasks; DuckDB parallelizes
        # within groups so it never noticed). A real 100 TB corpus is
        # thousands of files/row groups; 4,096 rows per group gives the
        # replicas that shape (sf3 documents: 2 -> 37 groups) without
        # changing a byte of data. Fact tables keep the default (they
        # already get 100+ groups).
        rgs = " , ROW_GROUP_SIZE 4096" if t in ("documents", "embeddings") else ""
        con.sql(f"COPY ({union}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET{rgs})")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
