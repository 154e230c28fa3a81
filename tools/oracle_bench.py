"""Re-measure the DuckDB oracle for the bench headline queries.

Mirrors BASELINE.md §2 methodology: DuckDB, 4 threads, parquet views over
$SPARK_GRAFT_SF_DIR (default sf0.1), warm cache, best-of-7, result fully
fetched. Run this on the SAME DAY as `bench.py` — the box drifts ±35%
between rounds, so engine/oracle ratios are only meaningful same-day.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from dbt_slabbing_spark.queries import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "7"))
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

EVENTS_HOURLY_SQL = """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round((sum(value)) * 100.0) / 100.0 AS total_value
    FROM events GROUP BY window_start, event_type
"""


def main() -> None:
    from bench import HEADLINE  # single source of truth for the entry list

    con = duckdb.connect()
    con.sql("SET threads TO 4")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    reg = registry()
    times: dict[str, float] = {}
    for short, name, _summed in HEADLINE:
        sql = reg[name].oracle if name else EVENTS_HOURLY_SQL
        con.sql(sql).df()  # warm
        con.sql(sql).df()
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            con.sql(sql).df()
            best = min(best, time.perf_counter() - t0)
        times[short] = round(best, 4)
    base = [s for s, _, summed in HEADLINE if summed]
    print(json.dumps({"metric": "oracle_warm_query_sec", "queries": times,
                      "value": round(sum(times[s] for s in base), 4), "sf": SF_DIR}))


if __name__ == "__main__":
    main()
