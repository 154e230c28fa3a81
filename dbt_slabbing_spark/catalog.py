"""Table catalog over the driver-generated TESTDATA parquet.

Scans stay declarative (``spark.read.parquet``) so Catalyst gets filter
pushdown, column pruning, and partition pruning for free. At 100 TB the
same catalog points at a partitioned lake layout (e.g. ``orders``
partitioned by ``o_orderdate`` month); nothing here assumes local files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables that are always small relative to the facts; query code
#: broadcasts these explicitly so the 100 TB plan never sort-merge-joins a
#: 5-row region table against a shuffled fact.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one TESTDATA table as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright. We read it as raw nanos
    (``nanosAsLong``) and truncate to a microsecond timestamp — the
    generator emits µs-aligned values, so no information is lost and the
    DuckDB oracle (which reads TIMESTAMP_NS natively) sees identical
    instants.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every TESTDATA table. Lazy — no jobs run until an action."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for the SQL API surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
