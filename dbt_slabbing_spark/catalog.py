"""Table catalog over the driver-generated TESTDATA parquet.

Scans stay declarative (``spark.read.parquet``) so Catalyst gets filter
pushdown, column pruning, and partition pruning for free. At 100 TB the
same catalog points at a partitioned lake layout (e.g. ``orders``
partitioned by ``o_orderdate`` month); nothing here assumes local files.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

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

#: Dimension tables. Only ``region`` (5 rows) and ``nation`` (25 rows) are
#: BOUNDED and safe to broadcast unconditionally; query code hints those with
#: ``F.broadcast`` so even a stats-less plan never sort-merge-joins them.
#: ``customer``/``supplier``/``part`` grow linearly with the fact tables
#: (TPC-H scaling) — at the 100 TB design point they are terabytes, so a
#: hard-coded broadcast would OOM every executor. Their join strategy is left
#: to ``spark.sql.autoBroadcastJoinThreshold`` (picks broadcast from file-size
#: stats at test SF) and AQE's runtime broadcast conversion at scale.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})
BOUNDED_DIM_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to Python workers via ``addPyFile`` (once per
    SparkContext).

    Module-level UDF callables (applyInPandas bodies, UDTF classes,
    mapInPandas/mapInArrow iterators) are cloudpickled BY REFERENCE, so
    the worker process must be able to ``import dbt_slabbing_spark``.
    When the consumer drives a vanilla session from a cwd that doesn't
    contain the repo (the round driver's contract), the worker's
    sys.path has no such entry and every one of those queries dies with
    a worker ImportError. The zip lands on each worker's sys.path — cwd
    and PYTHONPATH no longer matter.
    """
    sc = spark.sparkContext
    if getattr(sc, "_dbt_slabbing_pyfiled", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # mkstemp, not a predictable /tmp name: a pid-keyed shared path can
    # be pre-created/symlinked by another local user or collide on pid
    # reuse and ship a stale zip into a fresh context.
    fd, zip_path = tempfile.mkstemp(prefix="dbt_slabbing_spark_pkg_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._dbt_slabbing_pyfiled = True


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one TESTDATA table as a DataFrame.

    ``events.ts`` has shipped in two physical encodings across testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    reader only accepts as raw nanos via ``nanosAsLong``) and
    TIMESTAMP(MICROS) without the UTC-adjustment flag (which Spark reads
    as TIMESTAMP_NTZ). Both are normalized here to a session-TZ
    TIMESTAMP: the session pins UTC (session.py), so the NTZ→LTZ cast
    re-interprets the naive values as UTC instants — exactly how the
    DuckDB oracle treats them — and downstream event-time code
    (watermarks, ``unix_millis``, window frames) sees one stable type.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_workers_can_import(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return _normalize_event_time(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _normalize_event_time(df: DataFrame) -> DataFrame:
    """Coerce ``ts`` to TIMESTAMP (LTZ) whatever the parquet encoding."""
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":  # TIMESTAMP(NANOS) read as raw nanos
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if dtype == "timestamp_ntz":  # TIMESTAMP(MICROS), isAdjustedToUTC=false
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every TESTDATA table. Lazy — no jobs run until an action."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for the SQL API surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
