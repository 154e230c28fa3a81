"""SparkSession factory.

One place to encode the execution-model decisions that matter at scale:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  broadcast conversion) — at 100 TB the static plan is always wrong
  somewhere; AQE fixes it from shuffle statistics.
- shuffle.partitions sized to the local core count for tests; on a real
  cluster this is overridden to ~2-3x total executor cores (or left to
  AQE's coalescing with a high initial value).
- Arrow enabled — every pandas UDF crossing is Arrow-batched, never
  row-at-a-time pickle.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (naive-UTC) exactly.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "dbt_slabbing_spark", cpus: str | int | None = None) -> SparkSession:
    """Return (creating if needed) the tuned local SparkSession.

    On a real cluster the same builder is used minus ``master``; every
    config below is a per-app setting, not a local-mode hack.
    """
    cpus = str(cpus or _DEF_CPUS)
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # -- planner / runtime ------------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        # dims (region/nation/customer/supplier/part at test SF) broadcast;
        # 64 MB is a sane executor-memory-aware ceiling for real clusters too.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # openCostInBytes models the seek cost of opening ANOTHER file
        # when packing many small files into one split; its 4 MB
        # default doubles as a split-size FLOOR, which on a single
        # small-but-expensive-per-row file (compressed text, embedding
        # arrays) caps read parallelism at bytes/4MB tasks — the sf3
        # documents corpus (18 MB) scanned 5-wide on 32 cores, and the
        # whole shingle pipeline above it ran underparallelized
        # (measured round 10: the decontamination corpus stage). 256 KB
        # keeps small-file packing sane while letting maxSplitBytes
        # fall to totalBytes/defaultParallelism, i.e. one split per
        # core. At cluster scale files dwarf both constants and this
        # knob is inert.
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        # -- python boundary --------------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # -- semantics --------------------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # -- local-mode memory (driver == only JVM here) ----------------------
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.checkpointLocation.deleteOnExit", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
