"""Merge / upsert / SCD2 without a table format (pyspark_guide.md
"CDC / SCD2 → emulate with anti-join + union + window").

Immutable-parquet semantics: each operator returns the NEW state of the
table; the caller persists it (rewrite-on-merge). At 100 TB you'd
partition the target so only touched partitions rewrite (dynamic
partition overwrite), or move to Delta/Iceberg for file-level merge —
``sinks.merge_into`` is the gated hook for that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """UPDATE matched + INSERT unmatched (updates win; both sides must
    share the target schema). One broadcast-able anti-join + union."""
    surviving = target.join(updates.select(key), key, "left_anti")
    return surviving.unionByName(updates.select(*target.columns))


def dedup_updates(updates: DataFrame, key: str, order_col: str) -> DataFrame:
    """Keep only the LATEST change per key (CDC compaction) — the same
    last-state-wins fold as the reference's lesion loop (SURVEY §2.3)."""
    w = Window.partitionBy(key).orderBy(F.desc(order_col))
    return updates.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    change_time_col: str,
    tracked_cols: list[str],
    end_of_time: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """Slowly-changing-dimension type 2.

    ``dim``     : key, tracked cols, valid_from, valid_to, is_current
    ``changes`` : key, tracked cols, ``change_time_col``

    Rows whose tracked values actually changed close the current
    version (valid_to = change time) and append a new current one;
    no-op changes are dropped (null-safe comparison on every tracked
    column).
    """
    eot = F.lit(end_of_time).cast("timestamp")
    changed_cond: Column = F.lit(False)
    for c in tracked_cols:
        changed_cond = changed_cond | ~F.col(f"d.{c}").eqNullSafe(F.col(f"c.{c}"))

    current = dim.filter(F.col("is_current")).alias("d")
    incoming = changes.alias("c")

    # changes joined to the current version; keep real changes + brand-new keys
    joined = incoming.join(current, F.col(f"c.{key}") == F.col(f"d.{key}"), "left")
    real = joined.filter(F.col(f"d.{key}").isNull() | changed_cond)

    new_versions = real.select(
        F.col(f"c.{key}").alias(key),
        *[F.col(f"c.{c}").alias(c) for c in tracked_cols],
        F.col(f"c.{change_time_col}").alias("valid_from"),
        eot.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closing_keys = real.filter(F.col(f"d.{key}").isNotNull()).select(
        F.col(f"c.{key}").alias("_ck"), F.col(f"c.{change_time_col}").alias("_close_at")
    )
    closed = (
        dim.join(F.broadcast(closing_keys), (F.col(key) == F.col("_ck")) & F.col("is_current"), "left")
        .withColumn("valid_to", F.when(F.col("_ck").isNotNull(), F.col("_close_at")).otherwise(F.col("valid_to")))
        .withColumn("is_current", F.when(F.col("_ck").isNotNull(), F.lit(False)).otherwise(F.col("is_current")))
        .drop("_ck", "_close_at")
    )
    return closed.unionByName(new_versions)
