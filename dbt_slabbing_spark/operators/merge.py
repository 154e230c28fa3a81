"""Merge / upsert / SCD2 without a table format (pyspark_guide.md
"CDC / SCD2 → emulate with anti-join + union + window").

Immutable-parquet semantics: each operator returns the NEW state of the
table; the caller persists it (rewrite-on-merge). At 100 TB you'd
partition the target so only touched partitions rewrite (dynamic
partition overwrite), or move to Delta/Iceberg for file-level merge —
``sinks.merge_into`` is the gated hook for that.
"""

from __future__ import annotations

from collections.abc import Callable

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

    A batch may carry SEVERAL changes for one key: changes are ordered
    by ``change_time_col`` per key, no-ops vs their in-batch predecessor
    (or vs the current dim row for the first) are dropped, survivors are
    chain-versioned (valid_to = next survivor's change time), and only
    the LAST survivor stays ``is_current``. The current dim version
    closes once, at the first surviving change time.
    """
    eot = F.lit(end_of_time).cast("timestamp")

    current = dim.filter(F.col("is_current")).alias("d")
    incoming = changes.alias("c")

    # deterministic intra-key order even on change-time ties
    order_cols = [F.col(f"c.{change_time_col}")] + [F.col(f"c.{c}") for c in tracked_cols]
    w = Window.partitionBy(F.col(f"c.{key}")).orderBy(*order_cols)

    joined = incoming.join(current, F.col(f"c.{key}") == F.col(f"d.{key}"), "left")
    # NULL struct ⟺ no in-batch predecessor (an all-null tracked row
    # still yields a non-null struct, so the marker can't false-trigger)
    prev = F.lag(F.struct(*[F.col(f"c.{c}").alias(c) for c in tracked_cols])).over(w)
    staged = joined.withColumn("_prev", prev)

    def _any_diff(base: Callable[[str], Column]) -> Column:
        cond: Column = F.lit(False)
        for c in tracked_cols:
            cond = cond | ~F.col(f"c.{c}").eqNullSafe(base(c))
        return cond

    diff_vs_prev = _any_diff(lambda c: F.col(f"_prev.{c}"))
    diff_vs_dim = F.col(f"d.{key}").isNull() | _any_diff(lambda c: F.col(f"d.{c}"))
    # dropped rows equal their predecessor, so "differs from immediate
    # predecessor" ⟺ "differs from the last SURVIVING predecessor"
    real = staged.filter(
        F.when(F.col("_prev").isNotNull(), diff_vs_prev).otherwise(diff_vs_dim)
    )

    w_next = Window.partitionBy(F.col(f"c.{key}")).orderBy(*order_cols)
    next_change = F.lead(F.col(f"c.{change_time_col}")).over(w_next)
    new_versions = real.select(
        F.col(f"c.{key}").alias(key),
        *[F.col(f"c.{c}").alias(c) for c in tracked_cols],
        F.col(f"c.{change_time_col}").alias("valid_from"),
        F.coalesce(next_change.cast("timestamp"), eot).alias("valid_to"),
        next_change.isNull().alias("is_current"),
    )
    # exactly ONE closing row per key (the earliest surviving change) —
    # a multi-change batch must not fan out the dim-side left join
    closing_keys = (
        real.filter(F.col(f"d.{key}").isNotNull())
        .groupBy(F.col(f"c.{key}").alias("_ck"))
        .agg(F.min(F.col(f"c.{change_time_col}")).alias("_close_at"))
    )
    closed = (
        dim.join(F.broadcast(closing_keys), (F.col(key) == F.col("_ck")) & F.col("is_current"), "left")
        .withColumn("valid_to", F.when(F.col("_ck").isNotNull(), F.col("_close_at")).otherwise(F.col("valid_to")))
        .withColumn("is_current", F.when(F.col("_ck").isNotNull(), F.lit(False)).otherwise(F.col("is_current")))
        .drop("_ck", "_close_at")
    )
    return closed.unionByName(new_versions)


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    order_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Full CDC apply: insert/update/DELETE from a change feed.

    ``changes`` carries the target schema plus ``op_col`` ('I'/'U'/'D'
    — only ``delete_op`` is interpreted; inserts and updates are both
    "latest row wins") and ``order_col`` (LSN / commit timestamp).
    Compaction keeps only the LATEST change per key — a key whose final
    change is a delete is removed even if earlier changes in the same
    batch inserted it; a re-insert AFTER a delete survives. That is
    exactly Debezium-style snapshot semantics, and the same
    last-state-wins fold as the reference's lesion loop (SURVEY §2.3).

    One window (compaction) + one anti-join (drop touched keys) + one
    union (surviving latest non-deletes). All shuffles key on ``key``;
    broadcastable when the change batch is small — the 100 TB nightly
    CDC case.
    """
    latest = dedup_updates(changes, key, order_col)
    untouched = target.join(latest.select(key), key, "left_anti")
    survivors = latest.filter(F.col(op_col) != delete_op).select(*target.columns)
    return untouched.unionByName(survivors)
