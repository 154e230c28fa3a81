"""dbt-style data tests (schema tests) over DataFrames: unique,
not_null, accepted_values, relationships — the four built-ins every dbt
project leans on, re-expressed as Spark aggregates.

Each check returns a FAILURE COUNT computed as one aggregate (no
collect of row-level data), so a 100 TB table costs one scan per check
— and `run_checks` unions the per-check counts into a single action so
Spark can share the scan across checks on the same table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    name: str
    failures: int

    @property
    def passed(self) -> bool:
        return self.failures == 0


def unique_check(df: DataFrame, col: str) -> DataFrame:
    """Rows participating in a duplicate key (0 = unique)."""
    dupes = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("failures"))
    )
    return dupes.select(F.lit(f"unique:{col}").alias("name"), "failures")


def not_null_check(df: DataFrame, col: str) -> DataFrame:
    # coalesce: SUM over zero rows is NULL, and an empty table passes
    return df.agg(
        F.coalesce(F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("failures")
    ).select(F.lit(f"not_null:{col}").alias("name"), "failures")


def accepted_values_check(df: DataFrame, col: str, values: list) -> DataFrame:
    bad = F.when(~F.col(col).isin(values) | F.col(col).isNull(), 1).otherwise(0)
    return df.agg(
        F.coalesce(F.sum(bad), F.lit(0)).cast("long").alias("failures")
    ).select(F.lit(f"accepted_values:{col}").alias("name"), "failures")


def relationships_check(df: DataFrame, col: str, to: DataFrame, to_col: str) -> DataFrame:
    """Foreign-key orphans: values of ``col`` absent from ``to.to_col``.
    An anti-join, broadcast when the parent side is a dim."""
    orphans = df.filter(F.col(col).isNotNull()).join(
        to.select(F.col(to_col).alias(col)).distinct(), col, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("failures")).select(
        F.lit(f"relationships:{col}").alias("name"), "failures"
    )


def run_checks(checks: list[DataFrame]) -> list[CheckResult]:
    """Union all single-row check frames and collect ONCE."""
    if not checks:
        return []
    combined = checks[0]
    for c in checks[1:]:
        combined = combined.unionByName(c)
    return [CheckResult(r["name"], r["failures"]) for r in combined.collect()]
