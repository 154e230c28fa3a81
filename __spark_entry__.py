"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship 6-table join (q5-style) at sf0.001.
``queries``/``oracle_sql`` expose the full corpus from
``dbt_slabbing_spark.queries`` — one entry per implemented operator
(SURVEY.md §2 / §2.6), each paired with its DuckDB oracle where ANSI
SQL can express it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_slabbing_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = registry()["q5_local_supplier"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
