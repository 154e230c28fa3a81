"""Query corpus: every operator the engine claims, as a named query.

Each :class:`Query` pairs a Spark DataFrame program with (where SQL can
express it) an equivalent ANSI-SQL oracle string that DuckDB runs on the
same parquet tables. The driver's correctness gate compares the two at
sf=0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased to the SAME name on both sides;
- double-typed aggregates are rounded identically on both sides (sums to
  2 dp, ratios/avgs to 4 dp) so cross-engine float summation order can't
  flip the hash;
- any LIMIT/top-k query orders by a unique tiebreaker so the selected SET
  is deterministic.

Queries that Spark can express but ANSI SQL can't (streaming, stateful
ops) set ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..rounding import dround, sql_round  # noqa: F401  (re-export for corpus modules)

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the global registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


_MODULES = (
    "relational",
    "relational_extra",
    "tpch_extra",
    "tpch_extra2",
    "coverage_extra",
    "aggregates",
    "windows",
    "setops",
    "scalar_functions",
    "joins_advanced",
    "udf_surface",
    "model_chain",
    "training_pipeline",
    "sampling",
    "dedup",
    "similarity",
    "textanalysis",
    "multimodal",
    "streaming_queries",
    "advanced_sql",
)


def registry() -> dict[str, Query]:
    """Import all corpus modules (populating the registry) and return it."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    return dict(_REGISTRY)
