"""Cross-engine-stable double rounding.

Spark's ``round(double, n)`` goes through exact BigDecimal HALF_UP while
DuckDB multiplies into double space first — they disagree whenever
``x·10ⁿ`` rounds INTO an exact ``.5`` (e.g. avg = 28.846249999999998:
DuckDB → 28.8463, Spark → 28.8462). Both engines agree on
``round(x·10ⁿ)/10ⁿ`` computed explicitly in double space, so every
corpus query rounds doubles this way and every oracle spells the same
formula (:func:`sql_round`).

Both helpers end with ``+ 0.0``: a tiny negative rounds to NEGATIVE
zero on DuckDB (IEEE double round keeps the sign) but POSITIVE zero on
Spark (BigDecimal HALF_UP has no signed zero), and -0.0 vs 0.0 breaks
the driver's value hash. ``x + 0.0`` is the IEEE idiom that maps -0.0
to +0.0 and changes nothing else (found at sf0.1: one fn_array_suite
row rounded to -0.0 on the oracle only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, n: int) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    p = float(10**n)
    return F.round(col * p) / p + 0.0


def sql_round(expr: str, n: int) -> str:
    p = float(10**n)
    return f"round(({expr}) * {p}) / {p} + 0.0"
