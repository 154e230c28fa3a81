"""MATCH_RECOGNIZE-style delta-pattern detection kernel.

Spark has no MATCH_RECOGNIZE (SQL:2016 row-pattern matching; Flink CEP
and Trino implement it); the workhorse subset every funnel/anomaly
pipeline actually uses — "a fixed shape of consecutive value movements
within an ordered per-key series" — is expressible as ONE keyed window
pass: encode each event's delta direction, then match the pattern with
O(len(pattern)) lag/lead reads around an anchor row. Round 9 hand-rolled
the strict V-shape this way (`ts_pattern_v_shape`); this kernel factors
the encoding so any direction pattern is a one-liner (VERDICT r9 "Next
round #7").

Scale shape: one `PARTITION BY key ORDER BY order` window (lag/lead of
the direction column share a single sort/WindowExec), no state beyond
the len(pattern)+1-row frame — a per-key linear scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: direction alphabet: value strictly rose / strictly fell / flat
_DIRS = {"U", "D", "F"}


def delta_directions(
    df: DataFrame, keys: list[str], order_col: str, value_col: str, out_col: str
) -> DataFrame:
    """Add ``out_col`` = direction of the step INTO each event ('U'
    strictly up, 'D' strictly down, 'F' flat; NULL for each key's first
    event) in ``order_col`` order. Strictness matches SQL comparison
    semantics: NULL values propagate to NULL directions."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    prev = F.lag(value_col, 1).over(w)
    cur = F.col(value_col)
    d = (
        F.when(cur > prev, F.lit("U"))
        .when(cur < prev, F.lit("D"))
        .when(cur == prev, F.lit("F"))
    )
    return df.withColumn(out_col, d)


def pattern_match(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    pattern: str,
    anchor: int,
) -> DataFrame:
    """Rows of ``df`` whose event is the ANCHOR of a ``pattern`` match.

    ``pattern`` is a string over {'U','D','F'}: the directions of the
    len(pattern) CONSECUTIVE deltas of a match (delta j = the step into
    event position j+1 of the len(pattern)+1-event window). ``anchor``
    is the event position (0..len(pattern)) whose row is returned — the
    trough of a V is position 2 of "DDUU"; the last event of a
    3-decline run is position 3 of "DDD".

    A delta that falls before the key's series start is NULL and the
    comparison fails, so partial matches at boundaries never fire —
    identical to the hand-rolled lag/lead encoding.
    """
    m = len(pattern)
    if not (0 <= anchor <= m):
        raise ValueError(f"anchor {anchor} outside pattern window 0..{m}")
    if not set(pattern) <= _DIRS:
        raise ValueError(f"pattern {pattern!r} not over {_DIRS}")
    dcol = "_dir_pm"
    out = delta_directions(df, keys, order_col, value_col, dcol)
    w = Window.partitionBy(*keys).orderBy(order_col)
    # window expressions must be PROJECTED before they can be filtered
    # on; all lag/lead reads share the one sort in a single WindowExec
    shifted: dict[str, Column] = {}
    for j in range(len(pattern)):
        off = j + 1 - anchor  # event position j+1 relative to the anchor
        if off < 0:
            dir_j = F.lag(dcol, -off).over(w)
        elif off > 0:
            dir_j = F.lead(dcol, off).over(w)
        else:
            dir_j = F.col(dcol)
        shifted[f"_pm_{j}"] = dir_j
    out = out.withColumns(shifted)
    cond: Column | None = None
    for j, ch in enumerate(pattern):
        c = F.col(f"_pm_{j}") == ch
        cond = c if cond is None else (cond & c)
    return out.filter(cond).drop(dcol, *shifted)
