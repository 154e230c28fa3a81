"""The four Python-function extension points, each with its place in
the performance hierarchy (SURVEY.md §2.6 "Python UDF / pandas UDF /
UDAF / UDTF"):

1. built-in Column expressions — always first choice (JVM, codegen);
2. ``pandas_udf`` — Arrow-vectorized, for per-row logic that genuinely
   needs Python (10-100× faster than row UDFs);
3. ``applyInPandas`` — grouped-map UDAF for per-group algorithms
   (model fits, custom aggregation) that built-ins can't express;
4. Python UDTF — one row in, many rows out, composable in SQL via
   LATERAL;
5. row-at-a-time ``udf`` — the slow path (per-row pickle serde);
   kept here ONLY as the documented anti-pattern baseline.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def utf8_byte_len():
    """Arrow-vectorized scalar pandas UDF: UTF-8 byte length.

    Factory (not a module-level decorator): ``pandas_udf`` resolves its
    return type against the ACTIVE SparkSession, so decorating at import
    time breaks any import that precedes session creation.
    """

    @pandas_udf("int")
    def _byte_len(s: pd.Series) -> pd.Series:
        return s.str.encode("utf-8").str.len().astype("int32")

    return _byte_len


def group_ols_slope(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map UDAF body: OLS slope of value over hours-since-epoch.

    The per-group algorithm (a least-squares fit) is the canonical
    "built-ins can't express this" case… except that linear regression
    actually IS expressible (regr_slope) — which is exactly why it's
    the test vehicle: the custom UDAF path is verified against the
    closed-form SQL oracle.
    """
    x = pdf["hours"].to_numpy(dtype="float64")
    y = pdf["value"].to_numpy(dtype="float64")
    if len(x) < 2 or np.ptp(x) == 0:
        slope = float("nan")
    else:
        xc = x - x.mean()
        slope = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
    return pd.DataFrame({"user_id": [pdf["user_id"].iloc[0]], "slope": [slope]})


def grouped_agg_median():
    """GROUPED_AGG pandas UDF: a true vectorized UDAF usable inside
    ``.agg()`` and over windows — the whole group's column arrives as
    one Arrow-backed Series and returns a scalar.

    Distinct from :func:`group_ols_slope` (grouped-MAP via
    ``applyInPandas``, DataFrame→DataFrame): GROUPED_AGG composes with
    other aggregates in the same ``agg()`` call. Median is the test
    vehicle because it is NOT algebraic — no partial-aggregate
    decomposition exists, so this is the one aggregate shape that
    genuinely needs the whole group in memory (Spark hash-shuffles the
    full group to one task; at 100 TB use approx_percentile instead —
    this surface is for exact/small-group paths).
    """

    @pandas_udf("double")
    def _median(s: pd.Series) -> float:
        return float(s.median())

    return _median


def grouped_agg_count():
    """GROUPED_AGG companion count: Spark disallows mixing pandas and
    JVM aggregates in one ``agg()`` (INVALID_PANDAS_UDF_PLACEMENT), so
    composing a pandas UDAF with a count means the count must be a
    pandas UDAF too."""

    @pandas_udf("long")
    def _count(s: pd.Series) -> int:
        return int(len(s))

    return _count


class ChunkText:
    """Python UDTF: fixed-size token chunks of a document (the shape a
    training-data pipeline uses to window long documents).

    eval(text) yields (chunk_idx, chunk) rows; used via LATERAL in SQL.
    """

    def eval(self, text: str, chunk_tokens: int):  # noqa: D102
        if text is None:
            return
        tokens = [t for t in text.strip().lower().split() if t]
        for i in range(0, len(tokens), chunk_tokens):
            yield i // chunk_tokens, " ".join(tokens[i : i + chunk_tokens])


def slow_row_udf_upper():
    """Row-at-a-time UDF — per-row Python serde, no vectorization.

    Exists to keep the anti-pattern measurable next to its built-in
    twin (``F.upper``); never use this shape in a hot path.
    """
    return F.udf(lambda s: s.upper() if s is not None else None, "string")


class LeadingWords:
    """Python UDTF with a dynamic output schema (Spark 4 ``analyze``):
    the first N normalized words of a document as N COLUMNS
    ``word_0..word_{N-1}`` — N is a literal argument, so the schema is
    computed at ANALYSIS time from the call site, not hardcoded.

    This is the API for UDTFs whose shape depends on their arguments
    (pivots, feature expanders, fixed-width tokenizers); Catalyst sees
    the concrete schema, so downstream pruning/codegen work as if the
    columns were declared by hand.
    """

    @staticmethod
    def analyze(text, n):  # noqa: ANN001, D102 — Spark UDTF protocol
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import StringType, StructType

        if not n.isConstantExpression:
            raise Exception("LeadingWords: n must be a constant literal")
        schema = StructType()
        for i in range(int(n.value)):
            schema = schema.add(f"word_{i}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):  # noqa: D102
        words = [] if text is None else [t for t in text.strip().lower().split() if t]
        padded = words[:n] + [None] * max(0, n - len(words))
        yield tuple(padded)
