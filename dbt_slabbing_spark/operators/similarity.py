"""Vector similarity: dot/cosine expressions, brute-force top-k, and a
hyperplane-LSH bucketed ANN path.

All vector math is `zip_with` + `aggregate` over `array<float>` columns —
JVM expressions, no Python crossing, accumulation in double in list
order (bit-identical to the DuckDB oracle's list_dot_product order).

Scale: brute-force top-k is O(Q × N); it is the correctness baseline
and is fine when Q (the query set) is small enough to broadcast.
The LSH path buckets by sign patterns against a fixed set of hyperplanes
so candidate generation is an equi-join on the bucket key — at 100 TB
this is the difference between a cross join and a shuffle on ~2^P keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..rounding import dround


#: Ceiling for the exact all-pairs scans. n²/2 comparisons at 100k rows is
#: already 5·10⁹ vector dots — beyond that the exact baseline stops being a
#: baseline and becomes an outage. The LSH-bucketed twins are the scale path.
EXACT_SCAN_MAX_ROWS = 100_000


class ExactScanTooLarge(ValueError):
    """Raised when an O(n²) exactness-baseline operator is pointed at a
    frame too large for an all-pairs scan."""


def require_exact_scan_small(
    df: DataFrame, max_rows: int = EXACT_SCAN_MAX_ROWS, what: str = "exact pair scan"
) -> DataFrame:
    """Guard an O(n²) exact-baseline operator with a row-count ceiling.

    The count is one cheap job (count-star over a pruned scan) — noise
    next to the quadratic work it gates. Mirrors the df-cap defense the
    shingle join uses (queries/dedup.py::capped_shingles): an unbounded
    all-pairs computation must never be reachable by accident at scale.
    """
    n = df.count()
    if n > max_rows:
        raise ExactScanTooLarge(
            f"{what}: {n} rows exceeds the exact-baseline ceiling of {max_rows}. "
            "This operator is the O(n²) exactness contract for small frames; "
            "use its LSH-bucketed twin (e.g. sim_neardup_pairs_lsh) at scale."
        )
    return df


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(query_id, vec_id, cos) — exact top-k by cosine per query vector.

    ``queries`` is broadcast (small by contract); ranking orders by
    rounded cosine with the id as tiebreaker so the selected set is
    deterministic across engines.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    joined = (
        vectors.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", dround(cosine(F.col("_qvec"), F.col(vec_col)), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", id_col, "cos")
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: bit i = sign(dot(vec, planes[i])) > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(vec, plane_col) > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.

    Equi-join on the bucket key replaces the cross join; recall depends
    on #planes (coarser buckets → higher recall, more candidates).
    """
    bucketed = vectors.withColumn("_bucket", hyperplane_bucket(F.col(vec_col), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("_qbucket"),
    )
    joined = (
        bucketed.join(F.broadcast(q), F.col("_bucket") == F.col("_qbucket"))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", id_col, "cos")
    )
