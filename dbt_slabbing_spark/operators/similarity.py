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
