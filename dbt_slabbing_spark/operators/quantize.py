"""Scalar quantization (int8) for embedding columns.

The cheapest compression tier of the ANN serving stack (below PQ,
``operators/pq.py``): each vector is scaled by its own max-abs to the
int8 range and stored as 1 byte/dim — a 4× shrink from float32 that
keeps cosine ranking nearly intact (the per-vector scale cancels in the
cosine's normalization, so only the rounding error remains). This is
the format FAISS calls SQ8 and vector DBs ship as "int8 quantized".

Cross-engine determinism: codes are ``floor(x·127/s + 0.5)`` computed
in double — multiply, divide, add, floor are each exactly-rounded IEEE
ops evaluated in the same order on Spark and DuckDB, so the codes (and
every integer dot product over them) hash identically. No banker's-
rounding / HALF_UP divergence is reachable.

Scale: quantization is a map-only pass (one ``transform`` per row);
search touches the 64-byte codes, never the float vectors. Top-k uses
the same broadcast-queries × corpus shape as ``brute_force_topk`` —
swap in the IVF/LSH candidate generators for sublinear scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..rounding import dround


def maxabs_scale(vec: Column) -> Column:
    """Per-vector max-abs (double). 0.0 for the all-zero vector."""
    return F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))


def sq8_codes(vec: Column) -> Column:
    """int8-range codes as array<double> of integral values.

    Kept as doubles (not bytes) so dot products run in the same exact
    integer-in-double arithmetic the DuckDB oracle uses; a storage
    layer would cast to ``array<tinyint>`` / binary on write.
    """
    s = maxabs_scale(vec)
    return F.when(s == 0.0, F.transform(vec, lambda x: F.lit(0.0))).otherwise(
        F.transform(vec, lambda x: F.floor(x.cast("double") * F.lit(127.0) / s + F.lit(0.5)).cast("double"))
    )


def sq8_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """(query_id, vec_id, dot_q, qcos): top-k by cosine over int8 codes.

    ``dot_q`` is the raw integer code dot product (exact, hash-checkable);
    ``qcos`` the code-space cosine rounded to 6 dp. Zero vectors are
    excluded from ranking (their code norm is 0 — no direction).
    """
    from .similarity import dot

    coded = vectors.select(F.col(id_col), sq8_codes(F.col(vec_col)).alias("_code"))
    q = queries.select(F.col(id_col).alias("query_id"), sq8_codes(F.col(vec_col)).alias("_qcode"))
    d = dot(F.col("_qcode"), F.col("_code"))
    nq = F.sqrt(dot(F.col("_qcode"), F.col("_qcode")))
    nv = F.sqrt(dot(F.col("_code"), F.col("_code")))
    scored = (
        coded.crossJoin(F.broadcast(q))
        .filter((F.col(id_col) != F.col("query_id")) & (nq > 0.0) & (nv > 0.0))
        .select(
            "query_id",
            id_col,
            d.cast("bigint").alias("dot_q"),
            dround(d / (nq * nv), 6).alias("qcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", id_col, "dot_q", "qcos")
    )
