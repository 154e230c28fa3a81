"""Product quantization (PQ) with asymmetric-distance computation
(ADC) — Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — as pure DataFrame ops.

The quantizer splits each d-dim vector into ``m`` subvectors and maps
each to the nearest of ``ks`` codebook centroids, so a vector is stored
as m small ints. ADC scores a query against the CODES: per query, a
(m × ks) distance table is computed once, and each candidate's
approximate distance is the sum of m table lookups.

This implementation uses a FIXED codebook (the subvectors of the first
``ks`` vectors by id) rather than k-means: quantization quality is
lower, but the operator becomes deterministic AND SQL-reproducible, so
the correctness gate can hash-check codes and neighbors exactly
(`queries/similarity.py::sim_pq_adc_topk`); swap in per-subspace
k-means centroids for production quality — the dataflow is identical.

100 TB story: the codebook (m·ks subvectors) and the per-query
distance tables (q·m·ks doubles) broadcast; corpus-sized frames flow
only through map-side joins plus one (vec_id, subspace)-keyed argmin at
encode time. Queries touch the m-byte code table, never the raw
vectors — encode once, search compressed.

Reference parity: none (SURVEY.md §2.6 north-star extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import dot


def subvectors(emb: DataFrame, m: int, sub_dim: int) -> DataFrame:
    """(vec_id, s, sv): each vector split into ``m`` ``sub_dim``-wide
    double subvectors."""
    return emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[
                F.slice(F.col("embedding"), s * sub_dim + 1, sub_dim).cast("array<double>")
                for s in range(m)
            ])
        ).alias("s", "sv"),
    )


def _l2sq(a, b):  # noqa: ANN001 — Column in, Column out
    return dot(a, a) + dot(b, b) - 2 * dot(a, b)


def fixed_codebook(sub: DataFrame, ks: int) -> DataFrame:
    """(code, s, cv): the subvectors of vec_id < ks as the codebook."""
    return sub.filter(F.col("vec_id") < ks).select(
        F.col("vec_id").alias("code"), "s", F.col("sv").alias("cv")
    )


def pq_codes(sub: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, s, code): nearest codebook entry per subvector.

    argmin via min(struct(d2, code)) — lexicographic, so exact-tie
    codes resolve to the smallest code deterministically.
    """
    return (
        sub.join(F.broadcast(codebook), "s")
        .select(
            "vec_id",
            "s",
            F.struct(
                _l2sq(F.col("sv"), F.col("cv")).alias("_d2"), F.col("code")
            ).alias("_sc"),
        )
        .groupBy("vec_id", "s")
        .agg(F.min("_sc").getField("code").alias("code"))
    )


def adc_distances(
    codes: DataFrame, queries_sub: DataFrame, codebook: DataFrame, m: int
) -> DataFrame:
    """(query_id, vec_id, p0..p{m-1}): per-subspace ADC distance parts.

    The subspace parts are pivoted to FIXED columns so the final m-way
    float sum has one addition order (cross-engine determinism).
    """
    dtable = (
        queries_sub.withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(codebook), "s")
        .select("query_id", "s", "code", _l2sq(F.col("sv"), F.col("cv")).alias("part"))
    )
    return (
        codes.join(F.broadcast(dtable), ["s", "code"])
        .groupBy("query_id", "vec_id")
        .agg(*[
            F.sum(F.when(F.col("s") == s, F.col("part"))).alias(f"p{s}")
            for s in range(m)
        ])
    )


def pq_adc_topk(
    emb: DataFrame,
    n_queries: int,
    k: int = 3,
    m: int = 4,
    sub_dim: int = 16,
    ks: int = 16,
    round_fn=None,
) -> DataFrame:
    """Full PQ/ADC top-k: (query_id, vec_id, approx_d2)."""
    sub = subvectors(emb, m, sub_dim)
    cb = fixed_codebook(sub, ks)
    codes = pq_codes(sub, cb)
    qsub = sub.filter(F.col("vec_id") < n_queries)
    adc = adc_distances(codes, qsub, cb, m)
    total = sum((F.col(f"p{s}") for s in range(1, m)), F.col("p0"))
    if round_fn is not None:
        total = round_fn(total)
    scored = adc.filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id", total.alias("approx_d2")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d2"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "vec_id", "approx_d2")
    )


def ivfpq_residual_topk(
    emb: DataFrame,
    n_queries: int,
    k: int = 3,
    n_cells: int = 8,
    m: int = 4,
    sub_dim: int = 16,
    ks: int = 16,
    round_fn=None,
) -> DataFrame:
    """True IVF-PQ (Jégou et al. §V): coarse-quantize to a cell,
    PQ-encode the RESIDUAL v − centroid(cell), search only the query's
    cell (nprobe=1) with residual-domain ADC.

    Residual encoding is what makes IVF-PQ beat flat PQ at equal bits:
    residuals concentrate near 0, so the same ks codes cover them with
    far less quantization error than raw vectors. Determinism contract
    as elsewhere in this module: centroids are the first ``n_cells``
    vectors, the codebook is the residual subvectors of the first
    ``ks`` vectors, every argmin breaks ties toward the smaller id —
    so codes, cells and neighbors are all SQL-reproducible.

    100 TB story: centroids (n_cells×d) and codebook (m·ks·sub_dim)
    broadcast; the corpus flows through one cell-argmin, one residual
    projection and one (vec_id, s)-keyed code argmin — then queries
    touch only their cell's m-byte codes plus a broadcast per-query
    distance table. Raise nprobe by unioning more cells; the dataflow
    is unchanged.
    """
    from .similarity import dot

    def sub_of(col_name: str) -> list:  # m fixed slices of a vector col
        return [
            F.slice(F.col(col_name), s * sub_dim + 1, sub_dim).cast("array<double>")
            for s in range(m)
        ]

    cents = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("centv")
    )
    # cell assignment + residual in one pass (centroids broadcast)
    d2c = dot(F.col("embedding"), F.col("embedding")) + dot(F.col("centv"), F.col("centv")) - 2 * dot(
        F.col("embedding"), F.col("centv")
    )
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cell", "centv", F.struct(d2c.alias("_d2"), F.col("cell").alias("_c")).alias("_sc"))
        .withColumn("_best", F.min("_sc").over(Window.partitionBy("vec_id")))
        .filter(F.col("_sc") == F.col("_best"))
        .select(
            "vec_id",
            "cell",
            F.zip_with(F.col("embedding"), F.col("centv"), lambda a, b: a.cast("double") - b.cast("double")).alias(
                "resid"
            ),
        )
    )
    rsub = assigned.select(
        "vec_id", "cell", F.posexplode(F.array(*[
            F.slice(F.col("resid"), s * sub_dim + 1, sub_dim) for s in range(m)
        ])).alias("s", "sv")
    )
    cb = rsub.filter(F.col("vec_id") < ks).select(F.col("vec_id").alias("code"), "s", F.col("sv").alias("cv"))
    codes = (
        rsub.join(F.broadcast(cb), "s")
        .select(
            "vec_id",
            "cell",
            "s",
            F.struct(_l2sq(F.col("sv"), F.col("cv")).alias("_d2"), F.col("code")).alias("_sc"),
        )
        .groupBy("vec_id", "cell", "s")
        .agg(F.min("_sc").getField("code").alias("code"))
    )
    qsub = rsub.filter(F.col("vec_id") < n_queries).withColumnRenamed("vec_id", "query_id")
    dtable = (
        qsub.join(F.broadcast(cb), "s")
        .select("query_id", "s", "code", _l2sq(F.col("sv"), F.col("cv")).alias("part"))
    )
    qcells = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("cell").alias("_qcell")
    )
    cand_codes = (
        codes.join(F.broadcast(qcells), codes["cell"] == F.col("_qcell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "s", "code")
    )
    adc = (
        cand_codes.join(F.broadcast(dtable), ["query_id", "s", "code"])
        .groupBy("query_id", "vec_id")
        .agg(*[F.sum(F.when(F.col("s") == s, F.col("part"))).alias(f"p{s}") for s in range(m)])
    )
    total = sum((F.col(f"p{s}") for s in range(1, m)), F.col("p0"))
    if round_fn is not None:
        total = round_fn(total)
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d2"), F.asc("vec_id"))
    return (
        adc.select("query_id", "vec_id", total.alias("approx_d2"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "vec_id", "approx_d2")
    )
