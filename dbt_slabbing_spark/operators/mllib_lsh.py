"""MLlib-backed LSH operators (SURVEY.md §2.6 north-star row):
``MinHashLSH.approxSimilarityJoin`` over hashed 3-gram shingle sets.

Relationship to operators/hashing.py: the md5-portable minhash exists
so the DuckDB oracle can verify the algorithm bit-for-bit; THIS module
is the production-scale path — JVM-side hashing, no Python in the loop,
and ``approxSimilarityJoin`` plans the band join natively. Seeded →
deterministic across runs, but the hash family is Spark-internal, so
the correctness gate checks invariants (exact-dup recall, distance
precision) instead of raw pairs.

Features are word 3-GRAMS, not unigrams: with unigram features a
common word ("the") becomes the min hash of thousands of documents,
every one of them lands in the same bucket, and the candidate join
goes quadratic — measured as a multi-minute hang at just 5000 docs on
a near-dup-heavy corpus. Shingles make bucket membership track actual
content overlap, the same reason the portable pipeline (and every
production near-dup system) shingles first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mllib_minhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.7,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, jaccard_distance) candidate near-dup pairs over
    distinct 3-gram shingle sets (docs with < 3 tokens have no shingle
    and are excluded — MinHashLSH requires ≥ 1 non-zero feature)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, Tokenizer

    from .text import normalized

    prepped = docs.select(F.col(id_col).alias("_id"), normalized(F.col(text_col)).alias("_norm")).filter(
        F.length("_norm") > 0
    )
    tokens = Tokenizer(inputCol="_norm", outputCol="_tokens").transform(prepped)
    grams = NGram(n=3, inputCol="_tokens", outputCol="_shingles").transform(tokens).filter(
        F.size("_shingles") > 0
    )
    # binary=True → set semantics (Jaccard over distinct shingles)
    tf = HashingTF(inputCol="_shingles", outputCol="_features", numFeatures=num_features, binary=True)
    feats = tf.transform(grams)
    lsh = MinHashLSH(inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, max_jaccard_distance, distCol="jaccard_distance")
    return (
        joined.filter(F.col("datasetA._id") < F.col("datasetB._id"))
        .select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            F.round(F.col("jaccard_distance"), 6).alias("jaccard_distance"),
        )
    )
