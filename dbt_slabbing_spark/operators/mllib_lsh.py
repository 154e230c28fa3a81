"""MLlib-backed LSH operators (SURVEY.md §2.6 north-star row):
``MinHashLSH.approxSimilarityJoin`` over hashed token sets.

Relationship to operators/hashing.py: the md5-portable minhash exists
so the DuckDB oracle can verify the algorithm bit-for-bit; THIS module
is the production-scale path — JVM-side hashing, no Python in the loop,
and ``approxSimilarityJoin`` plans the band join natively. Seeded →
deterministic across runs, but the hash family is Spark-internal, so
the correctness gate records it rows-only.
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
    """(id_a, id_b, jaccard_distance) candidate near-dup pairs."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    from .text import normalized

    prepped = docs.select(F.col(id_col).alias("_id"), normalized(F.col(text_col)).alias("_norm")).filter(
        F.length("_norm") > 0
    )
    tokens = Tokenizer(inputCol="_norm", outputCol="_tokens").transform(prepped).filter(
        F.size("_tokens") > 0  # MinHashLSH requires ≥1 non-zero feature
    )
    # binary=True → set semantics (Jaccard over distinct tokens)
    tf = HashingTF(inputCol="_tokens", outputCol="_features", numFeatures=num_features, binary=True)
    feats = tf.transform(tokens)
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
