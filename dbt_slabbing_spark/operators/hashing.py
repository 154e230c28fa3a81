"""Portable hashing primitives: minhash signatures, simhash, hex→int.

Design constraint: every hash here must be computable bit-identically by
the DuckDB oracle in plain SQL. That rules out xxhash64/crc32 (engine
specific) and leaves md5, which both engines expose as lowercase hex.

- minhash_i(doc)  = min over shingles of h_i(shingle), where the k
  hash functions derive from ONE md5 per shingle: a = bits 0-31,
  b = bits 32-63 forced odd, h_i = (a + i·b) mod 2^32 — the standard
  "one strong hash + k linear lanes" family. One md5 per shingle
  instead of k: at 100 TB the hashing pass over every shingle is the
  dominant cost and this cuts it k-fold.
- simhash(doc)    = 32-bit sign-aggregate of per-token md5 bits.
- hex→int         = Spark ``conv(hex, 16, 10)`` ⟷ DuckDB
  ``('0x' || hex)::BIGINT`` (≤15 hex chars so the BIGINT can't overflow;
  we use 8 → 32 bits).

Scale notes (100 TB): the minhash pipeline is explode(shingles) →
per-(doc, seed) min — Spark computes partial mins map-side before the
shuffle, so shuffle volume is #docs × #seeds, independent of document
length. Banding then turns candidate generation into an equi-join on
band keys, which AQE can broadcast or shuffle-hash as density dictates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..rounding import dround
from .text import word_shingles

HEX_DIGITS = "0123456789abcdef"


def hex_to_long(col: Column) -> Column:
    """Hex string (≤15 chars) → non-negative bigint."""
    return F.conv(col, 16, 10).cast("long")


def md5_long32(col: Column) -> Column:
    """First 32 bits of md5 as a bigint in [0, 2^32)."""
    return hex_to_long(F.substring(F.md5(col), 1, 8))


def seeded_md5(seed: Column | int, col: Column) -> Column:
    seed_col = F.lit(seed) if isinstance(seed, int) else seed
    return F.md5(F.concat(seed_col.cast("string"), F.lit("|"), col))


MASK32 = (1 << 32) - 1


def minhash_lanes(shingle: Column, num_hashes: int) -> list[Column]:
    """The k lane hashes of one shingle from a single md5: lane i is
    ``(a + i·b) & 0xFFFFFFFF`` with a = md5 bits 0-31, b = bits 32-63
    forced odd (so every lane is a bijection mod 2^32)."""
    m = F.md5(shingle)
    a = hex_to_long(F.substring(m, 1, 8))
    b = hex_to_long(F.substring(m, 9, 8)).bitwiseOR(F.lit(1))
    return [(a + F.lit(i) * b).bitwiseAND(F.lit(MASK32)) for i in range(num_hashes)]


def minhash_ab_pairs(text_col: Column, shingle_words: int = 3) -> Column:
    """``array<struct<a,b>>`` — the per-shingle (a, b) lane seeds of
    :func:`minhash_lanes`, as a pure column expression (one md5 per
    shingle). Project this ONCE into its own column before deriving
    lane minima so codegen computes the md5 pass a single time per row.
    """
    return F.transform(
        word_shingles(text_col, shingle_words),
        lambda s: F.struct(
            hex_to_long(F.substring(F.md5(s), 1, 8)).alias("a"),
            hex_to_long(F.substring(F.md5(s), 9, 8)).bitwiseOR(F.lit(1)).alias("b"),
        ),
    )


def minhash_sig_from_ab(ab_col: Column, num_hashes: int = 8) -> Column:
    """``array<bigint>`` signature from :func:`minhash_ab_pairs` output —
    bit-identical to :func:`minhash_signatures` but computed per-row
    with NO aggregation, which is what a STREAMING pipeline needs: a
    groupBy on a stream is a stateful operator (cannot precede another
    stateful op, holds state forever), while this stays a stateless
    codegen'd projection. NULL when the document has no shingle (the
    agg form drops such docs; filter on isNotNull to match).

    100 TB note: the batch agg form still wins for batch jobs (partial
    mins combine map-side before the shuffle); this form wins on
    streams (zero shuffle, zero state).
    """
    lanes = [
        F.array_min(
            F.transform(
                ab_col,
                lambda x: (x["a"] + F.lit(i) * x["b"]).bitwiseAND(F.lit(MASK32)),
            )
        )
        for i in range(num_hashes)
    ]
    return F.when(F.size(ab_col) > 0, F.array(*lanes))


def minhash_signatures(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_words: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>) — per-doc minhash signature.

    ``sig[i]`` is the minimum lane-i hash (see :func:`minhash_lanes`)
    over the doc's word shingles: ONE md5 per shingle, k cheap integer
    lanes. Docs with no shingle (fewer than ``shingle_words`` tokens)
    are dropped — they have no signature.
    """
    # No array_distinct: min over a multiset equals min over its set, so
    # duplicate shingles cannot change any lane minimum — skipping the
    # per-doc dedup pass saves a full array scan per document (measured
    # ~25% of signature-build time; duplicates are rare in real text
    # anyway). The SQL oracle's DISTINCT shingle CTE stays correct for
    # the same reason.
    shingled = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), shingle_words)).alias("_shingle"),
    )
    # Materialize the md5-derived (a, b) pair ONCE per shingle in the
    # projection below the aggregate: aggregate-function codegen does not
    # reliably common-subexpression-eliminate across the 8 lanes, and an
    # un-CSE'd form recomputes the md5 16× per shingle — the dominant
    # cost of the whole pipeline at any scale.
    m = F.md5(F.col("_shingle"))
    ab = shingled.select(
        "_id",
        hex_to_long(F.substring(m, 1, 8)).alias("_a"),
        hex_to_long(F.substring(m, 9, 8)).bitwiseOR(F.lit(1)).alias("_b"),
    )
    # ONE aggregation computes all num_hashes mins as columns: no ×seeds
    # row blowup, partial mins combine map-side, shuffle = docs × 1 row.
    lanes = [
        (F.col("_a") + F.lit(i) * F.col("_b")).bitwiseAND(F.lit(MASK32))
        for i in range(num_hashes)
    ]
    per_doc = ab.groupBy("_id").agg(
        *[F.min(lane).alias(f"_h{i}") for i, lane in enumerate(lanes)]
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_band_pairs(
    signatures: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
) -> DataFrame:
    """LSH banding: (id_a, id_b) candidate pairs sharing ≥1 band.

    Band key = '_'-joined ``rows_per_band`` consecutive signature
    components (separator: integer components are variable-width, and
    ``12|345`` must not collide with ``123|45``). Self-join on the band
    key; ``id_a < id_b`` dedups the symmetric pair and banding dups are
    removed with ``distinct``.
    """
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("_band")
    banded = signatures.select(F.col(id_col).alias("_bid"), F.col("sig"), band_idx).select(
        "_bid",
        "_band",
        F.concat_ws(
            "_",
            *[
                F.element_at(F.col("sig"), F.col("_band") * rows_per_band + i + 1).cast("string")
                for i in range(rows_per_band)
            ],
        ).alias("_band_key"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._band_key") == F.col("r._band_key"))
            & (F.col("l._bid") < F.col("r._bid")),
        )
        .select(F.col("l._bid").alias("id_a"), F.col("r._bid").alias("id_b"))
        .distinct()
    )


def minhash_band_similarity_pairs(
    signatures: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
) -> DataFrame:
    """Fused LSH banding + signature similarity: ONE self-join.

    Carries both full signature arrays through the band-key self-join
    (dedup via ``distinct`` over pair + sigs — sigs are functionally
    dependent on the ids, so this equals a pair-only distinct), then
    computes ``est_jaccard`` directly from the carried arrays. Compared
    to :func:`minhash_band_pairs` + :func:`signature_similarity` this
    removes the two post-hoc signature joins — and with them the need to
    ``persist`` the signature frame: the self-join's two sides are
    identical subplans shuffling on the same band key, so Spark plans
    one Exchange and a ReusedExchange instead of two signature builds.
    Shuffle rows stay docs × bands; each row carries the extra ~8·8-byte
    sig payload, a constant factor far below the two joins it replaces.
    """
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("_band")
    banded = signatures.select(F.col(id_col).alias("_bid"), F.col("sig"), band_idx).select(
        "_bid",
        "sig",
        "_band",
        F.concat_ws(
            "_",
            *[
                F.element_at(F.col("sig"), F.col("_band") * rows_per_band + i + 1).cast("string")
                for i in range(rows_per_band)
            ],
        ).alias("_band_key"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    # est_jaccard is computed IN the join projection, BEFORE the distinct
    # that collapses multi-band duplicates: (a) the distinct's exchange
    # then carries 3 narrow columns instead of two 8-element sig arrays
    # (est is functionally dependent on the pair, so the distinct result
    # is identical), and (b) a caller's `est_jaccard >= t` filter lands
    # on a grouping column of the distinct, so Catalyst pushes it BELOW
    # the exchange — candidate pairs failing the threshold never shuffle.
    matched = F.size(
        F.filter(F.zip_with(F.col("l.sig"), F.col("r.sig"), lambda a, b: a == b), lambda x: x)
    )
    return (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._band_key") == F.col("r._band_key"))
            & (F.col("l._bid") < F.col("r._bid")),
        )
        .select(
            F.col("l._bid").alias("id_a"),
            F.col("r._bid").alias("id_b"),
            dround(matched.cast("double") / F.size(F.col("l.sig")), 4).alias("est_jaccard"),
        )
        .distinct()
    )


def signature_similarity(pairs: DataFrame, signatures: DataFrame, id_col: str) -> DataFrame:
    """Attach est_jaccard = fraction of equal signature components."""
    sig_a = signatures.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sig_a"))
    sig_b = signatures.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sig_b"))
    matched = F.size(F.filter(F.zip_with(F.col("_sig_a"), F.col("_sig_b"), lambda a, b: a == b), lambda x: x))
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("est_jaccard", dround(matched.cast("double") / F.size(F.col("_sig_a")), 4))
        .drop("_sig_a", "_sig_b")
    )


def simhash_df(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 32-bit simhash per document, as bigint.

    bit b of the result is set iff #{t : md5_32(t) has bit b} > n/2 —
    the sign of a per-bit ±1 vote over all tokens (duplicates counted).

    Shape: explode tokens → ×32 bit positions → two-level groupBy.
    Both aggregations combine map-side, so shuffle volume is
    docs × 32 rows regardless of document length — this is the form
    that survives 100 TB, unlike a per-row expression that re-walks the
    token array 32 times.
    """
    from .text import words

    spark = docs.sparkSession
    tok = docs.select(F.col(id_col).alias("_id"), F.explode(words(F.col(text_col))).alias("_t"))
    hashed = tok.select("_id", md5_long32(F.col("_t")).alias("h"))
    bit_positions = spark.range(32).select(F.col("id").cast("int").alias("b"))
    per_bit = (
        hashed.crossJoin(F.broadcast(bit_positions))
        .groupBy("_id", "b")
        .agg(
            F.sum(F.expr("int(shiftright(h, b) & 1)")).alias("ones"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn(
            "bitval",
            F.when(F.col("ones") * 2 > F.col("n"), F.expr("shiftleft(cast(1 as bigint), b)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
    )
    return (
        per_bit.groupBy("_id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
        .withColumnRenamed("_id", id_col)
    )


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# --- SQL fragments for the DuckDB oracle (kept next to the Spark code so
# the two definitions can only drift in one file) -------------------------

SQL_NORMALIZE = "regexp_replace(trim(lower({col})), '\\s+', ' ', 'g')"
SQL_WORDS = f"string_split({SQL_NORMALIZE}, ' ')"


def sql_word_shingles(col: str, k: int) -> str:
    """DuckDB expression: array of k-word shingles of ``col``."""
    w = SQL_WORDS.format(col=col)
    parts = " || ' ' || ".join(f"_w[_i + {j}]" for j in range(k))
    return (
        f"(SELECT coalesce(list({parts} ORDER BY _i), []) FROM (SELECT {w} AS _w) _t, "
        f"range(1, len(_w) - {k - 2}) _r(_i))"
    )
