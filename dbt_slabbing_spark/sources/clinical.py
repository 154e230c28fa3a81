"""Clinical-table ingestion with a file-order ``_line_no`` column.

The reference's CSV "parser" is ``str.split(',')`` with no quoting
(``src/generate_mapping.py:6-13,46,60``), and FILE ORDER is semantically
load-bearing: the screening lookup is first-row-wins per subject
(``:106`` setdefault) and the lesion "join" is a top-to-bottom fold
(``:59-92``). So every clinical table carries ``_line_no`` (0-based
data-row order, FIXTURES.md conventions).

Two readers:

- :func:`read_csv_lines` — scalable path: ``spark.read.text`` →
  per-partition index reconstruction via ``zipWithIndex`` (one pass,
  order-stable; this is how a 100 TB line-numbered ingest would run).
- :func:`read_zip_member` — the shipped data path: the reference ships
  its CSVs inside a zip; members are read driver-side (they are ≤500-row
  dimension tables by contract) and parallelized.

Both split on ',' exactly like the reference — a real CSV reader would
handle quoting the reference can't, so we must not "fix" the dialect
and silently diverge. ``SUBJECT_DE`` is materialized positionally from
the LAST field (``split_line[-1]``, ``:61,79,103``), not by header name.
"""

from __future__ import annotations

import io
import zipfile

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

ZIP_DIR = "EA1141-Reviewed-Clinical-Data-and-Data-Dictionaries"
SCREENING_CSV = f"{ZIP_DIR}/ea1141_year0_screening_derived.csv"
TOMO_CSV = f"{ZIP_DIR}/ea1141_year0_tomolesions_outcome.csv"
MRI_CSV = f"{ZIP_DIR}/ea1141_year0_mrilesions_outcome.csv"


def _to_df(spark: SparkSession, lines: list[str], keep_cols: list[str] | None) -> DataFrame:
    header = lines[0].split(",")
    cols = keep_cols if keep_cols is not None else header
    idx = {c: header.index(c) for c in cols}
    rows = []
    for line_no, line in enumerate(lines[1:]):
        parts = line.split(",")
        d = {c: parts[i] for c, i in idx.items()}
        d["SUBJECT_DE"] = parts[-1]  # positional, like split_line[-1]
        d["_line_no"] = line_no
        rows.append(Row(**d))
    schema_cols = [c for c in cols if c != "SUBJECT_DE"] + ["SUBJECT_DE"]
    schema = ", ".join([f"`{c}` string" for c in schema_cols] + ["_line_no long"])
    return spark.createDataFrame(rows, schema=schema)


def read_zip_member(
    spark: SparkSession, zip_path: str, member: str, keep_cols: list[str] | None = None
) -> DataFrame:
    """One CSV member of the clinical zip → DataFrame with _line_no."""
    with zipfile.ZipFile(zip_path) as zf:
        with zf.open(member) as f:
            text = io.TextIOWrapper(f, encoding="utf-8", errors="replace").read()
    return _to_df(spark, text.splitlines(), keep_cols)


def read_csv_lines(spark: SparkSession, path: str, keep_cols: list[str] | None = None) -> DataFrame:
    """Plain CSV file → DataFrame with _line_no, distributed.

    ``zipWithIndex`` assigns global, order-stable indices in one extra
    job (counts per partition) — no collect, no single-threaded pass;
    correct at any scale as long as the source is splittable text.
    """
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    header = rdd.filter(lambda t: t[1] == 0).map(lambda t: t[0].split(",")).collect()[0]
    cols = keep_cols if keep_cols is not None else header
    idx = [(c, header.index(c)) for c in cols]

    def parse(t):
        line, i = t
        parts = line.split(",")
        d = {c: parts[j] for c, j in idx}
        d["SUBJECT_DE"] = parts[-1]
        d["_line_no"] = i - 1
        return Row(**d)

    schema_cols = [c for c, _ in idx if c != "SUBJECT_DE"] + ["SUBJECT_DE"]
    schema = ", ".join([f"`{c}` string" for c in schema_cols] + ["_line_no long"])
    return spark.createDataFrame(rdd.filter(lambda t: t[1] > 0).map(parse), schema=schema)


def load_clinical_tables(spark: SparkSession, zip_path: str) -> dict[str, DataFrame]:
    """The three tables the pipelines read (narrowed to operative cols)."""
    return {
        "screening": read_zip_member(
            spark, zip_path, SCREENING_CSV, ["TOMO_BIRADS_YR0", "MRI_BIRADS_YR0", "SUBJECT_DE"]
        ),
        "tomo_lesions": read_zip_member(
            spark, zip_path, TOMO_CSV, ["TOMO_LESIONBREAST_YR0", "TOMO_LESIONOUTCOME_YR0", "SUBJECT_DE"]
        ),
        "mri_lesions": read_zip_member(
            spark, zip_path, MRI_CSV, ["MRI_LESIONBREAST_YR0", "MRI_LESIONOUTCOME_YR0", "SUBJECT_DE"]
        ),
    }


def first_row_per_subject(df: DataFrame) -> DataFrame:
    """setdefault semantics (src/generate_mapping.py:106): the FIRST row
    in file order wins for each SUBJECT_DE."""
    from pyspark.sql import Window

    w = Window.partitionBy("SUBJECT_DE").orderBy("_line_no")
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
