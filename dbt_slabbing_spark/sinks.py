"""Sinks: parquet/CSV/JSON writers and table-format (Delta/Iceberg)
gating.

SURVEY.md §2.6 "Parquet/CSV/JSON scans + sinks". The writers are thin
on purpose — ``df.write`` already is the engine — but they pin the two
decisions that matter at 100 TB:

- **partition layout**: ``partition_by`` columns become directory
  partitions (the read side then gets partition PRUNING for free; the
  DICOM archive's patient/study layout is the reference's version of
  this, README.md "EA1141 data structuration");
- **file sizing**: writers repartition to ``target_files`` before the
  write so output isn't 10 000 tiny files (the classic small-files
  problem) or one giant unsplittable one.

Delta/Iceberg need jars absent from this environment → ``merge_into``
degrades to the documented anti-join+union emulation
(operators/merge.py) unless a table format is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # jars not shipped in this environment
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except Exception:
    DeltaTable = None
    HAS_DELTA = False


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    target_files: int | None = None,
) -> None:
    if target_files:
        df = df.repartition(target_files, *(partition_by or []))
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def merge_into(spark, target_path: str, updates: DataFrame, key: str) -> None:
    """MERGE INTO target USING updates — Delta when available, else
    NotImplementedError pointing at the emulation (which returns a new
    DataFrame instead of mutating storage; immutable-parquet semantics).
    """
    if not HAS_DELTA:
        raise NotImplementedError(
            "no table format on classpath; use operators.merge.upsert + write_parquet "
            "(rewrite-on-merge) instead"
        )
    tbl = DeltaTable.forPath(spark, target_path)
    (
        tbl.alias("t")
        .merge(updates.alias("u"), f"t.{key} = u.{key}")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
