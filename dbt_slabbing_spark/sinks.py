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


# --- versioned snapshots (Delta-style time travel over plain parquet) ----

def _version_dirs(spark, path: str) -> list[int]:
    """Committed snapshot versions under ``path`` (ascending)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    if not fs.exists(p):
        return []
    versions = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            # a snapshot counts only once its _SUCCESS marker exists —
            # half-written directories are invisible to readers
            if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
                versions.append(int(name[2:]))
    return sorted(versions)


def write_snapshot(df: DataFrame, path: str, target_files: int | None = None) -> int:
    """Append an immutable snapshot version of ``df`` under
    ``path/v=N`` and return N (0-based, monotonically increasing).

    Delta-style time travel over plain parquet: every write is a new
    directory, readers pin a version, nothing is ever mutated — so a
    reader halfway through v=3 is untouched by a concurrent v=4 commit.
    The ``_SUCCESS`` marker (written last by the Hadoop committer) is
    the commit point; crashed half-writes are never listed.

    Scope (SCALE.md §Maintenance "Table versioning"): this is the
    FULL-TABLE-version mechanism — every publish is a complete copy,
    right for derived tables (marts, model outputs) recomputed whole.
    For large mutable fact tables taking targeted DELETE/MERGE/appends,
    use the FILE-LEVEL copy-on-write manifest
    (``operators/layout.py::read_table(version=...)``) instead: same
    reader contract, O(affected files) per mutation. The two do not
    nest.
    """
    spark = df.sparkSession
    existing = _version_dirs(spark, path)
    version = (existing[-1] + 1) if existing else 0
    if target_files:
        df = df.repartition(target_files)
    df.write.mode("errorifexists").parquet(f"{path}/v={version}")
    return version


def read_snapshot(spark, path: str, version: int | None = None) -> DataFrame:
    """Read snapshot ``version`` (default: latest committed)."""
    versions = _version_dirs(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    return spark.read.parquet(f"{path}/v={version}")


def snapshot_history(spark, path: str) -> list[int]:
    """All committed versions, oldest first (the audit surface)."""
    return _version_dirs(spark, path)


def prune_snapshots(spark, path: str, keep_last: int) -> list[int]:
    """Delete all but the newest ``keep_last`` committed snapshot
    versions; returns the versions removed (ascending).

    The retention half of the time-travel story: versions accumulate
    one directory per write, and at daily-snapshot cadence a year is
    365 copies of the table — retention is a disk-budget necessity,
    not housekeeping. Deletion order is oldest-first and the newest
    ``keep_last`` are never touched, so a concurrent reader pinned to
    a RETAINED version is safe; a reader pinned to a pruned version
    fails loudly on its next file access (the same contract as
    VACUUM on transactional table formats). Half-written directories
    (no _SUCCESS) are not counted as versions but ARE swept when older
    than the retention horizon's oldest survivor.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (never delete every version)")
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    committed = _version_dirs(spark, path)
    doomed = committed[:-keep_last] if len(committed) > keep_last else []
    horizon = committed[-keep_last] if len(committed) > keep_last else (committed[0] if committed else 0)
    for v in doomed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/v={v}"), True)
    # sweep crashed half-writes older than every survivor
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("v="):
                v = int(name[2:])
                has_success = fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS"))
                if not has_success and v < horizon:
                    fs.delete(st.getPath(), True)
    return doomed
