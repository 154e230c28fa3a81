"""Ingestion robustness: schema evolution across appended batches and
malformed-record handling — the two failure modes a 100 TB lake hits
weekly (a producer adds a column; a producer ships garbage). The
reference's CSV reader (`/root/reference/src/generate_mapping.py:46`,
split-on-comma) has neither concern; the engine inherits both from
Spark's readers and this file pins the exact semantics we rely on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Appended batches may add columns: mergeSchema unions the file
    schemas, old files read NULL for new columns — no rewrite of
    historical data."""
    p = str(tmp_path / "evolving")
    spark.range(5).selectExpr("id", "id * 2 AS a").write.parquet(p)
    spark.range(5, 10).selectExpr("id", "id * 3 AS b").write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r["id"]: (r["a"], r["b"]) for r in merged.collect()}
    assert rows[0] == (0, None) and rows[9] == (None, 27)

    # without mergeSchema, Spark picks one footer's schema — historical
    # queries keep working but new columns MAY be invisible; a pipeline
    # that needs the union must ask for it explicitly
    plain = spark.read.parquet(p)
    assert set(plain.columns) <= {"id", "a", "b"}


def test_parquet_appended_type_widening_fails_loud(spark, tmp_path):
    """A producer changing a column's TYPE (int -> string) is not
    evolution, it's corruption: the merged read must fail, not
    silently coerce."""
    p = str(tmp_path / "conflict")
    spark.range(3).selectExpr("id", "CAST(id AS INT) AS v").write.parquet(p)
    spark.range(3, 6).selectExpr("id", "CAST(id AS STRING) AS v").write.mode(
        "append"
    ).parquet(p)
    with pytest.raises(Exception, match="[Mm]erge|[Ss]chema|[Tt]ype"):
        spark.read.option("mergeSchema", "true").parquet(p).collect()


@pytest.fixture()
def json_with_garbage(spark, tmp_path):
    p = tmp_path / "raw.json"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "this is not json at all\n"
        '{"id": 2, "v": "also ok"}\n'
        '{"id": 3, "v": BROKEN}\n'
    )
    return str(p)


def test_json_permissive_captures_corrupt_records(spark, json_with_garbage):
    """PERMISSIVE (default): bad lines become rows with the raw text in
    _corrupt_record and NULL data columns — quarantine-able, countable,
    never job-fatal."""
    df = spark.read.schema("id long, v string, _corrupt_record string").json(
        json_with_garbage
    )
    rows = df.collect()
    assert len(rows) == 4
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    good = {r["id"] for r in rows if r["_corrupt_record"] is None}
    assert len(bad) == 2 and good == {1, 2}
    # Spark disallows queries whose referenced columns are ONLY the
    # internal corrupt-record column on the raw scan (SPARK-21610);
    # the documented quarantine pattern caches the parsed frame first
    with pytest.raises(AnalysisException):
        df.filter(F.col("_corrupt_record").isNotNull()).count()
    cached = df.cache()
    try:
        assert cached.filter(F.col("_corrupt_record").isNotNull()).count() == 2
    finally:
        cached.unpersist()


def test_json_dropmalformed_drops_silently(spark, json_with_garbage):
    df = (
        spark.read.schema("id long, v string")
        .option("mode", "DROPMALFORMED")
        .json(json_with_garbage)
    )
    assert {r["id"] for r in df.collect()} == {1, 2}


def test_json_failfast_raises(spark, json_with_garbage):
    df = (
        spark.read.schema("id long, v string")
        .option("mode", "FAILFAST")
        .json(json_with_garbage)
    )
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        df.collect()


def test_csv_permissive_and_failfast(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text("id,v\n1,10\n2,notanumber\n3,30\n")
    permissive = spark.read.csv(
        str(p), header=True, schema="id long, v long, _corrupt_record string"
    )
    rows = {r["id"]: (r["v"], r["_corrupt_record"]) for r in permissive.collect()}
    assert rows[1] == (10, None) and rows[3] == (30, None)
    assert rows[2][0] is None and rows[2][1] is not None  # quarantined

    failfast = (
        spark.read.schema("id long, v long")
        .option("mode", "FAILFAST")
        .option("header", "true")
        .csv(str(p))
    )
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        failfast.collect()


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark, tmp_path):
    """partitionOverwriteMode=dynamic: an INSERT OVERWRITE replaces only
    the partitions present in the incoming data — the backfill pattern
    that makes partition-level reprocessing safe. Static mode (the
    default) would wipe every partition first."""
    p = str(tmp_path / "parted")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "v long, part string"
    ).write.partitionBy("part").parquet(p)

    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        spark.createDataFrame([(20, "b")], "v long, part string").write.mode(
            "overwrite"
        ).partitionBy("part").parquet(p)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    rows = {r["part"]: r["v"] for r in spark.read.parquet(p).collect()}
    assert rows == {"a": 1, "b": 20, "c": 3}  # a and c untouched, b replaced
