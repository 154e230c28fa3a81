"""Per-file bloom-filter index coverage: `create_bloom_index`,
`prune_files_bloom`, `read_table(point=)` — file skipping for
high-cardinality lookup keys that min/max range stats cannot serve
(every file's range covers the probe when the layout isn't clustered
on the key), plus conservatism for unindexed files, idempotent
refresh, and composition with deletion vectors."""

from __future__ import annotations

import json
import pathlib

import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.layout import (
    _MANIFEST,
    append_files,
    create_bloom_index,
    delete_rows,
    prune_files_bloom,
    read_table,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def user_table(spark, tmp_path):
    """8 files split by user_id % 8 — user_id ranges overlap fully
    across files, so range stats keep everything; blooms are the only
    metadata that can skip."""
    target = str(tmp_path / "events")
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    for i in range(8):
        append_files(
            spark, target, ev.filter(F.col("user_id") % 8 == i).coalesce(1)
        )
    rows = {r["event_id"]: r for r in ev.collect()}
    return target, rows


def _live(target):
    return sorted(json.loads((pathlib.Path(target) / _MANIFEST).read_text())["files"])


def test_bloom_point_read_is_exact_and_skips(spark, user_table):
    target, rows = user_table
    st = create_bloom_index(spark, target, "user_id")
    assert st["n_files_indexed"] == 8
    probe = min(r["user_id"] for r in rows.values())
    kept = prune_files_bloom(spark, target, _live(target), "user_id", probe)
    # the key lives in exactly one file (user_id % 8 split); bloom FPs
    # are deterministic for fixed data+hashes — this data has none
    assert len(kept) == 1
    got = {
        r["event_id"]
        for r in read_table(spark, target, point=("user_id", probe))
        .filter(F.col("user_id") == probe)
        .collect()
    }
    assert got == {k for k, r in rows.items() if r["user_id"] == probe}


def test_bloom_absent_key_prunes_everything(spark, user_table):
    target, rows = user_table
    create_bloom_index(spark, target, "user_id")
    absent = max(r["user_id"] for r in rows.values()) + 987654
    kept = prune_files_bloom(spark, target, _live(target), "user_id", absent)
    assert kept == []
    out = read_table(spark, target, point=("user_id", absent)).filter(
        F.col("user_id") == absent
    )
    assert out.count() == 0
    # empty-prune branch keeps the table schema
    assert set(out.columns) == {"event_id", "user_id", "event_type", "value"}


def test_bloom_unindexed_files_kept_and_refresh_tops_up(spark, user_table):
    target, rows = user_table
    create_bloom_index(spark, target, "user_id")
    extra = spark.createDataFrame(
        [(-1, 777777, "extra", 1.0)],
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    append_files(spark, target, extra.coalesce(1))
    # the new file has no bloom entry: EVERY probe keeps it
    absent = 999999999
    kept = prune_files_bloom(spark, target, _live(target), "user_id", absent)
    assert len(kept) == 1 and kept[0].startswith("append-")
    # and a lookup of the new row finds it despite no index entry
    got = (
        read_table(spark, target, point=("user_id", 777777))
        .filter(F.col("user_id") == 777777)
        .count()
    )
    assert got == 1
    # refresh: only the new file is indexed; afterwards the absent
    # probe prunes everything
    st = create_bloom_index(spark, target, "user_id")
    assert st["n_files_indexed"] == 1
    assert prune_files_bloom(spark, target, _live(target), "user_id", absent) == []


def test_bloom_resize_rejected(spark, user_table):
    target, _rows = user_table
    create_bloom_index(spark, target, "user_id")
    with pytest.raises(ValueError, match="already registered"):
        create_bloom_index(spark, target, "user_id", m_bits=1024)


def test_bloom_composes_with_dv(spark, user_table):
    """A DV'd row must not resurface through the bloom-pruned path."""
    target, rows = user_table
    create_bloom_index(spark, target, "user_id")
    probe = min(r["user_id"] for r in rows.values())
    delete_rows(spark, target, f"user_id = {probe}", mode="dv")
    out = read_table(spark, target, point=("user_id", probe)).filter(
        F.col("user_id") == probe
    )
    assert out.count() == 0


def test_bloom_entries_drop_with_files(spark, user_table):
    """Entries for files displaced by a rewrite leave the manifest
    (carry-forward filters to live), keeping metadata O(live files)."""
    from dbt_slabbing_spark.operators.layout import compact_table

    target, rows = user_table
    create_bloom_index(spark, target, "user_id")
    compact_table(spark, target, target_file_bytes=1 << 30)
    doc = json.loads((pathlib.Path(target) / _MANIFEST).read_text())
    assert "bloom" not in doc or not doc["bloom"].get("user_id")
    # conservative read still exact after the index emptied
    probe = min(r["user_id"] for r in rows.values())
    got = (
        read_table(spark, target, point=("user_id", probe))
        .filter(F.col("user_id") == probe)
        .count()
    )
    assert got == len([1 for r in rows.values() if r["user_id"] == probe])
