"""Driver-gate twins for the two reference pipelines (round 4).

1. Registry/oracle parity: ``ref_mapping_truth_labels`` and
   ``ref_ground_truth_labels`` must hash-match their DuckDB oracles —
   the same comparison the driver's correctness gate runs.
2. Fixture freshness: the committed ``tests/fixtures_ref/*.parquet``
   (the oracle's inputs) must be reproducible row-for-row from the
   reference's shipped zip/JSON, so the oracle can't silently drift
   from the real inputs.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from dbt_slabbing_spark.queries.reference_pipeline import (
    FIXTURES_DIR,
    REF_MAPPING,
    REF_ZIP,
    ref_ground_truth_labels,
    ref_mapping_truth_labels,
)
from dbt_slabbing_spark.queries import registry

from tests.canonical import assert_frames_match

needs_reference = pytest.mark.skipif(
    not (os.path.exists(REF_ZIP) and os.path.exists(REF_MAPPING)),
    reason="reference checkout not present",
)


def _oracle(name: str) -> str:
    return registry()[name].oracle


def test_ref_mapping_truth_labels_matches_oracle(spark):
    spdf = ref_mapping_truth_labels(spark, "").toPandas()
    con = duckdb.connect()
    odf = con.sql(_oracle("ref_mapping_truth_labels")).df()
    assert len(spdf) == 2030
    assert_frames_match(spdf, odf, "ref_mapping_truth_labels")


def test_ref_ground_truth_labels_matches_oracle(spark):
    spdf = ref_ground_truth_labels(spark, "").toPandas()
    con = duckdb.connect()
    odf = con.sql(_oracle("ref_ground_truth_labels")).df()
    # 18 combos; per-combo group counts golden-checked in
    # test_ground_truths.py — here the full keyed lists must hash-match.
    assert spdf.groupby(["scope", "gt_type", "dbt_only", "mri_excluded"]).ngroups == 18
    assert_frames_match(spdf, odf, "ref_ground_truth_labels")


@needs_reference
def test_fixtures_are_fresh(spark, tmp_path):
    """Committed oracle fixtures == fresh materialization from the
    reference inputs (guards against reference/testdata drift)."""
    import dbt_slabbing_spark.queries.reference_pipeline as rp

    fresh_dir = str(tmp_path / "fixtures_ref")
    orig = rp.FIXTURES_DIR
    rp.FIXTURES_DIR = fresh_dir
    try:
        rp.materialize_fixtures(spark)
    finally:
        rp.FIXTURES_DIR = orig
    for f in ("screening", "tomo_lesions", "mri_lesions", "mapping_records"):
        committed = pd.read_parquet(os.path.join(FIXTURES_DIR, f"{f}.parquet"))
        fresh = pd.read_parquet(os.path.join(fresh_dir, f"{f}.parquet"))
        pd.testing.assert_frame_equal(committed, fresh)
