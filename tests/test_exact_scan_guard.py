"""The O(n²) exact-baseline operators must refuse oversized inputs
(VERDICT r2 "What's wrong" #2): the guard is the difference between an
exactness contract and an accidental 100 TB cross join."""

from __future__ import annotations

import pytest

from dbt_slabbing_spark.operators.similarity import (
    EXACT_SCAN_MAX_ROWS,
    ExactScanTooLarge,
    require_exact_scan_small,
)
from dbt_slabbing_spark.queries import registry
from tests.conftest import SF_SMOKE


def test_guard_trips_on_oversized_frame(spark):
    big = spark.range(EXACT_SCAN_MAX_ROWS + 1)
    with pytest.raises(ExactScanTooLarge, match="exceeds the exact-baseline ceiling"):
        require_exact_scan_small(big, what="unit-test scan")


def test_guard_passes_through_small_frame(spark):
    small = spark.range(10)
    assert require_exact_scan_small(small).count() == 10


def test_guard_custom_ceiling(spark):
    with pytest.raises(ExactScanTooLarge):
        require_exact_scan_small(spark.range(11), max_rows=10)


def test_neardup_pairs_tagged_and_twinned():
    reg = registry()
    q = reg["sim_neardup_pairs"]
    assert "exact-baseline" in q.tags
    # the scale twin must exist so the guard's error message points somewhere
    assert "sim_neardup_pairs_lsh" in reg


def test_neardup_pairs_still_runs_at_test_sf(spark):
    df = registry()["sim_neardup_pairs"].fn(spark, SF_SMOKE)
    assert df.count() > 0
