"""Corpus-wide physical-plan invariants: every registered query's plan
is screened for the anti-patterns that kill 100 TB runs. Per-query plan
guards (test_plan_quality.py) pin the tuned headliners; this sweep makes
sure no FUTURE query quietly ships a cartesian product, an unlabeled
all-pairs nested-loop join, or a data-sized single-partition exchange.
"""

from __future__ import annotations

import pytest

from dbt_slabbing_spark.queries import registry
from tests.conftest import SF_SMOKE

_REG = registry()

#: Queries allowed a non-Cross BroadcastNestedLoopJoin (a true theta
#: join). Every entry must have a documented scale story.
_BNLJ_ALLOWED = {
    # the labeled O(n²/2) exactness contract, row-count-guarded
    # (operators/similarity.py::require_exact_scan_small); scale path is
    # sim_neardup_pairs_lsh
    "sim_neardup_pairs",
    # edit-distance theta join against a SMALL fuzzy dimension (25
    # nations); inherently non-equi — at corpus scale the candidate set
    # would be banded by length/prefix first
    "join_fuzzy_levenshtein",
}

#: Max "Exchange SinglePartition" occurrences per query. Default 1 (a
#: single scalar-subquery/limit collapse); entries here are audited:
#: every extra single-partition exchange is a ONE-ROW scalar aggregate
#: (count/threshold verdict columns), never a data-sized stream.
_SINGLE_PARTITION_BUDGET = {
    "subquery_not_in_null_semantics": 2,  # two scalar NOT-IN probe aggs
    "ts_funnel_conversion": 3,  # three 1-row stage counts unioned
    "dedup_mllib_minhash_lsh": 3,  # three 1-row verdict aggregates
    "agg_hll_sketch_rollup": 2,  # global sketch-union + exact-count, both 1-row
    "graph_triangle_count": 2,  # edge-count + triangle-count, both 1-row
    # the ordering kernel's offset window is O(#partitions) rows, not
    # data rows; the SNM self-join plans that subtree once per side
    "dedup_sorted_neighborhood": 2,
    "dedup_entity_resolution": 2,  # embeds the SNM pass (same budget)
    # ONE 1-row corpus-stats aggregate, physically executed once inside
    # the persisted s4 table; it prints twice because InMemoryTableScan
    # repeats the cached subtree under both consumers (feedback pass +
    # rescore pass)
    "search_prf_expansion_topk": 2,
}

# Streaming jobs execute on build (memory-sink materialization) and are
# plan-guarded via their batch twins; skip them here.
_NAMES = sorted(n for n in _REG if not n.startswith("stream_"))


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name in _NAMES:
        df = _REG[name].fn(spark, SF_SMOKE)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product_anywhere(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian products in: {bad}"


def test_nested_loop_joins_are_labeled_or_cross(plans):
    bad = []
    for name, plan in plans.items():
        if name in _BNLJ_ALLOWED:
            continue
        for line in plan.splitlines():
            # Cross-type BNLJ of a literal/tiny broadcast frame (e.g. the
            # 32-row bit-position table) is linear in the big side; an
            # Inner/Left BNLJ is an all-pairs scan and must be allowlisted.
            if "BroadcastNestedLoopJoin" in line and "Cross" not in line:
                bad.append(name)
                break
    assert not bad, f"unlabeled nested-loop join in: {bad}"


def test_single_partition_exchanges_bounded(plans):
    bad = []
    for name, plan in plans.items():
        budget = _SINGLE_PARTITION_BUDGET.get(name, 1)
        n = plan.count("Exchange SinglePartition")
        if n > budget:
            bad.append((name, n, budget))
    assert not bad, f"single-partition exchanges over budget: {bad}"


def test_bnlj_allowlist_entries_still_exist():
    assert _BNLJ_ALLOWED <= set(_REG), "allowlist references removed queries"
