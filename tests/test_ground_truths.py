"""Golden replay (SURVEY.md §5 / FIXTURES.md §G): the Spark ground-truth
pipeline must reproduce the reference's outputs EXACTLY — keys, uid
lists, truth lists, including within-group order — for all 18 reachable
option combinations on the shipped ``ea1141-mapping.json``.

The oracle is the reference implementation itself, imported from the
read-only checkout and executed in-process (pure json+stdlib, no
side effects). This is behavioral replay, not code reuse.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

REF_SRC = "/root/reference/src/load_ground_truths.py"
REF_MAPPING = "/root/reference/ea1141-mapping.json"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_SRC) and os.path.exists(REF_MAPPING)),
    reason="reference checkout not present",
)

# (dbt_only, mri_excluded): (False, True) is unreachable — mri_excluded
# is only consulted when dbt_only=True (load_ground_truths.py:28-34).
FLAG_COMBOS = [(True, True), (True, False), (False, False)]


def _reference_fn():
    spec = importlib.util.spec_from_file_location("ref_load_ground_truths", REF_SRC)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_ea1141_dbt_truths


@pytest.fixture(scope="module")
def golden_json_text():
    with open(REF_MAPPING) as f:
        return f.read()


@pytest.fixture(scope="module")
def mapping_df(spark):
    from dbt_slabbing_spark.pipelines.ground_truths import read_mapping

    return read_mapping(spark, REF_MAPPING).cache()


def test_read_mapping_shape(mapping_df, golden_json_text):
    records = json.loads(golden_json_text)
    assert mapping_df.count() == len(records) == 2030
    # _ord must be the document insertion order.
    first = mapping_df.orderBy("_ord").limit(3).collect()
    expected_uids = list(records)[:3]
    assert [r["uid"] for r in first] == expected_uids


@pytest.mark.parametrize("scope", ["volume-wise", "breast-wise", "patient-wise"])
@pytest.mark.parametrize("gt_type", ["biopsy", "acr4+"])
@pytest.mark.parametrize("dbt_only,mri_excluded", FLAG_COMBOS)
def test_golden_replay(spark, mapping_df, golden_json_text, scope, gt_type, dbt_only, mri_excluded):
    from dbt_slabbing_spark.pipelines.ground_truths import ground_truth_labels

    expected = _reference_fn()(
        golden_json_text, gt_type=gt_type, scope=scope, dbt_only=dbt_only, mri_excluded=mri_excluded
    )
    got_rows = ground_truth_labels(
        mapping_df, gt_type=gt_type, scope=scope, dbt_only=dbt_only, mri_excluded=mri_excluded
    ).collect()
    got = {r["key"]: {"uids": list(r["uids"]), "truth": [list(t) for t in r["truth"]]} for r in got_rows}
    assert set(got) == set(expected), (
        f"key sets differ: +{sorted(set(got) - set(expected))[:5]} -{sorted(set(expected) - set(got))[:5]}"
    )
    for k, v in expected.items():
        assert got[k]["uids"] == v["uids"], f"uid list mismatch at {k}"
        assert got[k]["truth"] == v["truth"], f"truth list mismatch at {k}"


def test_invalid_options_raise(spark, mapping_df):
    from dbt_slabbing_spark.pipelines.ground_truths import ground_truth_labels

    with pytest.raises(ValueError):
        ground_truth_labels(mapping_df, gt_type="nope")
    with pytest.raises(ValueError):
        ground_truth_labels(mapping_df, scope="galaxy-wise")
