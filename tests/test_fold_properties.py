"""Property-based tests (SURVEY.md §5.3) for the two riskiest
semantics: the lesion-fold truth lookup (note (a)) and the null-keeping
inequality filters (P4/P5).

The model is a direct transcription of the reference's loop semantics
(src/generate_mapping.py:37-94) over in-memory rows — the executable
spec the Spark aggregation must agree with on ARBITRARY inputs, not
just the golden file.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

OUTCOMES = [
    "Benign",
    "Benign with atypia or high-risk lesion",
    "BIRADS 1 @ 6 months",
    "BIRADS 2 @ 6 months",
    "BIRADS 3 @ 6 months",
    "BI-RADS score downgraded due to targeted ultrasound after AB-MR MRI",
    "No biopsy",
    "Invasive",
    "DCIS",
    ".F",
    "Unknown",
    "No 6 month FUP imaging",
    "",
]

BENIGN = ["BIRADS 1", "BIRADS 2", "BIRADS 3", "Benign", "No biopsy", "BI-RADS score downgraded"]
MALIGNANT = ["Invasive", "DCIS"]


def _model_fold(screening_birads: str | None, rows: list[tuple[str, str]], image_lat: str | None):
    """Reference loop semantics for ONE subject+laterality (spec model)."""
    birads, biopsy = screening_birads, None
    for lat, outcome in rows:
        matches = (image_lat == "R" and lat == "1") or (image_lat == "L" and lat == "2")
        if matches:
            if any(b in outcome for b in BENIGN):
                biopsy = "BENIGN"
            elif any(m in outcome for m in MALIGNANT):
                biopsy = "MALIGNANT"
            else:
                biopsy = "UNKNOWN"
        else:
            birads = None
            biopsy = None
    return birads, biopsy


lesion_rows = st.lists(
    st.tuples(st.sampled_from(["1", "2", "3"]), st.sampled_from(OUTCOMES)),
    max_size=6,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=lesion_rows,
    image_lat=st.sampled_from(["R", "L", None]),
    screening_birads=st.sampled_from(["1", "2", "3", "4", "5"]),
)
def test_fold_agrees_with_reference_model(spark, rows, image_lat, screening_birads):
    from dbt_slabbing_spark.pipelines.mapping import attach_truth_labels

    images = spark.createDataFrame(
        [Row(uid="u", subject_de="s", frame_laterality=image_lat)],
        schema="uid string, subject_de string, frame_laterality string",
    )
    screening = spark.createDataFrame(
        [Row(TOMO_BIRADS_YR0=screening_birads, MRI_BIRADS_YR0=screening_birads, SUBJECT_DE="s", _line_no=0)],
        schema="TOMO_BIRADS_YR0 string, MRI_BIRADS_YR0 string, SUBJECT_DE string, _line_no long",
    )
    tomo = spark.createDataFrame(
        [
            Row(TOMO_LESIONBREAST_YR0=lat, TOMO_LESIONOUTCOME_YR0=out, SUBJECT_DE="s", _line_no=i)
            for i, (lat, out) in enumerate(rows)
        ],
        schema="TOMO_LESIONBREAST_YR0 string, TOMO_LESIONOUTCOME_YR0 string, SUBJECT_DE string, _line_no long",
    )
    mri = spark.createDataFrame(
        [], schema="MRI_LESIONBREAST_YR0 string, MRI_LESIONOUTCOME_YR0 string, SUBJECT_DE string, _line_no long"
    )
    r = attach_truth_labels(images, screening, tomo, mri).collect()[0]
    exp_birads, exp_biopsy = _model_fold(screening_birads, rows, image_lat)
    assert (r["dbt_birads"], r["dbt_outcome"]) == (exp_birads, exp_biopsy), (
        f"rows={rows} lat={image_lat}: got ({r['dbt_birads']}, {r['dbt_outcome']}), "
        f"expected ({exp_birads}, {exp_biopsy})"
    )


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(values=st.lists(st.one_of(st.none(), st.integers(min_value=0, max_value=15)), max_size=12))
def test_null_keeping_inequality_filter(spark, values):
    """P4/P5: Python `x != 10` keeps None; SQL `!=` drops null — the
    engine's explicit `| isNull()` disjunct must restore Python
    semantics for every input."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(v=v) for v in values], schema="v int")
    kept = sorted(
        (r["v"] for r in df.filter((F.col("v") != 10) | F.col("v").isNull()).collect()),
        key=lambda x: (x is None, x),
    )
    expected = sorted((v for v in values if v != 10), key=lambda x: (x is None, x))
    assert kept == expected
