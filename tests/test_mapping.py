"""Mapping-pipeline tests.

1. Golden consistency: the decorrelated truth lookup must reproduce the
   four label columns of EVERY record in the shipped golden mapping
   (2 030 rows) from the raw clinical CSVs — this is the ordered-fold
   join of SURVEY.md §2.3 note (a), where a naive laterality join would
   silently diverge.
2. Synthetic dicom_meta fixture exercising every scan filter (P1-P5),
   earliest-study selection (S2), and the end-to-end build_mapping
   projection — hand-computed expectations.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

REF_ZIP = "/root/reference/EA1141-Reviewed-Clinical-Data-and-Data-Dictionaries.zip"
REF_MAPPING = "/root/reference/ea1141-mapping.json"

needs_reference = pytest.mark.skipif(
    not (os.path.exists(REF_ZIP) and os.path.exists(REF_MAPPING)),
    reason="reference checkout not present",
)


@pytest.fixture(scope="module")
def clinical(spark):
    from dbt_slabbing_spark.sources.clinical import load_clinical_tables

    if not os.path.exists(REF_ZIP):
        pytest.skip("reference zip not present")
    return load_clinical_tables(spark, REF_ZIP)


@needs_reference
def test_clinical_row_counts(clinical):
    # BASELINE.md §1: screening 500, tomo-lesions 15, mri-lesions 83.
    assert clinical["screening"].count() == 500
    assert clinical["tomo_lesions"].count() == 15
    assert clinical["mri_lesions"].count() == 83


@needs_reference
def test_truth_lookup_matches_golden(spark, clinical):
    """All 2030 golden records reproduced from the raw CSVs."""
    from dbt_slabbing_spark.pipelines.mapping import attach_truth_labels

    with open(REF_MAPPING) as f:
        golden = json.load(f)
    images = spark.createDataFrame(
        [
            Row(uid=uid, subject_de=v["Subject_DE"], frame_laterality=v["FrameLaterality"])
            for uid, v in golden.items()
        ],
        schema="uid string, subject_de string, frame_laterality string",
    )
    got = attach_truth_labels(
        images, clinical["screening"], clinical["tomo_lesions"], clinical["mri_lesions"]
    ).collect()
    assert len(got) == 2030
    mismatches = []
    for r in got:
        exp = golden[r["uid"]]
        actual = (r["dbt_birads"], r["dbt_outcome"], r["mri_birads"], r["mri_outcome"])
        expected = (exp["DBT_BIRADS"], exp["DBT_Outcome"], exp["MRI_BIRADS"], exp["MRI_Outcome"])
        if actual != expected:
            mismatches.append((r["uid"], actual, expected))
    assert not mismatches, f"{len(mismatches)} label mismatches; first: {mismatches[:3]}"


def _meta_row(**kw):
    base = dict(
        sop_instance_uid="uid-default",
        patient_id="EA1141-1234567",
        study_date="20120101",
        study_instance_uid="study-1",
        series_instance_uid="series-1",
        modality="MG",
        image_shape=[60, 2457, 1996],
        series_description="R CC Breast Tomosynthesis Image",
        slice_thickness=1,
        view_modifier=None,
        frame_laterality="R",
    )
    base.update(kw)
    base.setdefault("path", f"/archive/{base['patient_id']}/{base['study_date']}/{base['sop_instance_uid']}.dcm")
    return base  # plain dict → createDataFrame matches by name


DICOM_META_SCHEMA = (
    "path string, sop_instance_uid string, patient_id string, study_date string, "
    "study_instance_uid string, series_instance_uid string, modality string, "
    "image_shape array<int>, series_description string, slice_thickness int, "
    "view_modifier string, frame_laterality string"
)


@pytest.fixture(scope="module")
def dicom_meta(spark):
    rows = [
        _meta_row(sop_instance_uid="keep-1"),
        _meta_row(sop_instance_uid="keep-null-thickness", slice_thickness=None),
        _meta_row(sop_instance_uid="keep-null-modifier", view_modifier=None),
        _meta_row(sop_instance_uid="drop-mr", modality="MR"),                      # P1
        _meta_row(sop_instance_uid="drop-2d", image_shape=[2457, 1996]),           # P2
        _meta_row(sop_instance_uid="drop-proj", series_description="R CC Projection Views"),  # P3
        _meta_row(sop_instance_uid="drop-thick", slice_thickness=10),              # P4
        _meta_row(sop_instance_uid="drop-spot", view_modifier="Spot Compression"), # P5
        # patient with two studies: only the EARLIEST directory survives (S2)
        _meta_row(sop_instance_uid="keep-early", patient_id="EA1141-7777777", study_date="20100101"),
        _meta_row(sop_instance_uid="drop-late", patient_id="EA1141-7777777", study_date="20110101"),
    ]
    return [rows]  # wrapped so the fixture builds the DF lazily per test session


def test_build_mapping_synthetic(spark, dicom_meta):
    from dbt_slabbing_spark.pipelines.mapping import build_mapping

    meta_df = spark.createDataFrame(dicom_meta[0], schema=DICOM_META_SCHEMA)
    screening = spark.createDataFrame(
        [
            Row(TOMO_BIRADS_YR0="2", MRI_BIRADS_YR0="1", SUBJECT_DE="1234567", _line_no=0),
            # duplicate subject row: FIRST must win (setdefault)
            Row(TOMO_BIRADS_YR0="5", MRI_BIRADS_YR0="5", SUBJECT_DE="1234567", _line_no=1),
            Row(TOMO_BIRADS_YR0="4", MRI_BIRADS_YR0="3", SUBJECT_DE="7777777", _line_no=2),
        ],
        schema="TOMO_BIRADS_YR0 string, MRI_BIRADS_YR0 string, SUBJECT_DE string, _line_no long",
    )
    # lesion fold: subject 7777777 has a matching-laterality row ('1'≡R)
    # then a NON-matching row last → biopsy nulled, birads nulled.
    tomo = spark.createDataFrame(
        [
            Row(TOMO_LESIONBREAST_YR0="1", TOMO_LESIONOUTCOME_YR0="Invasive", SUBJECT_DE="7777777", _line_no=0),
            Row(TOMO_LESIONBREAST_YR0="2", TOMO_LESIONOUTCOME_YR0="Benign", SUBJECT_DE="7777777", _line_no=1),
        ],
        schema="TOMO_LESIONBREAST_YR0 string, TOMO_LESIONOUTCOME_YR0 string, SUBJECT_DE string, _line_no long",
    )
    mri = spark.createDataFrame(
        [],
        schema="MRI_LESIONBREAST_YR0 string, MRI_LESIONOUTCOME_YR0 string, SUBJECT_DE string, _line_no long",
    )

    out = {r["sop_instance_uid"]: r for r in build_mapping(meta_df, screening, tomo, mri, "/archive/").collect()}

    # filters: exactly the keeps survive
    assert set(out) == {"keep-1", "keep-null-thickness", "keep-null-modifier", "keep-early"}

    # screening first-row-wins + no lesion rows → birads from row 0
    r = out["keep-1"]
    assert (r["DBT_BIRADS"], r["MRI_BIRADS"], r["DBT_Outcome"], r["MRI_Outcome"]) == ("2", "1", None, None)
    # path rewrite (S8)
    assert r["ImagePath"] == "$ROOT$/EA1141-1234567/20120101/keep-1.dcm"
    assert r["Subject_DE"] == "1234567"

    # fold semantics: last tomo row ('2') ≠ R's code ('1') → both nulled
    r7 = out["keep-early"]
    assert r7["DBT_BIRADS"] is None and r7["DBT_Outcome"] is None
    # MRI branch untouched (no rows): screening value kept
    assert r7["MRI_BIRADS"] == "3" and r7["MRI_Outcome"] is None


def test_fold_last_row_matching(spark):
    """Opposite order: non-matching row FIRST, matching row LAST →
    biopsy = classification of the last row, but birads still nulled
    (a non-matching row existed; nothing restores birads)."""
    from dbt_slabbing_spark.pipelines.mapping import attach_truth_labels

    images = spark.createDataFrame(
        [Row(uid="u", subject_de="s1", frame_laterality="R")],
        schema="uid string, subject_de string, frame_laterality string",
    )
    screening = spark.createDataFrame(
        [Row(TOMO_BIRADS_YR0="3", MRI_BIRADS_YR0="2", SUBJECT_DE="s1", _line_no=0)],
        schema="TOMO_BIRADS_YR0 string, MRI_BIRADS_YR0 string, SUBJECT_DE string, _line_no long",
    )
    tomo = spark.createDataFrame(
        [
            Row(TOMO_LESIONBREAST_YR0="2", TOMO_LESIONOUTCOME_YR0="Benign", SUBJECT_DE="s1", _line_no=0),
            Row(TOMO_LESIONBREAST_YR0="1", TOMO_LESIONOUTCOME_YR0="DCIS", SUBJECT_DE="s1", _line_no=1),
        ],
        schema="TOMO_LESIONBREAST_YR0 string, TOMO_LESIONOUTCOME_YR0 string, SUBJECT_DE string, _line_no long",
    )
    mri = spark.createDataFrame(
        [],
        schema="MRI_LESIONBREAST_YR0 string, MRI_LESIONOUTCOME_YR0 string, SUBJECT_DE string, _line_no long",
    )
    r = attach_truth_labels(images, screening, tomo, mri).collect()[0]
    assert r["dbt_birads"] is None      # nulled by the non-matching row
    assert r["dbt_outcome"] == "MALIGNANT"  # last row matches → DCIS → MALIGNANT
    assert r["mri_birads"] == "2" and r["mri_outcome"] is None


def test_missing_subject_modes(spark):
    """on_missing_subject: default 'null' keeps the run alive with null
    labels; 'error' reproduces the reference's KeyError contract
    (src/generate_mapping.py:40) at execution time."""
    import pytest

    from dbt_slabbing_spark.pipelines.mapping import attach_truth_labels

    images = spark.createDataFrame(
        [Row(uid="u", subject_de="ghost", frame_laterality="R")],
        schema="uid string, subject_de string, frame_laterality string",
    )
    screening = spark.createDataFrame(
        [Row(TOMO_BIRADS_YR0="3", MRI_BIRADS_YR0="2", SUBJECT_DE="s1", _line_no=0)],
        schema="TOMO_BIRADS_YR0 string, MRI_BIRADS_YR0 string, SUBJECT_DE string, _line_no long",
    )
    empty = "LESIONBREAST string, LESIONOUTCOME string, SUBJECT_DE string, _line_no long"
    tomo = spark.createDataFrame(
        [], schema=empty.replace("LESION", "TOMO_LESION").replace(" string,", "_YR0 string,", 2)
    )
    mri = spark.createDataFrame(
        [], schema=empty.replace("LESION", "MRI_LESION").replace(" string,", "_YR0 string,", 2)
    )
    r = attach_truth_labels(images, screening, tomo, mri).collect()[0]
    assert r["dbt_birads"] is None and r["mri_outcome"] is None
    strict = attach_truth_labels(images, screening, tomo, mri, on_missing_subject="error")
    with pytest.raises(Exception, match="ghost"):
        strict.collect()
    # a present subject sails through strict mode
    ok = images.withColumn("subject_de", F.lit("s1"))
    row = attach_truth_labels(ok, screening, tomo, mri, on_missing_subject="error").collect()[0]
    assert row["dbt_birads"] == "3"
    with pytest.raises(ValueError):
        attach_truth_labels(images, screening, tomo, mri, on_missing_subject="boom")


def test_outcome_classifier_precedence(spark):
    """F1: benign list has precedence — 'Benign with atypia or high-risk
    lesion' is BENIGN; '.F'/'Unknown'/'No 6 month FUP imaging' UNKNOWN."""
    from dbt_slabbing_spark.pipelines.mapping import classify_outcome
    from pyspark.sql import functions as F

    cases = {
        "BIRADS 2 @ 6 months": "BENIGN",
        "Benign with atypia or high-risk lesion": "BENIGN",
        "BI-RADS score downgraded due to targeted ultrasound after AB-MR MRI": "BENIGN",
        "No biopsy": "BENIGN",
        "Invasive": "MALIGNANT",
        "DCIS": "MALIGNANT",
        ".F": "UNKNOWN",
        "Unknown": "UNKNOWN",
        "No 6 month FUP imaging": "UNKNOWN",
    }
    df = spark.createDataFrame([Row(s=s) for s in cases], schema="s string")
    got = {r["s"]: r["c"] for r in df.select("s", classify_outcome(F.col("s")).alias("c")).collect()}
    assert got == cases


def test_csv_lines_reader_matches_zip(spark, tmp_path):
    """The distributed zipWithIndex reader assigns the same _line_no as
    the driver-side zip reader."""
    import zipfile

    from dbt_slabbing_spark.sources.clinical import SCREENING_CSV, read_csv_lines, read_zip_member

    if not os.path.exists(REF_ZIP):
        pytest.skip("reference zip not present")
    with zipfile.ZipFile(REF_ZIP) as zf:
        data = zf.read(SCREENING_CSV)
    p = tmp_path / "screening.csv"
    p.write_bytes(data)
    cols = ["TOMO_BIRADS_YR0", "MRI_BIRADS_YR0", "SUBJECT_DE"]
    a = read_zip_member(spark, REF_ZIP, SCREENING_CSV, cols)
    b = read_csv_lines(spark, str(p), cols)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
