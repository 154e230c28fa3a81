"""DICOM source plumbing tests (no pydicom in this container — the
parse is injected; scan, path parsing, earliest-study pruning and the
Arrow mapInPandas boundary are the real thing)."""

from __future__ import annotations

import json

import pytest

from dbt_slabbing_spark.sources.dicom import (
    HAS_PYDICOM,
    earliest_study_paths,
    extract_metadata,
    scan_archive,
)


@pytest.fixture()
def archive(tmp_path):
    layout = {
        ("EA1141-1111111", "20100101"): ["uid-a", "uid-b"],
        ("EA1141-1111111", "20110101"): ["uid-late"],   # later study → pruned
        ("EA1141-2222222", "20120301"): ["uid-c"],
    }
    for (pid, study), uids in layout.items():
        d = tmp_path / pid / study
        d.mkdir(parents=True)
        for uid in uids:
            meta = {"uid": uid, "modality": "MG", "pid": pid}
            (d / f"{uid}.dcm").write_bytes(json.dumps(meta).encode())
        (d / "ignore.txt").write_text("not dicom")  # glob-filtered
    return str(tmp_path)


def _make_fake_parse():
    # Nested so cloudpickle ships it by value — a module-level function
    # in tests/ would be pickled by reference and fail to import on
    # executors (tests/ isn't on the worker PYTHONPATH).
    def fake_parse(path: str, content: bytes) -> dict:
        import json as _json

        meta = _json.loads(content)
        return {
            "path": path,
            "sop_instance_uid": meta["uid"],
            "study_instance_uid": "study-" + meta["uid"],
            "series_instance_uid": "series-" + meta["uid"],
            "modality": meta["modality"],
            "image_shape": [60, 100, 80],
            "series_description": "R CC Breast Tomosynthesis Image",
            "slice_thickness": None,
            "view_modifier": None,
            "frame_laterality": "R",
        }

    return fake_parse


_fake_parse = _make_fake_parse()


def test_scan_parses_path_columns(spark, archive):
    files = scan_archive(spark, archive)
    rows = files.select("path", "patient_id", "study_date").collect()
    assert len(rows) == 4  # .txt filtered by the glob
    assert {r["patient_id"] for r in rows} == {"EA1141-1111111", "EA1141-2222222"}


def test_earliest_study_pruning_before_decode(spark, archive):
    pruned = earliest_study_paths(scan_archive(spark, archive))
    studies = {(r["patient_id"], r["study_date"]) for r in pruned.collect()}
    assert studies == {("EA1141-1111111", "20100101"), ("EA1141-2222222", "20120301")}


def test_extract_metadata_plumbing(spark, archive):
    meta = extract_metadata(earliest_study_paths(scan_archive(spark, archive)), parse_fn=_fake_parse)
    rows = {r["sop_instance_uid"]: r for r in meta.collect()}
    assert set(rows) == {"uid-a", "uid-b", "uid-c"}
    r = rows["uid-a"]
    assert r["patient_id"] == "EA1141-1111111" and r["study_date"] == "20100101"
    assert list(r["image_shape"]) == [60, 100, 80]
    assert r["slice_thickness"] is None  # nullable tags survive Arrow


def test_real_decode_gated(spark, archive):
    if HAS_PYDICOM:
        pytest.skip("pydicom unexpectedly present")
    with pytest.raises(NotImplementedError):
        extract_metadata(scan_archive(spark, archive))


def test_feeds_mapping_pipeline(spark, archive):
    """End-to-end: binary scan → metadata → build_mapping projection."""
    from pyspark.sql import Row

    from dbt_slabbing_spark.pipelines.mapping import build_mapping

    meta = extract_metadata(earliest_study_paths(scan_archive(spark, archive)), parse_fn=_fake_parse)
    screening = spark.createDataFrame(
        [
            Row(TOMO_BIRADS_YR0="1", MRI_BIRADS_YR0="1", SUBJECT_DE="1111111", _line_no=0),
            Row(TOMO_BIRADS_YR0="2", MRI_BIRADS_YR0="2", SUBJECT_DE="2222222", _line_no=1),
        ],
        schema="TOMO_BIRADS_YR0 string, MRI_BIRADS_YR0 string, SUBJECT_DE string, _line_no long",
    )
    empty = spark.createDataFrame(
        [], schema="TOMO_LESIONBREAST_YR0 string, TOMO_LESIONOUTCOME_YR0 string, SUBJECT_DE string, _line_no long"
    )
    empty_m = spark.createDataFrame(
        [], schema="MRI_LESIONBREAST_YR0 string, MRI_LESIONOUTCOME_YR0 string, SUBJECT_DE string, _line_no long"
    )
    # binaryFile paths are URIs (file:/…) — image_root must be given in
    # the same representation (the reference's str.replace contract).
    out = build_mapping(meta, screening, empty, empty_m, "file:" + archive + "/").collect()
    assert len(out) == 3
    by_uid = {r["sop_instance_uid"]: r for r in out}
    assert by_uid["uid-c"]["DBT_BIRADS"] == "2"
    assert by_uid["uid-c"]["ImagePath"].startswith("$ROOT$/EA1141-2222222/")
