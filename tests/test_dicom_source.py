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


# ---------------------------------------------------------------------------
# Synthesized REAL DICOM byte streams (PS3.10 part-10, explicit VR LE) —
# the decode path itself, not an injected parser. Mirrors the
# synthesized-PNG/MP3 approach of test_multimodal_decoders.py.


def _pad(s: str, null: bool = False) -> bytes:
    b = s.encode("ascii")
    return b + (b"\x00" if null else b" ") if len(b) % 2 else b


def _el(group: int, elem: int, vr: str, value: bytes) -> bytes:
    tag = group.to_bytes(2, "little") + elem.to_bytes(2, "little")
    if vr in ("OB", "OW", "OF", "OD", "OL", "SQ", "UC", "UR", "UT", "UN"):
        return tag + vr.encode() + b"\x00\x00" + len(value).to_bytes(4, "little") + value
    return tag + vr.encode() + len(value).to_bytes(2, "little") + value


def _item(value: bytes) -> bytes:
    return b"\xfe\xff\x00\xe0" + len(value).to_bytes(4, "little") + value


def _undef_sq(group: int, elem: int, items: bytes) -> bytes:
    tag = group.to_bytes(2, "little") + elem.to_bytes(2, "little")
    return (
        tag + b"SQ\x00\x00" + b"\xff\xff\xff\xff" + items
        + b"\xfe\xff\xdd\xe0" + b"\x00\x00\x00\x00"
    )


def _undef_item(value: bytes) -> bytes:
    return (
        b"\xfe\xff\x00\xe0" + b"\xff\xff\xff\xff" + value
        + b"\xfe\xff\x0d\xe0" + b"\x00\x00\x00\x00"
    )


def synth_dicom(
    uid="1.2.840.1.2.3.4",
    modality="MG",
    n_frames=67,
    rows=2457,
    cols=1996,
    desc="R CC Breast Tomosynthesis Image",
    thick="1",
    lat="R",
    viewmod=None,
    transfer_syntax="1.2.840.10008.1.2.1",
    undefined_lengths=False,
) -> bytes:
    """A minimal valid part-10 stream with the tags the reference reads
    (src/generate_mapping.py:116-141): scalar UIDs/Modality/Rows/
    Columns/NumberOfFrames plus the three NESTED sequence paths
    (SharedFunctionalGroups→PixelMeasures→SliceThickness, →FrameAnatomy
    →FrameLaterality, ViewCode→ViewModifierCode→CodeMeaning)."""
    meta_body = _el(0x0002, 0x0010, "UI", _pad(transfer_syntax, null=True))
    meta = _el(0x0002, 0x0000, "UL", len(meta_body).to_bytes(4, "little")) + meta_body
    sq = (lambda g, e, items: _undef_sq(g, e, items)) if undefined_lengths else (
        lambda g, e, items: _el(g, e, "SQ", items)
    )
    item = _undef_item if undefined_lengths else _item
    ds = b""
    ds += _el(0x0008, 0x0018, "UI", _pad(uid, null=True))
    ds += _el(0x0008, 0x0060, "CS", _pad(modality))
    ds += _el(0x0008, 0x103E, "LO", _pad(desc))
    ds += _el(0x0020, 0x000D, "UI", _pad(uid + ".1", null=True))
    ds += _el(0x0020, 0x000E, "UI", _pad(uid + ".2", null=True))
    if n_frames is not None:
        ds += _el(0x0028, 0x0008, "IS", _pad(str(n_frames)))
    if rows is not None:
        ds += _el(0x0028, 0x0010, "US", rows.to_bytes(2, "little"))
        ds += _el(0x0028, 0x0011, "US", cols.to_bytes(2, "little"))
    if viewmod is not None:
        vm_item = item(_el(0x0008, 0x0104, "LO", _pad(viewmod)))
        ds += sq(0x0054, 0x0220, item(sq(0x0054, 0x0222, vm_item)))
    shared = b""
    if thick is not None:
        shared += sq(0x0028, 0x9110, item(_el(0x0018, 0x0050, "DS", _pad(thick))))
    if lat is not None:
        shared += sq(0x0020, 0x9071, item(_el(0x0020, 0x9072, "CS", _pad(lat))))
    if shared:
        ds += sq(0x5200, 0x9229, item(shared))
    return b"\x00" * 128 + b"DICM" + meta + ds


def test_lite_parse_synthesized_stream():
    from dbt_slabbing_spark.sources.dicom import _lite_parse

    got = _lite_parse("/a/v.dcm", synth_dicom(viewmod="Spot Compression"))
    assert got == {
        "path": "/a/v.dcm",
        "sop_instance_uid": "1.2.840.1.2.3.4",
        "study_instance_uid": "1.2.840.1.2.3.4.1",
        "series_instance_uid": "1.2.840.1.2.3.4.2",
        "modality": "MG",
        "image_shape": [67, 2457, 1996],
        "series_description": "R CC Breast Tomosynthesis Image",
        "slice_thickness": 1,
        "view_modifier": "Spot Compression",
        "frame_laterality": "R",
    }


def test_lite_parse_shape_and_missing_tag_semantics():
    from dbt_slabbing_spark.sources.dicom import _lite_parse

    # single-frame (no NumberOfFrames) → 2-D shape, like pydicom's
    # pixel_array.shape for single-frame files (reference P2 filter)
    g = _lite_parse("/a/b.dcm", synth_dicom(n_frames=None))
    assert g["image_shape"] == [2457, 1996]
    # NumberOfFrames == 1 also behaves 2-D
    assert _lite_parse("/a/b.dcm", synth_dicom(n_frames=1))["image_shape"] == [2457, 1996]
    # missing optional tags → None (the reference's try/except → None)
    g = _lite_parse("/a/b.dcm", synth_dicom(thick=None, lat=None))
    assert g["slice_thickness"] is None and g["frame_laterality"] is None
    assert g["view_modifier"] is None
    g = _lite_parse("/a/b.dcm", synth_dicom(rows=None, n_frames=None))
    assert g["image_shape"] is None


def test_lite_parse_undefined_length_sequences():
    """Same tags, encoded with UNDEFINED-length SQs and items (the other
    legal PS3.5 encoding, common in real archives)."""
    from dbt_slabbing_spark.sources.dicom import _lite_parse

    got = _lite_parse(
        "/a/u.dcm", synth_dicom(viewmod="Spot Compression", undefined_lengths=True)
    )
    assert got["slice_thickness"] == 1
    assert got["frame_laterality"] == "R"
    assert got["view_modifier"] == "Spot Compression"
    assert got["image_shape"] == [67, 2457, 1996]


def test_lite_parse_rejects_foreign_transfer_syntax():
    from dbt_slabbing_spark.sources.dicom import _lite_parse

    with pytest.raises(NotImplementedError):
        _lite_parse("/a/b.dcm", synth_dicom(transfer_syntax="1.2.840.10008.1.2"))
    with pytest.raises(ValueError):
        _lite_parse("/a/b.dcm", b"not dicom at all")


def test_lite_parse_matches_pydicom():
    if not HAS_PYDICOM:
        pytest.skip("pydicom not in this container")
    from dbt_slabbing_spark.sources.dicom import _lite_parse, _pydicom_parse

    raw = synth_dicom(viewmod="Spot Compression")
    assert _lite_parse("/p.dcm", raw) == _pydicom_parse("/p.dcm", raw)


def test_extract_metadata_real_decode_end_to_end(spark, tmp_path):
    """The DEFAULT decode path (no injected parser) over a synthesized
    archive: binaryFile scan → mapInPandas → real tag parsing."""
    d = tmp_path / "EA1141-7948334" / "20100101"
    d.mkdir(parents=True)
    (d / "vol-a.dcm").write_bytes(synth_dicom(uid="1.2.1", n_frames=67))
    (d / "vol-b.dcm").write_bytes(
        synth_dicom(uid="1.2.2", n_frames=None, desc="ROUTINE Projection")
    )
    rows = {
        r["sop_instance_uid"]: r.asDict()
        for r in extract_metadata(scan_archive(spark, str(tmp_path))).collect()
    }
    assert set(rows) == {"1.2.1", "1.2.2"}
    a = rows["1.2.1"]
    assert list(a["image_shape"]) == [67, 2457, 1996]
    assert a["modality"] == "MG" and a["slice_thickness"] == 1
    assert a["patient_id"] == "EA1141-7948334" and a["study_date"] == "20100101"
    assert list(rows["1.2.2"]["image_shape"]) == [2457, 1996]


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


def test_extract_metadata_on_error_policies(spark, tmp_path):
    """One corrupt file among good ones: default strict mode fails the
    scan (reference-faithful); on_error='null' quarantines it as an
    all-null-tags row so the archive job survives — the 100 TB
    posture."""
    d = tmp_path / "EA1141-1" / "20100101"
    d.mkdir(parents=True)
    (d / "good.dcm").write_bytes(synth_dicom(uid="1.9.1"))
    (d / "bad.dcm").write_bytes(b"\x00" * 200)  # no DICM magic

    files = scan_archive(spark, str(tmp_path))
    with pytest.raises(Exception):
        extract_metadata(files).collect()

    rows = {r["path"].split("/")[-1]: r for r in extract_metadata(files, on_error="null").collect()}
    assert rows["good.dcm"]["sop_instance_uid"] == "1.9.1"
    bad = rows["bad.dcm"]
    assert bad["sop_instance_uid"] is None and bad["image_shape"] is None
    # path-derived partition columns survive even for the corrupt file
    assert bad["patient_id"] == "EA1141-1" and bad["study_date"] == "20100101"
    with pytest.raises(ValueError):
        extract_metadata(files, on_error="quarantine")


def test_lite_parse_fuzz_never_hangs():
    """Deterministic byte-level fuzz: truncations and single-byte
    mutations of a valid stream must either parse or raise — bounded
    time, no hangs, no non-exception failures (the walker's offsets
    are strictly increasing, so malformed lengths fall off the end)."""
    from dbt_slabbing_spark.sources.dicom import _lite_parse

    base = synth_dicom(viewmod="Spot Compression", undefined_lengths=True)
    outcomes = {"ok": 0, "err": 0}
    # truncations at every 7th offset
    for cut in range(0, len(base), 7):
        try:
            _lite_parse("/f.dcm", base[:cut])
            outcomes["ok"] += 1
        except Exception:
            outcomes["err"] += 1
    # single-byte mutations at a deterministic spread of offsets
    for i in range(0, len(base), 5):
        mutated = base[:i] + bytes([(base[i] + 131) % 256]) + base[i + 1 :]
        try:
            _lite_parse("/f.dcm", mutated)
            outcomes["ok"] += 1
        except Exception:
            outcomes["err"] += 1
    assert outcomes["ok"] > 0 and outcomes["err"] > 0  # both regimes exercised
