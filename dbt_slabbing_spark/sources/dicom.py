"""DICOM archive source: ``binaryFile`` scan → metadata DataFrame.

Reference: the serial per-file loop at ``src/generate_mapping.py:16-28``
(scan) and ``:116-141`` (pydicom read + tag extraction). Spark-first
re-expression:

- S1/S3: ``spark.read.format("binaryFile")`` with ``pathGlobFilter=
  "*.dcm"`` + ``recursiveFileLookup`` — a partitioned, parallel scan of
  the archive instead of an ``os.listdir`` walk.
- Path-derived columns: ``patient_id``/``study_date`` parsed from the
  ``ROOT/EA1141-<pid>/<studydate>/<uid>.dcm`` layout (README.md data
  structuration) with ``regexp_extract`` — these become partition-prune
  keys at 100 TB (the directory layout already encodes them).
- S2: earliest-study selection runs on paths BEFORE any byte is
  decoded (the reference decodes ``pixel_array`` for every file and
  then filters — ``:117-118`` — decompressing ~100 MB per volume to
  read 3 ints; SURVEY.md §4).
- S5: the pydicom parse is an Arrow-batched ``mapInPandas`` over the
  binary content, header-only (``stop_before_pixels``): shape comes
  from NumberOfFrames/Rows/Columns tags, not the pixel buffer. Catalyst
  cannot prune inside an opaque UDF, so the pruning lives in the UDF.

Decode: pydicom when importable, else ``_lite_parse`` — a
dependency-free explicit-VR-little-endian header reader (same
philosophy as the PNG/MP3/... header decoders in
``operators/multimodal.py``): enough of PS3.10/PS3.5 to walk the data
elements and nested sequences the reference touches
(``src/generate_mapping.py:116-141``), hard-gated to the explicit-VR
LE transfer syntax so it can never silently misparse compressed or
implicit-VR files. Exercised end-to-end in pytest against synthesized
valid DICOM byte streams.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:
    import pydicom  # type: ignore

    HAS_PYDICOM = True
except Exception:
    pydicom = None
    HAS_PYDICOM = False

#: Output schema of the metadata extraction (mirrors FIXTURES.md §E).
DICOM_META_SCHEMA = (
    "path string, sop_instance_uid string, patient_id string, study_date string, "
    "study_instance_uid string, series_instance_uid string, modality string, "
    "image_shape array<int>, series_description string, slice_thickness int, "
    "view_modifier string, frame_laterality string"
)

_PATH_RE = r"/(EA1141-[^/]+)/([^/]+)/[^/]+\.dcm$"


def scan_archive(spark: SparkSession, image_root: str) -> DataFrame:
    """S1+S3: parallel binary scan with path-derived partition columns."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.dcm")
        .option("recursiveFileLookup", "true")
        .load(image_root)
    )
    return files.select(
        F.col("path"),
        F.col("content"),
        F.regexp_extract("path", _PATH_RE, 1).alias("patient_id"),
        F.regexp_extract("path", _PATH_RE, 2).alias("study_date"),
    )


def earliest_study_paths(files: DataFrame) -> DataFrame:
    """S2 on paths only — no decode cost for dropped studies
    (min over study-date DIRECTORY NAMES, string compare, ``:20-21``)."""
    from pyspark.sql import Window

    w = Window.partitionBy("patient_id")
    return (
        files.withColumn("_min_study", F.min("study_date").over(w))
        .filter(F.col("study_date") == F.col("_min_study"))
        .drop("_min_study")
    )


def _pydicom_parse(path: str, content: bytes) -> dict:
    """Header-only tag extraction (tags of ``:116-141``); shape derived
    from NumberOfFrames×Rows×Columns instead of decoding pixels."""
    import io

    ds = pydicom.dcmread(io.BytesIO(content), stop_before_pixels=True)

    def tag(fn, default=None):
        try:
            return fn()
        except Exception:
            return default

    n_frames = tag(lambda: int(ds.NumberOfFrames))
    rows, cols = tag(lambda: int(ds.Rows)), tag(lambda: int(ds.Columns))
    # NumberOfFrames == 1 behaves like an absent tag: pydicom's
    # pixel_array.shape is 2-D (rows, cols) for single-frame files, so a
    # [1, rows, cols] here would wrongly pass the reference's 3-D filter
    # (reference src/generate_mapping.py P2 semantics).
    if n_frames is not None and n_frames > 1 and rows is not None:
        shape = [n_frames, rows, cols]
    elif rows is not None:
        shape = [rows, cols]
    else:
        shape = None
    return {
        "path": path,
        "sop_instance_uid": tag(lambda: str(ds.SOPInstanceUID)),
        "study_instance_uid": tag(lambda: str(ds.StudyInstanceUID)),
        "series_instance_uid": tag(lambda: str(ds.SeriesInstanceUID)),
        "modality": tag(lambda: str(ds.Modality)),
        "image_shape": shape,
        "series_description": tag(lambda: str(ds.SeriesDescription)),
        "slice_thickness": tag(
            lambda: int(ds.SharedFunctionalGroupsSequence[0].PixelMeasuresSequence[0].SliceThickness)
        ),
        "view_modifier": tag(lambda: str(ds.ViewCodeSequence[0].ViewModifierCodeSequence[0].CodeMeaning)),
        "frame_laterality": tag(
            lambda: str(ds.SharedFunctionalGroupsSequence[0].FrameAnatomySequence[0].FrameLaterality)
        ),
    }


#: Transfer syntax the lite parser accepts (Explicit VR Little Endian).
EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"

#: VRs whose element header is 12 bytes (2 reserved + 4-byte length).
_LONG_VRS = frozenset({"OB", "OW", "OF", "OD", "OL", "SQ", "UC", "UR", "UT", "UN"})

_UNDEFINED = 0xFFFFFFFF


def _parse_one(buf: bytes, off: int, end: int) -> tuple:
    """Parse ONE explicit-VR-LE data element at ``off``; returns
    ``((group, elem), vr, value_start, value_end, next_off)``.

    UNDEFINED-length values (legal for SQ here; pixel data stays
    unread) are delimited by recursive descent over their items —
    defined-length items skip by length, undefined-length items parse
    their nested elements until the item delimitation item. A naive
    tag+length forward scan would misparse explicit-VR headers inside
    items (VR bytes read as a length), so descent is the only correct
    walk."""
    group = int.from_bytes(buf[off : off + 2], "little")
    elem = int.from_bytes(buf[off + 2 : off + 4], "little")
    vr = buf[off + 4 : off + 6].decode("ascii", errors="replace")
    if vr in _LONG_VRS:
        length = int.from_bytes(buf[off + 8 : off + 12], "little")
        voff = off + 12
    else:
        length = int.from_bytes(buf[off + 6 : off + 8], "little")
        voff = off + 8
    if length != _UNDEFINED:
        # Clamp to the walk's end: a corrupt length must not push the
        # value range past the buffer — downstream walkers iterate to
        # the range end 8 bytes at a time, and an unclamped 32-bit
        # length turns that into a multi-billion-step phantom walk
        # over empty slices (found by the byte-fuzz test).
        vend = max(voff, min(voff + length, end))
        return (group, elem), vr, voff, vend, vend
    p = voff
    while p + 8 <= end:
        g2 = int.from_bytes(buf[p : p + 2], "little")
        e2 = int.from_bytes(buf[p + 2 : p + 4], "little")
        l2 = int.from_bytes(buf[p + 4 : p + 8], "little")
        if (g2, e2) == (0xFFFE, 0xE0DD):  # sequence delimitation item
            return (group, elem), vr, voff, p, p + 8
        if (g2, e2) != (0xFFFE, 0xE000):
            raise ValueError(f"expected item tag at offset {p}")
        if l2 != _UNDEFINED:
            p += 8 + l2
        else:
            q = p + 8
            while q + 8 <= end:
                g3 = int.from_bytes(buf[q : q + 2], "little")
                e3 = int.from_bytes(buf[q + 2 : q + 4], "little")
                if (g3, e3) == (0xFFFE, 0xE00D):  # item delimitation
                    q += 8
                    break
                q = _parse_one(buf, q, end)[4]
            p = q
    # fell off the end (truncated/corrupt): clamp — a corrupt item
    # length can fling p billions past the buffer, and an unclamped
    # range turns the next walker into a phantom 8-byte-step crawl
    # (found by the byte-fuzz test).
    p = min(p, end)
    return (group, elem), vr, voff, p, p


def _lite_elements(buf: bytes, start: int, end: int) -> Iterator[tuple]:
    """Walk explicit-VR-LE data elements in ``buf[start:end]``, yielding
    ``((group, elem), vr, value_start, value_end)``."""
    off = start
    while off + 8 <= end:
        tag, vr, a, b, off = _parse_one(buf, off, end)
        yield tag, vr, a, b


def _lite_items(buf: bytes, start: int, end: int) -> Iterator[tuple[int, int]]:
    """Yield (start, end) value ranges of the items of an SQ value."""
    off = start
    while off + 8 <= end:
        group = int.from_bytes(buf[off : off + 2], "little")
        elem = int.from_bytes(buf[off + 2 : off + 4], "little")
        length = int.from_bytes(buf[off + 4 : off + 8], "little")
        if (group, elem) != (0xFFFE, 0xE000):
            break
        if length == _UNDEFINED:
            # undefined-length item: ends at its item delimitation item
            p = off + 8
            while p + 8 <= end:
                g2 = int.from_bytes(buf[p : p + 2], "little")
                e2 = int.from_bytes(buf[p + 2 : p + 4], "little")
                if (g2, e2) == (0xFFFE, 0xE00D):
                    break
                p = _parse_one(buf, p, end)[4]
            yield off + 8, p
            off = p + 8
        else:
            # clamped like _parse_one: corrupt lengths must not hand a
            # past-the-buffer range to the next walker
            yield off + 8, max(off + 8, min(off + 8 + length, end))
            off = off + 8 + length


def _lite_tag_map(buf: bytes, start: int, end: int) -> dict:
    """One level of elements as {tag: (vr, vstart, vend)} (last wins)."""
    return {tag: (vr, a, b) for tag, vr, a, b in _lite_elements(buf, start, end)}


def _lite_parse(path: str, content: bytes) -> dict:
    """Dependency-free header parse, semantics-identical to
    :func:`_pydicom_parse` for explicit-VR-little-endian streams.

    Layout per PS3.10: 128-byte preamble + 'DICM' + file-meta group
    (0002,xxxx; always explicit VR LE) + dataset. Refuses any transfer
    syntax other than Explicit VR Little Endian rather than guessing —
    compressed/implicit archives need the real codec (pydicom path).
    """
    if len(content) < 132 or content[128:132] != b"DICM":
        raise ValueError(f"{path}: not a DICOM part-10 stream")

    def text(rng) -> str:
        return content[rng[1] : rng[2]].decode("ascii", errors="replace").rstrip(" \x00")

    # file meta group: parse elements until the group ends (its extent
    # comes from (0002,0000) FileMetaInformationGroupLength).
    meta_hdr = _lite_tag_map(content, 132, min(len(content), 132 + 12))
    glen_rng = meta_hdr.get((0x0002, 0x0000))
    if glen_rng is None:
        raise ValueError(f"{path}: missing file meta group length")
    meta_end = glen_rng[2] + int.from_bytes(content[glen_rng[1] : glen_rng[2]], "little")
    meta_end = min(meta_end, len(content))  # corrupt group length clamp
    meta = _lite_tag_map(content, 132, meta_end)
    ts_rng = meta.get((0x0002, 0x0010))
    ts = text(ts_rng) if ts_rng else ""
    if ts != EXPLICIT_VR_LE:
        raise NotImplementedError(
            f"{path}: transfer syntax {ts!r} needs pydicom (lite parser reads "
            f"explicit VR little endian only)"
        )

    top = _lite_tag_map(content, meta_end, len(content))

    def s(tag):
        rng = top.get(tag)
        return text(rng) if rng is not None else None

    def us(tag):
        rng = top.get(tag)
        return int.from_bytes(content[rng[1] : rng[2]], "little") if rng is not None else None

    def seq_first(parent: dict, tag) -> dict | None:
        rng = parent.get(tag)
        if rng is None:
            return None
        for a, b in _lite_items(content, rng[1], rng[2]):
            return _lite_tag_map(content, a, b)
        return None

    nf_txt = s((0x0028, 0x0008))
    n_frames = int(nf_txt) if nf_txt else None
    rows, cols = us((0x0028, 0x0010)), us((0x0028, 0x0011))
    if n_frames is not None and n_frames > 1 and rows is not None:
        shape = [n_frames, rows, cols]
    elif rows is not None:
        shape = [rows, cols]
    else:
        shape = None

    shared = seq_first(top, (0x5200, 0x9229))
    pix = seq_first(shared, (0x0028, 0x9110)) if shared is not None else None
    anat = seq_first(shared, (0x0020, 0x9071)) if shared is not None else None
    view = seq_first(top, (0x0054, 0x0220))
    viewmod = seq_first(view, (0x0054, 0x0222)) if view is not None else None

    def nested_text(m: dict | None, tag):
        if m is None or tag not in m:
            return None
        vr, a, b = m[tag]
        return content[a:b].decode("ascii", errors="replace").rstrip(" \x00")

    thick_txt = nested_text(pix, (0x0018, 0x0050))
    return {
        "path": path,
        "sop_instance_uid": s((0x0008, 0x0018)),
        "study_instance_uid": s((0x0020, 0x000D)),
        "series_instance_uid": s((0x0020, 0x000E)),
        "modality": s((0x0008, 0x0060)),
        "image_shape": shape,
        "series_description": s((0x0008, 0x103E)),
        "slice_thickness": int(float(thick_txt)) if thick_txt else None,
        "view_modifier": nested_text(viewmod, (0x0008, 0x0104)),
        "frame_laterality": nested_text(anat, (0x0020, 0x9072)),
    }


#: Field names of DICOM_META_SCHEMA in order (for null-row synthesis).
_META_FIELDS = [f.split()[0] for f in DICOM_META_SCHEMA.split(", ")]


def extract_metadata(
    files: DataFrame,
    parse_fn: Callable[[str, bytes], dict] | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """S5: Arrow-batched metadata extraction over (path, content).

    ``parse_fn`` defaults to pydicom when importable (full transfer-
    syntax coverage), else the dependency-free :func:`_lite_parse`
    (explicit VR LE only). Tests inject synthetic parsers to exercise
    the plumbing independently of the codec.

    ``on_error``: ``"raise"`` fails the task on the first malformed
    file (strict, reference-faithful — ``src/generate_mapping.py``
    would crash the run too); ``"null"`` yields a row with the path
    and all-null tags instead, so ONE corrupt file cannot kill a
    whole-archive scan — the only sane default posture at 100 TB
    (callers filter ``sop_instance_uid IS NULL`` into a quarantine
    sink). Same pattern as the corrupt-record columns of the
    permissive-mode text sources.
    """
    if parse_fn is None:
        parse_fn = _pydicom_parse if HAS_PYDICOM else _lite_parse
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    path_cols = {"patient_id", "study_date"} & set(files.columns)

    def parse_one(p: str, c: bytes) -> dict:
        if on_error == "raise":
            return parse_fn(p, c)
        try:
            return parse_fn(p, c)
        except Exception:
            return {k: None for k in _META_FIELDS} | {"path": p}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_one(p, c) for p, c in zip(pdf["path"], pdf["content"])]
            out = pd.DataFrame(parsed)
            for c in path_cols:
                out[c] = pdf[c].values
            yield out

    return files.mapInPandas(batches, schema=DICOM_META_SCHEMA)
