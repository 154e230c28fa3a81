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

pydicom is not installed in this container → the decode body is gated;
the plumbing (scan, path parsing, batch iterator, output schema) is
real and tested with synthetic bytes via ``parse_fn`` injection.
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


def extract_metadata(
    files: DataFrame,
    parse_fn: Callable[[str, bytes], dict] | None = None,
) -> DataFrame:
    """S5: Arrow-batched metadata extraction over (path, content).

    ``parse_fn`` defaults to the pydicom header parse (requires pydicom;
    raises NotImplementedError otherwise). Tests inject a synthetic
    parser to exercise the plumbing without the codec.
    """
    if parse_fn is None:
        if not HAS_PYDICOM:
            raise NotImplementedError(
                "pydicom not available in this environment; pass parse_fn= for synthetic data"
            )
        parse_fn = _pydicom_parse

    path_cols = {"patient_id", "study_date"} & set(files.columns)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_fn(p, c) for p, c in zip(pdf["path"], pdf["content"])]
            out = pd.DataFrame(parsed)
            for c in path_cols:
                out[c] = pdf[c].values
            yield out

    return files.mapInPandas(batches, schema=DICOM_META_SCHEMA)
