"""Multimodal columns: opaque binary payloads + typed metadata.

Model (SURVEY.md §2.6, templated on the DICOM source S5,
reference src/generate_mapping.py:116-140): media travels as a
``binary`` column with a metadata struct beside it; decode / feature
extraction runs as Arrow-batched pandas iterators (``mapInPandas``),
never row-at-a-time Python.

The container ships no image/audio codecs, so the real decoders are
stubbed: ``decode_image``/``decode_audio`` raise NotImplementedError
unless PIL/soundfile are importable, and the tested path uses
``fake_probe`` — a deterministic pure-bytes "decoder" exercising the
exact plumbing (schema, Arrow batching, partition mapping) the real one
would use.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoders only if libs exist (not in this container)
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

PROBE_SCHEMA = (
    "doc_id bigint, byte_len int, content_md5 string, fake_width int, fake_height int, n_frames int"
)


def decode_image(payload: bytes) -> Any:
    """Decode an image payload. STUB: requires PIL, absent here."""
    if not _HAS_PIL:
        raise NotImplementedError("image decode needs PIL; not available in this environment")
    import io

    return Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes) -> Any:
    """Decode an audio payload. STUB: no audio codec in this environment."""
    raise NotImplementedError("audio decode needs soundfile/librosa; not available")


def fake_probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decoder: derives metadata purely from the
    bytes so the DuckDB oracle can recompute it. Runs per Arrow batch —
    this is the shape a real decoder plugs into (swap the body, keep the
    signature, schema and partitioning).
    """
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        byte_len = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len.astype("int32"),
                "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "fake_width": (byte_len % 640 + 1).astype("int32"),
                "fake_height": (byte_len % 480 + 1).astype("int32"),
                "n_frames": byte_len.map(lambda n: min(n // 100 + 1, 8)).astype("int32"),
            }
        )


def probe_binary(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """binary column → metadata DataFrame via Arrow-batched mapInPandas."""
    narrowed = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return narrowed.mapInPandas(fake_probe_batches, schema=PROBE_SCHEMA)


def frame_sample_plan(df: DataFrame, n_frames_col: str = "n_frames", stride: int = 2) -> DataFrame:
    """Frame-sampling plan: for each media row, the frame indices to
    decode (every ``stride``-th frame). Pure Column expression — the
    expensive decode happens later, only for planned frames.
    """
    return df.withColumn(
        "frame_indices",
        F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(stride)),
    )
