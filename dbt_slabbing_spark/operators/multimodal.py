"""Multimodal columns: opaque binary payloads + typed metadata.

Model (SURVEY.md §2.6, templated on the DICOM source S5,
reference src/generate_mapping.py:116-140): media travels as a
``binary`` column with a metadata struct beside it; decode / feature
extraction runs as Arrow-batched pandas iterators (``mapInPandas``),
never row-at-a-time Python.

Header decoding is REAL and dependency-free: PNG (IHDR), JPEG (SOF
marker scan), GIF/BMP (fixed offsets) dimensions and WAV audio metadata
(stdlib ``wave``) are parsed from the bytes directly. Only full PIXEL
decoding remains gated (PIL / an audio codec, absent here) — at 100 TB
the header probe is the cheap pre-decode pruning pass anyway (plan
which frames/files to decode before paying for pixels).
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # full pixel decode only if PIL exists (not in this container)
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

PROBE_SCHEMA = (
    "doc_id bigint, byte_len int, content_md5 string, fake_width int, fake_height int, n_frames int"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG SOF markers that carry dimensions (C0-CF minus DHT/JPG-ext/DAC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def detect_media_type(payload: bytes) -> str:
    """Magic-byte sniff:
    'png' | 'jpeg' | 'gif' | 'bmp' | 'tiff' | 'wav' | 'mp4' | 'unknown'."""
    if payload.startswith(_PNG_SIG):
        return "png"
    if payload.startswith(b"\xff\xd8"):
        return "jpeg"
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload.startswith((b"II*\x00", b"MM\x00*")):
        return "tiff"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload.startswith(b"ID3") or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        return "mp3"
    if payload.startswith(b"OggS"):
        return "ogg"
    return "unknown"


def image_dimensions(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from image header bytes — pure Python, no codec.

    PNG: IHDR is the first chunk, width/height big-endian u32 at 16/20.
    JPEG: walk the marker segments to the first SOF, height/width
    big-endian u16 at +5/+7 into the segment.
    GIF: logical screen size, little-endian u16 at 6/8.
    BMP: BITMAPINFOHEADER, little-endian i32 at 18/22 (height may be
    negative for top-down rows — abs()).
    """
    kind = detect_media_type(payload)
    try:
        if kind == "png" and len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return (w, h)
        if kind == "jpeg":
            i = 2
            n = len(payload)
            while i + 9 <= n:
                if payload[i] != 0xFF:  # not at a marker: corrupt/scan data
                    return None
                # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may
                # precede a marker — skip pads, don't misread a length
                if payload[i + 1] == 0xFF:
                    i += 1
                    continue
                marker = payload[i + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                    i += 2  # standalone markers have no length field
                    continue
                seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return (w, h)
                i += 2 + seg_len
            return None
        if kind == "gif" and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return (w, h)
        if kind == "bmp" and len(payload) >= 26:
            (dib_size,) = struct.unpack("<I", payload[14:18])
            if dib_size == 12:  # BITMAPCOREHEADER (OS/2): u16 dims
                w16, h16 = struct.unpack("<HH", payload[18:22])
                return (w16, h16)
            w, h = struct.unpack("<ii", payload[18:26])
            return (w, abs(h))  # negative height = top-down rows
        if kind == "tiff":
            return _tiff_dimensions(payload)
    except struct.error:
        return None
    return None


def _tiff_dimensions(payload: bytes) -> tuple[int, int] | None:
    """Walk IFD0: tag 256 = ImageWidth, 257 = ImageLength; SHORT/LONG
    values ≤ 4 bytes are stored inline in the entry."""
    endian = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        return None
    (n_entries,) = struct.unpack(endian + "H", payload[ifd_off : ifd_off + 2])
    width = height = None
    for i in range(n_entries):
        e = ifd_off + 2 + i * 12
        if e + 12 > len(payload):
            break
        tag, typ, _cnt = struct.unpack(endian + "HHI", payload[e : e + 8])
        if typ == 3:  # SHORT
            (val,) = struct.unpack(endian + "H", payload[e + 8 : e + 10])
        elif typ == 4:  # LONG
            (val,) = struct.unpack(endian + "I", payload[e + 8 : e + 12])
        else:
            continue
        if tag == 256:
            width = val
        elif tag == 257:
            height = val
    return (width, height) if width is not None and height is not None else None


def mp4_metadata(payload: bytes) -> dict[str, int] | None:
    """{timescale, duration, duration_ms} from the moov/mvhd box —
    top-level box walk, no codec, no frame parsing."""
    if detect_media_type(payload) != "mp4":
        return None

    def find_box(buf: bytes, name: bytes) -> bytes | None:
        i = 0
        while i + 8 <= len(buf):
            (size,) = struct.unpack(">I", buf[i : i + 4])
            header = 8
            if size == 1:  # 64-bit extended size (mandatory > 4 GiB —
                # the common mdat-before-moov layout for big media)
                if i + 16 > len(buf):
                    return None
                (size,) = struct.unpack(">Q", buf[i + 8 : i + 16])
                header = 16
            elif size == 0:  # box extends to end of file
                size = len(buf) - i
            if size < header:
                return None
            if buf[i + 4 : i + 8] == name:
                return buf[i + header : i + size]
            i += size
        return None

    moov = find_box(payload, b"moov")
    if moov is None:
        return None
    mvhd = find_box(moov, b"mvhd")
    if mvhd is None or len(mvhd) < 20:
        return None
    version = mvhd[0]
    try:
        if version == 1:
            timescale, duration = struct.unpack(">IQ", mvhd[20:32])
        else:
            timescale, duration = struct.unpack(">II", mvhd[12:20])
    except struct.error:
        return None
    if not timescale:
        return None
    return {
        "timescale": timescale,
        "duration": duration,
        "duration_ms": int(duration * 1000 // timescale),
    }


def wav_metadata(payload: bytes) -> dict[str, int] | None:
    """{n_channels, sample_rate, n_frames, duration_ms} via stdlib wave."""
    if detect_media_type(payload) != "wav":
        return None
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as wf:
            rate = wf.getframerate()
            frames = wf.getnframes()
            return {
                "n_channels": wf.getnchannels(),
                "sample_rate": rate,
                "n_frames": frames,
                "duration_ms": int(frames * 1000 // rate) if rate else 0,
            }
    except (wave.Error, EOFError):
        return None


# MPEG1 Layer III bitrates (kbps) by header index; 0 = free, 15 = bad
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
# sample rates by (version_bits, rate_index); version 00=MPEG2.5 10=MPEG2 11=MPEG1
_MP3_RATES = {
    0b11: (44100, 48000, 32000),
    0b10: (22050, 24000, 16000),
    0b00: (11025, 12000, 8000),
}


def mp3_metadata(payload: bytes) -> dict[str, int] | None:
    """{sample_rate, bitrate_kbps, n_channels} from the first MPEG audio
    frame header (ISO 11172-3), skipping a leading ID3v2 tag (syncsafe
    28-bit size). Header-only — no frame payload is touched."""
    if detect_media_type(payload) != "mp3":
        return None
    i = 0
    if payload.startswith(b"ID3"):
        if len(payload) < 10:
            return None
        # syncsafe integer: 4 bytes, 7 bits each
        size = (
            (payload[6] & 0x7F) << 21
            | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7
            | (payload[9] & 0x7F)
        )
        i = 10 + size
    if i + 4 > len(payload):
        return None
    h = payload[i : i + 4]
    if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    version = (h[1] >> 3) & 0x03
    layer = (h[1] >> 1) & 0x03
    if version == 0b01 or layer == 0b00:  # reserved version / layer
        return None
    bitrate_idx = (h[2] >> 4) & 0x0F
    rate_idx = (h[2] >> 2) & 0x03
    if rate_idx == 3 or bitrate_idx in (0, 15):
        return None
    rates = _MP3_RATES.get(version)
    if rates is None:
        return None
    mode = (h[3] >> 6) & 0x03
    # bitrate table is exact only for MPEG1 Layer III (the synth target);
    # other version/layer combos still yield rate + channels
    bitrate = _MP3_BITRATES[bitrate_idx] if (version == 0b11 and layer == 0b01) else None
    out = {
        "sample_rate": rates[rate_idx],
        "n_channels": 1 if mode == 0b11 else 2,
    }
    if bitrate:
        out["bitrate_kbps"] = bitrate
    return out


def ogg_metadata(payload: bytes) -> dict[str, int] | None:
    """{sample_rate, n_channels} from the first OGG page's
    identification packet — Vorbis I header ('\\x01vorbis') or Opus
    ('OpusHead'). Page CRC is not verified (probe, not validator)."""
    if detect_media_type(payload) != "ogg" or len(payload) < 28:
        return None
    if payload[4] != 0:  # stream structure version
        return None
    nseg = payload[26]
    body = payload[27 + nseg :]
    try:
        if body.startswith(b"\x01vorbis") and len(body) >= 16:
            (channels,) = struct.unpack("<B", body[11:12])
            (rate,) = struct.unpack("<I", body[12:16])
            return {"sample_rate": rate, "n_channels": channels}
        if body.startswith(b"OpusHead") and len(body) >= 16:
            channels = body[9]
            (rate,) = struct.unpack("<I", body[12:16])
            return {"sample_rate": rate, "n_channels": channels}
    except struct.error:
        return None
    return None


def decode_image(payload: bytes) -> Any:
    """Full pixel decode — requires PIL (absent here); header-only
    probing never needs it (see :func:`image_dimensions`)."""
    if not _HAS_PIL:
        raise NotImplementedError("pixel decode needs PIL; header probe works without it")
    return Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes) -> Any:
    """Full sample decode. WAV works via stdlib ``wave`` (frames as raw
    bytes); compressed formats need a codec that is absent here."""
    if detect_media_type(payload) == "wav":
        import wave

        with wave.open(io.BytesIO(payload)) as wf:
            return wf.readframes(wf.getnframes())
    raise NotImplementedError("non-WAV audio decode needs soundfile/librosa; not available")


def synth_png(width: int, height: int) -> bytes:
    """A real minimal PNG: signature + IHDR (valid CRC) + IEND. Enough
    for any header-respecting parser to read dimensions."""
    import zlib

    ihdr_data = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    ihdr = struct.pack(">I", 13) + b"IHDR" + ihdr_data
    ihdr += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data) & 0xFFFFFFFF)
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    return _PNG_SIG + ihdr + iend


def synth_wav(sample_rate: int, n_frames: int, n_channels: int = 1) -> bytes:
    """A real PCM-16 WAV of silence, written by stdlib ``wave``."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(b"\x00\x00" * n_frames * n_channels)
    return buf.getvalue()


def synth_mp3(sample_rate: int = 44100, bitrate_kbps: int = 128, mono: bool = True) -> bytes:
    """A minimal-but-real MP3: empty ID3v2.3 tag + one MPEG1 Layer III
    frame header + zero payload. Header-respecting parsers read rate/
    bitrate/channels from it."""
    id3 = b"ID3" + bytes([3, 0, 0, 0, 0, 0, 0])  # v2.3, no flags, size 0
    rate_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    bitrate_idx = _MP3_BITRATES.index(bitrate_kbps)
    b1 = 0xFF
    b2 = 0xE0 | (0b11 << 3) | (0b01 << 1) | 0x01  # sync|MPEG1|LayerIII|no-CRC
    b3 = (bitrate_idx << 4) | (rate_idx << 2)
    b4 = (0b11 << 6) if mono else 0x00
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    return id3 + bytes([b1, b2, b3, b4]) + b"\x00" * max(frame_len - 4, 0)


def synth_ogg_vorbis(sample_rate: int = 48000, n_channels: int = 2) -> bytes:
    """A minimal OGG page carrying a Vorbis identification header.
    Page CRC is left zero — the probe reads structure, not checksums."""
    ident = (
        b"\x01vorbis"
        + struct.pack("<I", 0)  # vorbis_version
        + struct.pack("<B", n_channels)
        + struct.pack("<I", sample_rate)
        + struct.pack("<iii", -1, 128000, -1)  # bitrate max/nominal/min
        + b"\xb8"  # blocksizes
        + b"\x01"  # framing bit
    )
    page = (
        b"OggS"
        + b"\x00"  # version
        + b"\x02"  # header type: beginning of stream
        + b"\x00" * 8  # granule position
        + struct.pack("<I", 0xFEED)  # serial
        + struct.pack("<I", 0)  # page sequence
        + b"\x00" * 4  # CRC (unverified by the probe)
        + bytes([1, len(ident)])  # one segment
        + ident
    )
    return page


MEDIA_PROBE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "n_channels int, sample_rate int, duration_ms int"
)


def media_probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL header probe per Arrow batch: magic-byte sniff, then PNG/
    JPEG/GIF/BMP dimension parse or WAV metadata extraction — no codec
    libraries, no pixel decode. Unknown payloads yield nulls."""
    for pdf in batches:
        cols: dict[str, list] = {
            k: []
            for k in (
                "doc_id", "media_type", "width", "height",
                "n_channels", "sample_rate", "duration_ms",
            )
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            kind = detect_media_type(b)
            dims = image_dimensions(b)
            audio = wav_metadata(b) or mp3_metadata(b) or ogg_metadata(b) or {}
            cols["doc_id"].append(doc_id)
            cols["media_type"].append(kind)
            cols["width"].append(dims[0] if dims else None)
            cols["height"].append(dims[1] if dims else None)
            cols["n_channels"].append(audio.get("n_channels"))
            cols["sample_rate"].append(audio.get("sample_rate"))
            cols["duration_ms"].append(audio.get("duration_ms"))
        out = pd.DataFrame(cols)
        for c in ("width", "height", "n_channels", "sample_rate", "duration_ms"):
            out[c] = out[c].astype("Int32")
        yield out


def probe_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """binary media column → typed header metadata via mapInPandas."""
    narrowed = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return narrowed.mapInPandas(media_probe_batches, schema=MEDIA_PROBE_SCHEMA)


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


def resize_tile_plan(
    df: DataFrame,
    w_col: str = "width",
    h_col: str = "height",
    target: int = 224,
    tile: int = 224,
) -> DataFrame:
    """Shorter-side resize + tile-grid PLAN for an image batch: output
    dimensions for a resize that maps the shorter side to ``target``
    (integer floor arithmetic — cross-engine exact), the ``tile``-sized
    grid covering the output (ceil division), and the decoded byte
    budget (out_w x out_h x 3 RGB). This is the SCHEDULING half of an
    image-preprocessing stage: a 100 TB pipeline sizes its Arrow
    batches, memory budget and shuffle volume from THIS frame before
    any pixel is decoded (the pixel work itself is `decode_image`,
    dependency-gated in this container). Pure built-in integer
    expressions — stays in whole-stage codegen, no UDF.
    """
    from pyspark.sql import functions as F

    s = F.least(F.col(w_col), F.col(h_col))
    out_w = F.floor((F.col(w_col) * F.lit(target)) / s).cast("int")
    out_h = F.floor((F.col(h_col) * F.lit(target)) / s).cast("int")
    return (
        df.withColumn("out_w", out_w)
        .withColumn("out_h", out_h)
        .withColumn(
            "tiles_x",
            F.floor((F.col("out_w") + F.lit(tile - 1)) / F.lit(tile)).cast("int"),
        )
        .withColumn(
            "tiles_y",
            F.floor((F.col("out_h") + F.lit(tile - 1)) / F.lit(tile)).cast("int"),
        )
        .withColumn("n_tiles", (F.col("tiles_x") * F.col("tiles_y")).cast("int"))
        .withColumn(
            "out_bytes", (F.col("out_w").cast("bigint") * F.col("out_h") * 3)
        )
    )
