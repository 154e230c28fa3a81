"""Dependency-free media header decoders: real PNG/JPEG/GIF/BMP/WAV
bytes in, dimensions/audio metadata out — no PIL, no codecs."""

from __future__ import annotations

import struct

from dbt_slabbing_spark.operators.multimodal import (
    detect_media_type,
    image_dimensions,
    synth_png,
    synth_wav,
    wav_metadata,
)


def _jpeg_bytes(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + APP0(JFIF) + SOF0 carrying the dimensions."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x03"
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0


def test_png_roundtrip():
    b = synth_png(321, 47)
    assert detect_media_type(b) == "png"
    assert image_dimensions(b) == (321, 47)


def test_jpeg_sof_scan():
    b = _jpeg_bytes(640, 480)
    assert detect_media_type(b) == "jpeg"
    assert image_dimensions(b) == (640, 480)


def test_jpeg_progressive_sof2():
    b = _jpeg_bytes(100, 50).replace(b"\xff\xc0", b"\xff\xc2")  # SOF2
    assert image_dimensions(b) == (100, 50)


def test_gif_and_bmp():
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 4
    assert detect_media_type(gif) == "gif"
    assert image_dimensions(gif) == (12, 34)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 77, -88) + b"\x00" * 8
    assert detect_media_type(bmp) == "bmp"
    assert image_dimensions(bmp) == (77, 88)  # negative height = top-down


def test_wav_metadata_roundtrip():
    b = synth_wav(8000, 1234, n_channels=2)
    assert detect_media_type(b) == "wav"
    meta = wav_metadata(b)
    assert meta == {
        "n_channels": 2,
        "sample_rate": 8000,
        "n_frames": 1234,
        "duration_ms": 1234 * 1000 // 8000,
    }


def test_garbage_yields_none():
    assert detect_media_type(b"not media") == "unknown"
    assert image_dimensions(b"not media") is None
    assert wav_metadata(b"not media") is None
    # truncated PNG: signature but no IHDR
    assert image_dimensions(b"\x89PNG\r\n\x1a\n") is None
    # JPEG with no SOF before EOF
    assert image_dimensions(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") is None


def test_media_probe_query_matches_oracle(spark, duck):
    from dbt_slabbing_spark.queries import registry
    from tests.canonical import assert_frames_match
    from tests.conftest import SF_SMOKE

    q = registry()["mm_decode_dimensions"]
    assert_frames_match(q.fn(spark, SF_SMOKE).toPandas(), duck.sql(q.oracle).df(), q.name)


def _tiff_bytes(width: int, height: int, little: bool = True) -> bytes:
    e = "<" if little else ">"
    head = (b"II*\x00" if little else b"MM\x00*") + struct.pack(e + "I", 8)
    entries = struct.pack(e + "H", 2)
    entries += struct.pack(e + "HHI", 256, 3, 1) + struct.pack(e + "H", width) + b"\x00\x00"
    entries += struct.pack(e + "HHI", 257, 4, 1) + struct.pack(e + "I", height)
    return head + entries + struct.pack(e + "I", 0)


def _mp4_bytes(timescale: int, duration: int) -> bytes:
    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    mvhd_body = b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", timescale, duration)
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def test_tiff_dimensions_both_endians():
    from dbt_slabbing_spark.operators.multimodal import image_dimensions

    le = _tiff_bytes(800, 600, little=True)
    be = _tiff_bytes(123, 456, little=False)
    assert detect_media_type(le) == "tiff" and detect_media_type(be) == "tiff"
    assert image_dimensions(le) == (800, 600)
    assert image_dimensions(be) == (123, 456)


def test_mp4_mvhd_duration():
    from dbt_slabbing_spark.operators.multimodal import mp4_metadata

    b = _mp4_bytes(timescale=1000, duration=5432)
    assert detect_media_type(b) == "mp4"
    assert mp4_metadata(b) == {"timescale": 1000, "duration": 5432, "duration_ms": 5432}
    # truncated / moov-less file yields None, not an exception
    assert mp4_metadata(b[:16]) is None


def test_jpeg_fill_bytes_and_eof_boundary():
    """ITU T.81 allows 0xFF fill bytes before a marker; a SOF ending
    exactly at EOF must also parse."""
    from dbt_slabbing_spark.operators.multimodal import image_dimensions

    b = _jpeg_bytes(320, 200)
    # inject a fill byte before the SOF marker (after APP0)
    padded = b[:20] + b"\xff" + b[20:]
    assert image_dimensions(padded) == (320, 200)
    # truncate to exactly the end of the SOF dimension bytes
    sof_at = b.index(b"\xff\xc0")
    exact_eof = b[: sof_at + 9]
    assert image_dimensions(exact_eof) == (320, 200)


def test_bmp_core_header_os2():
    """BITMAPCOREHEADER (12-byte DIB) stores u16 dims — must not be
    misread as the 40-byte header's i32 fields."""
    core = b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", 100, 50) + b"\x00" * 8
    assert detect_media_type(core) == "bmp"
    assert image_dimensions(core) == (100, 50)


def test_mp4_extended_size_and_to_eof_boxes():
    """size==1 boxes carry a 64-bit largesize (mandatory > 4 GiB; the
    common big-file mdat-before-moov layout); size==0 means to-EOF."""
    from dbt_slabbing_spark.operators.multimodal import mp4_metadata

    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    payload = b"\x00" * 32
    mdat_ext = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    mvhd_body = b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", 600, 1234)
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 0) + b"moov" + mvhd  # size 0 = to EOF
    meta = mp4_metadata(ftyp + mdat_ext + moov)
    assert meta == {"timescale": 600, "duration": 1234, "duration_ms": 1234 * 1000 // 600}


def test_zorder_key_bit_budget_guard():
    import pytest

    from pyspark.sql import functions as F
    from dbt_slabbing_spark.operators.layout import zorder_key

    with pytest.raises(ValueError, match="63-bit"):
        zorder_key([F.col(c) for c in "abcd"], bits=16)



def test_mp3_header_parse_and_id3_skip():
    """MPEG1 Layer III frame header behind an ID3v2 tag: rate index,
    bitrate index and channel mode decode; reserved combinations and
    truncations yield None."""
    from dbt_slabbing_spark.operators.multimodal import (
        detect_media_type,
        mp3_metadata,
        synth_mp3,
    )

    m = synth_mp3(44100, 128, mono=True)
    assert detect_media_type(m) == "mp3"
    assert mp3_metadata(m) == {"sample_rate": 44100, "n_channels": 1, "bitrate_kbps": 128}
    assert mp3_metadata(synth_mp3(48000, 320, mono=False)) == {
        "sample_rate": 48000,
        "n_channels": 2,
        "bitrate_kbps": 320,
    }
    # ID3 tag with nonzero syncsafe size: frame header sits after it
    tagged = b"ID3" + bytes([3, 0, 0, 0, 0, 0, 5]) + b"\x00" * 5 + synth_mp3(32000, 64)[10:]
    assert mp3_metadata(tagged)["sample_rate"] == 32000
    assert mp3_metadata(b"ID3") is None  # truncated tag
    assert mp3_metadata(b"\xff\xe0") is None  # truncated frame header


def test_ogg_vorbis_and_opus_identification():
    from dbt_slabbing_spark.operators.multimodal import (
        detect_media_type,
        ogg_metadata,
        synth_ogg_vorbis,
    )
    import struct as st

    o = synth_ogg_vorbis(48000, 2)
    assert detect_media_type(o) == "ogg"
    assert ogg_metadata(o) == {"sample_rate": 48000, "n_channels": 2}
    assert ogg_metadata(synth_ogg_vorbis(16000, 1)) == {"sample_rate": 16000, "n_channels": 1}
    # Opus identification header in the same page framing
    opus = b"OpusHead" + bytes([1, 2]) + b"\x00\x00" + st.pack("<I", 48000) + b"\x00\x00\x00"
    page = (
        b"OggS" + b"\x00" + b"\x02" + b"\x00" * 8
        + st.pack("<I", 1) + st.pack("<I", 0) + b"\x00" * 4
        + bytes([1, len(opus)]) + opus
    )
    assert ogg_metadata(page) == {"sample_rate": 48000, "n_channels": 2}
    assert ogg_metadata(b"OggS" + b"\x01" + b"\x00" * 30) is None  # bad version


def test_media_probe_covers_mp3_and_ogg(spark):
    """The mapInPandas probe fills audio columns for the new formats."""
    from dbt_slabbing_spark.operators.multimodal import (
        probe_media,
        synth_mp3,
        synth_ogg_vorbis,
    )

    rows = [(1, synth_mp3(44100, 128)), (2, synth_ogg_vorbis(48000, 2)), (3, b"garbage")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in probe_media(df).collect()}
    assert got[1]["media_type"] == "mp3" and got[1]["sample_rate"] == 44100
    assert got[2]["media_type"] == "ogg" and got[2]["n_channels"] == 2
    assert got[3]["media_type"] == "unknown" and got[3]["sample_rate"] is None


def test_header_decoders_fuzz_never_hang():
    """Byte-fuzz every header decoder with mutations/truncations of its
    own synthesized valid bytes: each probe must return or raise in
    bounded time — a corrupt length field must never turn a walker
    into an unbounded crawl (the DICOM lite parser had exactly this
    class of bug; see sources/dicom.py clamps)."""
    import signal

    from dbt_slabbing_spark.operators import multimodal as M

    class _Timeout(Exception):
        pass

    def _alarm(signum, frame):
        raise _Timeout()

    old = signal.signal(signal.SIGALRM, _alarm)
    try:
        samples = [
            M.synth_png(100, 50),
            M.synth_wav(44100, 100),
            M.synth_mp3(),
            M.synth_ogg_vorbis(),
            _mp4_bytes(1000, 5000),
        ]
        probes = (
            M.detect_media_type,
            M.image_dimensions,
            M.mp4_metadata,
            M.wav_metadata,
            M.mp3_metadata,
            M.ogg_metadata,
        )
        for base in samples:
            cases = [base[:c] for c in range(0, len(base), 7)]
            cases += [
                base[:i] + bytes([(base[i] + 131) % 256]) + base[i + 1 :]
                for i in range(0, len(base), 5)
            ]
            for data in cases:
                for fn in probes:
                    signal.alarm(3)
                    try:
                        fn(data)
                    except _Timeout:
                        raise AssertionError(f"{fn.__name__} hung on fuzzed bytes")
                    except Exception:
                        pass
                    finally:
                        signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)
