"""Multimodal stage tests: the Ray plumbing (schemas, actor batching,
determinism) is real even though the codec is a deterministic fake —
FIXTURES.md §multimodal; reference analog: typed sidecar travelling
with opaque payloads (databridge_etl_tools/postgres/postgres.py:146-201)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.stages.multimodal import (
    DecodeAudioMeta,
    DecodeImageMeta,
    ExtractImageFeatures,
    FakeCodec,
    SampleVideoFrames,
    attach_fake_payload,
)

PAYLOADS = [b"abc", b"x" * 5000, "naïve café".encode(), b"", b"\x00\xff" * 2048]


def batch(payloads=PAYLOADS):
    return pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def test_image_meta_deterministic_and_matches_hash():
    out = DecodeImageMeta()(batch())
    d = int.from_bytes(hashlib.sha256(b"abc").digest()[:8], "big")
    assert out.column("width")[0].as_py() == 64 + (d % 1920)
    assert out.column("height")[0].as_py() == 64 + ((d >> 16) % 1080)
    assert out.column("n_bytes")[1].as_py() == 5000
    again = DecodeImageMeta()(batch())
    assert out.equals(again)


def test_image_meta_batch_boundary_invariant():
    whole = DecodeImageMeta()(batch())
    parts = [DecodeImageMeta()(batch()[i : i + 2]) for i in range(0, 5, 2)]
    assert pa.concat_tables(parts).equals(whole)


def test_strict_mode_marks_real_codec_site():
    with pytest.raises(NotImplementedError):
        DecodeImageMeta(strict=True)(batch())
    with pytest.raises(NotImplementedError):
        ExtractImageFeatures(strict=True)(batch())
    with pytest.raises(NotImplementedError):
        SampleVideoFrames(strict=True)(batch())


def test_features_shape_and_determinism():
    stage = ExtractImageFeatures(dim=16)
    out = stage(batch())
    emb = out.column("embedding")
    assert len(out) == 5
    assert all(len(emb[i]) == 16 for i in range(5))
    # per-row determinism regardless of batch composition
    solo = ExtractImageFeatures(dim=16)(batch([b"x" * 5000]))
    np.testing.assert_array_equal(
        np.array(emb[1].as_py(), np.float32), np.array(solo.column("embedding")[0].as_py(), np.float32)
    )


def test_frame_sample_counts_and_offsets():
    out = SampleVideoFrames(every_n=10)(batch())
    df = out.to_pandas()
    # payload 1: 5000 bytes → 4 frames → sampled at 0 only (range(0,4,10))
    g1 = df[df.media_id == 1]
    assert list(g1.frame_idx) == [0] and list(g1.byte_offset) == [0]
    # payload 4: 4096 bytes → 4 frames → one sample
    g4 = df[df.media_id == 4]
    assert len(g4) == 1
    # empty payload still yields one frame (min 1)
    assert len(df[df.media_id == 3]) == 1


def test_attach_fake_payload_bytes_are_utf8_of_source():
    t = pa.table({"doc_id": pa.array([7], pa.int64()), "text": pa.array(["naïve"])})
    out = attach_fake_payload(t, from_col="text", id_col="doc_id")
    assert out.column("payload")[0].as_py() == "naïve".encode()


def test_fake_codec_digest_empty_and_null():
    c = FakeCodec()
    w, h, ch = c.image_meta(np.array([b"", None], dtype=object))
    assert len(w) == 2  # null payload → digest 0 path, no crash


# ---------------------------------------------------------------------------
# RealCodec golden files: strict=True now drives REAL stdlib decoders
# ---------------------------------------------------------------------------


def _golden_png(w=3, h=2, color_type=2, bitdepth=8):
    """Hand-assembled REAL PNG (zlib IDAT + crc32 chunks): decodable by
    any spec-compliant reader."""
    import struct
    import zlib

    def chunk(tag, payload):
        c = struct.pack(">I", len(payload)) + tag + payload
        return c + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, color_type, 0, 0, 0)
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = b"".join(b"\x00" + bytes(w * channels) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _golden_jpeg(w=640, h=480, ncomp=3):
    import struct

    sof0 = struct.pack(">BBHB", 8, 0, 0, 0)  # placeholder, rebuilt below
    seg = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp) + bytes(3 * ncomp)
    return b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + b"\xff\xc0" + seg + b"\xff\xd9"


def _golden_gif(w=12, h=34):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + bytes(6)


def _golden_bmp(w=7, h=5, bpp=24):
    import struct

    hdr = bytearray(54)
    hdr[0:2] = b"BM"
    struct.pack_into("<i", hdr, 18, w)
    struct.pack_into("<i", hdr, 22, -h)  # top-down negative height
    struct.pack_into("<H", hdr, 28, bpp)
    return bytes(hdr)


def _golden_wav(rate=8000, channels=2, frames=16):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(bytes(2 * channels * frames))
    return buf.getvalue()


def test_real_codec_image_golden_files():
    from cityofphiladelphia_databridge_etl_tools_ray.stages.multimodal import RealCodec

    c = RealCodec()
    payloads = np.array(
        [_golden_png(3, 2, 2), _golden_png(9, 4, 0), _golden_jpeg(640, 480, 3),
         _golden_gif(12, 34), _golden_bmp(7, 5, 24)],
        dtype=object,
    )
    w, h, ch = c.image_meta(payloads)
    assert list(w) == [3, 9, 640, 12, 7]
    assert list(h) == [2, 4, 480, 34, 5]
    assert list(ch) == [3, 1, 3, 3, 3]
    with pytest.raises(NotImplementedError):
        c.image_meta(np.array([b"not an image at all....."], dtype=object))


def test_real_codec_jpeg_fill_bytes_before_marker():
    """ITU T.81 §B.1.1.2 allows any number of 0xFF fill bytes before
    a marker byte; the scan must skip the padding run instead of
    misreading a pad byte as the start of a segment length (which
    skipped a bogus distance and missed the SOF)."""
    import struct

    from cityofphiladelphia_databridge_etl_tools_ray.stages.multimodal import RealCodec

    seg = struct.pack(">HBHHB", 8 + 9, 8, 480, 640, 3) + bytes(9)
    padded = (
        b"\xff\xd8"
        + b"\xff\xff\xff\xe0" + struct.pack(">H", 4) + b"JF"  # padded APP0
        + b"\xff\xff\xff\xff\xc0" + seg                        # padded SOF0
        + b"\xff\xd9"
    )
    w, h, ch = RealCodec()._image_one(padded)
    assert (w, h, ch) == (640, 480, 3)


def test_real_codec_wav_golden_file():
    from cityofphiladelphia_databridge_etl_tools_ray.stages.multimodal import RealCodec

    c = RealCodec()
    rate, ch, n = c.audio_meta(np.array([_golden_wav(8000, 2, 16)], dtype=object))
    assert list(rate) == [8000] and list(ch) == [2] and list(n) == [16]
    with pytest.raises(NotImplementedError):
        c.audio_meta(np.array([b"ID3\x03 not a wav"], dtype=object))


def test_strict_stage_decodes_real_payloads_in_actor_pool(ray_session):
    """The strict seam end-to-end: an actor-pool map_batches stage over
    REAL container bytes produces exact metadata (the 'strict path
    exercised in CI' criterion — the decoders are stdlib, always
    present)."""
    import ray.data

    rows = [
        {"media_id": 1, "payload": _golden_png(3, 2, 2)},
        {"media_id": 2, "payload": _golden_jpeg(640, 480, 3)},
        {"media_id": 3, "payload": _golden_gif(12, 34)},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = (
        ds.map_batches(
            DecodeImageMeta,
            fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow",
            concurrency=2,
            batch_size=2,
        )
        .to_pandas()
        .sort_values("media_id")
    )
    assert list(out["width"]) == [3, 640, 12]
    assert list(out["height"]) == [2, 480, 34]
    assert list(out["channels"]) == [3, 3, 3]

    audio = [{"media_id": 9, "payload": _golden_wav(44100, 1, 441)}]
    got = (
        ray.data.from_arrow(pa.Table.from_pylist(audio))
        .map_batches(
            DecodeAudioMeta,
            fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert got.loc[0, "sample_rate"] == 44100
    assert got.loc[0, "n_samples"] == 441
    assert got.loc[0, "duration_ms"] == 10


def test_real_codec_optional_lib_dispatch(monkeypatch):
    """When PIL / soundfile import cleanly the RealCodec must use them
    for EXTENSION containers the stdlib parsers reject — and must NOT
    consult them for the four stdlib image formats or WAV, so the
    pinned golden values (and driver oracles) cannot move in an
    environment that has the libs installed.  The libs are absent in
    this sandbox, so fake modules prove the dispatch."""
    import sys
    import types

    from cityofphiladelphia_databridge_etl_tools_ray.stages import multimodal as mm

    calls = {"pil": 0, "sf": 0}

    class _FakeImg:
        size = (111, 222)

        def getbands(self):
            return ("R", "G", "B", "A")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_pil_image = types.SimpleNamespace(
        open=lambda buf: (calls.__setitem__("pil", calls["pil"] + 1), _FakeImg())[1]
    )
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_pil_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(
        sys.modules, "PIL.Image", types.ModuleType("PIL.Image")
    )

    class _FakeSound:
        samplerate = 48000
        channels = 2

        def __init__(self, buf):
            calls["sf"] += 1

        def __len__(self):
            return 96000

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_sf = types.ModuleType("soundfile")
    fake_sf.SoundFile = _FakeSound
    monkeypatch.setitem(sys.modules, "soundfile", fake_sf)

    c = mm.RealCodec()
    assert c._pil is not None and c._sf is not None

    # extension containers route to the libs
    tiff = b"II*\x00" + bytes(64)  # little-endian TIFF magic
    assert c._image_one(tiff) == (111, 222, 4)
    assert calls["pil"] == 1
    flac = b"fLaC" + bytes(64)
    assert c._audio_one(flac) == (48000, 2, 96000)
    assert calls["sf"] == 1

    # stdlib containers NEVER consult the libs — goldens are PIL-proof
    w, h, ch = c._image_one(_golden_png(3, 2, 2))
    assert (w, h, ch) == (3, 2, 3)
    assert c._image_one(_golden_gif(12, 34)) == (12, 34, 3)
    rate, nch, frames = c._audio_one(_golden_wav(8000, 2, 16))
    assert (rate, nch, frames) == (8000, 2, 16)
    assert calls["pil"] == 1 and calls["sf"] == 1


def test_real_codec_without_optional_libs_unchanged():
    """Absent the optional libs (this sandbox), extension containers
    still raise at the documented seam and the goldens hold."""
    from cityofphiladelphia_databridge_etl_tools_ray.stages.multimodal import RealCodec

    c = RealCodec()
    assert c._pil is None and c._sf is None
    with pytest.raises(NotImplementedError):
        c._image_one(b"II*\x00" + bytes(64))
    with pytest.raises(NotImplementedError):
        c._audio_one(b"fLaC" + bytes(64))
