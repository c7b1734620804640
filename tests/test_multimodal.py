"""Multimodal stage tests: the Ray plumbing (schemas, actor batching,
determinism) is real even though the codec is a deterministic fake —
FIXTURES.md §multimodal; reference analog: typed sidecar travelling
with opaque payloads (databridge_etl_tools/postgres/postgres.py:146-201)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.stages.multimodal import (
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
