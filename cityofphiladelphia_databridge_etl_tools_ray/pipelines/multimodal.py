"""Multimodal pipelines over the ``documents`` table.

The container has no media libraries and the testdata has no real
media, so payloads are derived deterministically from the text bytes
(``attach_fake_payload``) and "decoded" by the sha256-based
``FakeCodec`` — every byte of the Ray-side plumbing (binary columns,
actor pools, byte-bounded batches, schema contracts) is real and
oracle-checked; only the codec call is a stub (see
stages/multimodal.py).
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.multimodal import (
    DEFAULT_MM_BATCH,
    DecodeAudioMeta,
    DecodeImageMeta,
    ExtractImageFeatures,
    SampleVideoFrames,
    attach_fake_payload,
)

FRAME_EVERY_N = 10
FEATURE_DIM = 64


def _payload_ds(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: attach_fake_payload(b, from_col="text", id_col="doc_id"),
        batch_format="pyarrow",
    )


def multimodal_image_meta(sf_dir: str):
    """binary payload → typed image metadata via an actor-pool decode
    stage (codec built once per actor)."""
    return _payload_ds(sf_dir).map_batches(
        DecodeImageMeta,
        fn_constructor_kwargs={"payload_col": "payload", "id_col": "doc_id"},
        batch_format="pyarrow",
        batch_size=DEFAULT_MM_BATCH,
        concurrency=(1, 4),
    )


def multimodal_audio_meta(sf_dir: str):
    """binary payload → typed audio metadata (sample rate, channels,
    exact duration) via the actor-pool decode stage."""
    return _payload_ds(sf_dir).map_batches(
        DecodeAudioMeta,
        fn_constructor_kwargs={"payload_col": "payload", "id_col": "doc_id"},
        batch_format="pyarrow",
        batch_size=DEFAULT_MM_BATCH,
        concurrency=(1, 4),
    )


def multimodal_frame_sample(sf_dir: str):
    """binary payload → one row per sampled frame (video sampling)."""
    return _payload_ds(sf_dir).map_batches(
        SampleVideoFrames,
        fn_constructor_kwargs={
            "every_n": FRAME_EVERY_N,
            "payload_col": "payload",
            "id_col": "doc_id",
        },
        batch_format="pyarrow",
        batch_size=DEFAULT_MM_BATCH,
        concurrency=(1, 4),
    )


def multimodal_image_features(sf_dir: str):
    """binary payload → fixed-dim float32 embedding column (batched
    model-inference shape; deterministic fake model), summarized to
    integer scalar columns (dim, ssq_x4 = Σ(f_j·256)² — exact because
    the fake features are half-integers over 128, see
    FakeCodec.image_features) so the driver oracle checks every VALUE
    against the sha256-hex reconstruction in SQL — the raw vector
    column is exercised by tests/test_multimodal.py."""
    import numpy as np

    ds = _payload_ds(sf_dir).map_batches(
        ExtractImageFeatures,
        fn_constructor_kwargs={
            "dim": FEATURE_DIM,
            "payload_col": "payload",
            "id_col": "doc_id",
        },
        batch_format="pyarrow",
        batch_size=DEFAULT_MM_BATCH,
        concurrency=(1, 4),
    )

    def summarize(b: pa.Table) -> pa.Table:
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = np.asarray(emb.values, dtype=np.float32).reshape(len(b), -1)
        q = np.rint(mat.astype(np.float64) * 256.0).astype(np.int64)  # exact: f·256 ∈ odd ints
        return pa.table(
            {
                "media_id": b.column("media_id"),
                "dim": pa.array(np.full(len(b), mat.shape[1], np.int32)),
                "ssq_x4": pa.array((q * q).sum(axis=1)),
            }
        )

    return ds.map_batches(summarize, batch_format="pyarrow")
