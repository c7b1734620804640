"""Multimodal (image / audio / video) column stages.

Payloads are opaque ``binary`` cells travelling next to typed
metadata columns — the engine treats them exactly like the transcript
``text`` payload: bytes that must be partitioned, batched and moved,
never interpreted row-by-row in Python.  Each stage separates:

- the **Ray plumbing** (real, tested): schema contracts, actor-pool
  ``map_batches`` stages with codec state built once per actor,
  byte-budgeted ``batch_size`` so payload × concurrency fits worker
  heaps, zero-copy Arrow in/out, deterministic outputs;
- the **real codec kernel** (``strict=True`` → :class:`RealCodec`):
  stdlib-only REAL container decoders — PNG/JPEG/GIF/BMP headers for
  image metadata, the ``wave`` module for WAV audio — golden-file
  tested; stages that genuinely need external systems (pixel-level
  feature extraction, video frame demux) raise
  ``NotImplementedError`` at the exact PIL/ffmpeg plug-in point; and
- the **deterministic fake** (default): ``FakeCodec`` derives
  metadata and "decoded" features as pure sha256 functions of the
  payload bytes, so synthetic-corpus pipelines are oracle-checkable
  and replay-stable.

Reference lineage: the reference ships opaque-blob columns through
typed sidecars the same way it ships geometry — EWKT strings with a
type map promoted at load (databridge_etl_tools/postgres/postgres.py:146-201);
its stateful per-worker transformer cache (ago/ago.py:347-354) is the
actor-pool ``__init__`` pattern used here.

Batch sizing: multimodal cells are KiB–MiB, so stages default to a
small ``batch_size`` (256 rows) and bounded actor pools; at 100 TB
the same stage runs with ``concurrency=(N, 4N)`` across nodes and the
object store streams/spills blocks between them.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: rows per multimodal batch — keep payload_bytes × batch × actors
#: bounded; override per call for very large cells.
DEFAULT_MM_BATCH = 256

IMAGE_META_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("channels", pa.int32()),
        pa.field("n_bytes", pa.int64()),
    ]
)


class FakeCodec:
    """Deterministic stand-in for an image/audio/video codec.

    All outputs are pure functions of the payload bytes (sha256-based),
    so pipelines are testable and replay-stable.  Pass ``strict=True``
    to get ``NotImplementedError`` at the exact call sites where a real
    decoder (PIL / libsndfile / ffmpeg) plugs in.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _digests(self, payloads: np.ndarray) -> np.ndarray:
        # one sha256 per cell — the deterministic seed for every fake
        # property below (cheap relative to a real decode).
        return np.fromiter(
            (int.from_bytes(hashlib.sha256(p).digest()[:8], "big") if p is not None else 0
             for p in payloads),
            dtype=np.uint64,
            count=len(payloads),
        )

    def image_meta(self, payloads: np.ndarray):
        """(width, height, channels) per payload."""
        if self.strict:
            raise NotImplementedError("real image decode requires PIL/libjpeg")
        d = self._digests(payloads)
        width = (64 + (d % 1920)).astype(np.int32)
        height = (64 + ((d >> 16) % 1080)).astype(np.int32)
        channels = np.where((d >> 32) % 10 == 0, 1, 3).astype(np.int32)
        return width, height, channels

    def audio_meta(self, payloads: np.ndarray):
        """(sample_rate, channels, n_samples) per payload."""
        if self.strict:
            raise NotImplementedError("real audio decode requires libsndfile/ffmpeg")
        d = self._digests(payloads)
        rates = np.array([16000, 22050, 44100, 48000], np.int64)
        sample_rate = rates[(d % 4).astype(np.int64)]
        channels = (1 + ((d >> 8) % 2)).astype(np.int32)
        secs = (1 + ((d >> 24) % 30)).astype(np.int64)
        return sample_rate.astype(np.int32), channels, secs * sample_rate

    def image_features(self, payloads: np.ndarray, dim: int) -> np.ndarray:
        """(n, dim) float32 embedding per payload (fake but stable).

        SPEC (cross-engine reproducible so the driver oracle-checks a
        scalar summary, not just row counts): with b_0..b_31 the bytes
        of sha256(payload), ``f_j = (b_{j mod 32} - 127.5) / 128`` —
        every value is exact in float32 (a half-integer divided by a
        power of two), so integer summaries of the vector (e.g.
        ``sum((f_j·256)²)``) reproduce bit-exactly from the hex digest
        in SQL.  Rows depend only on their own payload → batch-size /
        replay invariant."""
        if self.strict:
            raise NotImplementedError("real feature extraction requires a vision model")
        digests = np.zeros((len(payloads), 32), np.uint8)
        for i, p in enumerate(payloads):
            if p is not None:
                digests[i] = np.frombuffer(hashlib.sha256(p).digest(), np.uint8)
        reps = -(-dim // 32)
        tiled = np.tile(digests, (1, reps))[:, :dim]
        return ((tiled.astype(np.float32) - 127.5) / 128.0).astype(np.float32)

    def frame_offsets(self, payloads: np.ndarray, every_n: int):
        """Per-payload list of fake frame byte offsets (video sampling)."""
        if self.strict:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        sizes = np.fromiter((len(p) if p is not None else 0 for p in payloads), np.int64)
        n_frames = np.maximum(sizes // 1024, 1)
        return [np.arange(0, n, every_n, dtype=np.int64) * 1024 for n in n_frames]


class RealCodec:
    """REAL (stdlib-only) media metadata decoders — what ``strict=True``
    now wires to instead of raising unconditionally:

    - images: PNG (IHDR), JPEG (SOF0/1/2 marker scan), GIF (logical
      screen descriptor), BMP (DIB header) — genuine container
      parsing, the same fields PIL's lazy ``Image.open`` reads;
    - audio: WAV via the stdlib ``wave`` module (rate, channels,
      frames).

    Header parsing is inherently per-file (a real libjpeg call is
    too); the per-row loop here is the decode kernel itself, not
    avoidable plumbing — batch sizes stay byte-budgeted around it.

    OPTIONAL third-party extension: when PIL (images) / soundfile
    (audio) import cleanly they decode the containers the stdlib
    parsers REJECT (TIFF/WebP…, FLAC/OGG…).  The stdlib parsers keep
    precedence for their four image containers and WAV so pinned
    golden values — and the driver oracles built on them — can never
    move underneath an environment that happens to have the libs
    installed.  Containers neither path handles, and the stages that
    genuinely need external systems (pixel-level features → a vision
    model, video frame demux → ffmpeg), still raise
    ``NotImplementedError`` at the exact plug-in point."""

    def __init__(self):
        try:  # optional — absent in this sandbox, used when deployed
            from PIL import Image as _pil_image

            self._pil = _pil_image
        except ImportError:
            self._pil = None
        try:
            import soundfile as _soundfile

            self._sf = _soundfile
        except ImportError:
            self._sf = None

    def _image_one(self, p: bytes) -> tuple[int, int, int]:
        import struct

        if p is None or len(p) < 16:
            raise NotImplementedError("not a recognized image container")
        if p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
            w, h = struct.unpack(">II", p[16:24])
            color_type = p[25]
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise NotImplementedError(f"PNG color type {color_type}")
            return w, h, channels
        if p[:2] == b"\xff\xd8":  # JPEG: scan markers to a SOF
            i = 2
            while i + 9 < len(p):
                if p[i] != 0xFF:
                    i += 1
                    continue
                # runs of 0xFF are legal fill before a marker byte
                # (ITU T.81 §B.1.1.2) — skip the padding, else a pad
                # byte is misread as a segment length
                while i + 9 < len(p) and p[i + 1] == 0xFF:
                    i += 1
                marker = p[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                    return w, h, p[i + 9]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                (seg_len,) = struct.unpack(">H", p[i + 2 : i + 4])
                i += 2 + seg_len
            raise NotImplementedError("JPEG without SOF marker")
        if p[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", p[6:10])
            return w, h, 3
        if p[:2] == b"BM" and len(p) >= 30:
            w, h = struct.unpack("<ii", p[18:26])
            (bpp,) = struct.unpack("<H", p[28:30])
            return w, abs(h), max(1, bpp // 8)
        if self._pil is not None:
            # extension containers only (TIFF/WebP/…): the four
            # stdlib-parsed formats never reach here, so their pinned
            # golden values are PIL-proof
            import io as _io

            try:
                with self._pil.open(_io.BytesIO(p)) as img:
                    w, h = img.size
                    return w, h, max(1, len(img.getbands()))
            except Exception:
                pass
        raise NotImplementedError(
            "real image decode for this container requires PIL/libjpeg"
        )

    def image_meta(self, payloads: np.ndarray):
        metas = [self._image_one(p) for p in payloads]
        return (
            np.array([m[0] for m in metas], np.int32),
            np.array([m[1] for m in metas], np.int32),
            np.array([m[2] for m in metas], np.int32),
        )

    def _audio_one(self, p: bytes) -> tuple[int, int, int]:
        import io as _io
        import wave

        if p is not None and p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            # stdlib keeps precedence for WAV — pinned goldens
            with wave.open(_io.BytesIO(p)) as w:
                return w.getframerate(), w.getnchannels(), w.getnframes()
        if p is not None and self._sf is not None:
            try:  # extension containers (FLAC/OGG/…)
                with self._sf.SoundFile(_io.BytesIO(p)) as f:
                    return f.samplerate, f.channels, len(f)
            except Exception:
                pass
        raise NotImplementedError(
            "real audio decode for this container requires libsndfile/ffmpeg"
        )

    def audio_meta(self, payloads: np.ndarray):
        metas = [self._audio_one(p) for p in payloads]
        rate = np.array([m[0] for m in metas], np.int64)
        ch = np.array([m[1] for m in metas], np.int32)
        n = np.array([m[2] for m in metas], np.int64)
        return rate.astype(np.int32), ch, n

    def image_features(self, payloads: np.ndarray, dim: int) -> np.ndarray:
        raise NotImplementedError("real feature extraction requires a vision model")

    def frame_offsets(self, payloads: np.ndarray, every_n: int):
        raise NotImplementedError("real frame sampling requires ffmpeg")


def _codec(strict: bool):
    """``strict=True`` → the REAL stdlib decoders (raising only where
    an external system is genuinely required); else the deterministic
    fake."""
    return RealCodec() if strict else FakeCodec()


def _payload_np(batch: pa.Table, col: str) -> np.ndarray:
    c = batch.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False)


class DecodeImageMeta:
    """Actor-pool stage: binary payload → typed image metadata.

    Usage::

        ds.map_batches(DecodeImageMeta, batch_size=DEFAULT_MM_BATCH,
                       concurrency=(2, 8), batch_format="pyarrow",
                       fn_constructor_kwargs={"payload_col": "payload"})
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 strict: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.codec = _codec(strict)  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _payload_np(batch, self.payload_col)
        w, h, c = self.codec.image_meta(payloads)
        sizes = pc.binary_length(batch.column(self.payload_col)).cast(pa.int64())
        return pa.table(
            {
                "media_id": batch.column(self.id_col).cast(pa.int64()),
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "channels": pa.array(c, pa.int32()),
                "n_bytes": sizes,
            }
        )


class DecodeAudioMeta:
    """Actor-pool stage: binary payload → typed audio metadata
    (sample rate, channels, sample count, exact duration) — the
    libsndfile/ffprobe seam, same contract as ``DecodeImageMeta``."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 strict: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.codec = _codec(strict)  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _payload_np(batch, self.payload_col)
        rate, ch, n_samples = self.codec.audio_meta(payloads)
        sizes = pc.binary_length(batch.column(self.payload_col)).cast(pa.int64())
        return pa.table(
            {
                "media_id": batch.column(self.id_col).cast(pa.int64()),
                "sample_rate": pa.array(rate, pa.int32()),
                "channels": pa.array(ch, pa.int32()),
                "n_samples": pa.array(n_samples, pa.int64()),
                "duration_ms": pa.array(n_samples * 1000 // rate.astype(np.int64), pa.int64()),
                "n_bytes": sizes,
            }
        )


class ExtractImageFeatures:
    """Actor-pool stage: binary payload → fixed-dim float32 embedding
    (list<float32> column).  The model handle loads once per actor."""

    def __init__(self, dim: int = 64, payload_col: str = "payload",
                 id_col: str = "media_id", strict: bool = False):
        self.dim = dim
        self.payload_col = payload_col
        self.id_col = id_col
        self.codec = _codec(strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = self.codec.image_features(_payload_np(batch, self.payload_col), self.dim)
        flat = pa.array(feats.reshape(-1))
        offsets = pa.array(np.arange(0, (len(batch) + 1) * self.dim, self.dim, dtype=np.int32))
        return pa.table(
            {
                "media_id": batch.column(self.id_col).cast(pa.int64()),
                "embedding": pa.ListArray.from_arrays(offsets, flat),
            }
        )


class SampleVideoFrames:
    """Actor-pool stage: one row per sampled frame —
    (media_id, frame_idx, byte_offset).  flat_map-style expansion done
    vectorized inside map_batches."""

    def __init__(self, every_n: int = 10, payload_col: str = "payload",
                 id_col: str = "media_id", strict: bool = False):
        self.every_n = every_n
        self.payload_col = payload_col
        self.id_col = id_col
        self.codec = _codec(strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs = self.codec.frame_offsets(_payload_np(batch, self.payload_col), self.every_n)
        counts = np.fromiter((len(o) for o in offs), np.int64, count=len(offs))
        ids = np.repeat(batch.column(self.id_col).cast(pa.int64()).to_numpy(), counts)
        frame_idx = np.concatenate([np.arange(len(o), dtype=np.int32) for o in offs]) if len(offs) else np.array([], np.int32)
        byte_off = np.concatenate(offs) if len(offs) else np.array([], np.int64)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "byte_offset": pa.array(byte_off, pa.int64()),
            }
        )


def attach_fake_payload(batch: pa.Table, *, from_col: str, id_col: str,
                        payload_col: str = "payload") -> pa.Table:
    """Derive a deterministic opaque binary payload from an existing
    column (test/bench substitute for reading real media files; at
    scale this is ``ray.data.read_binary_files`` or byte ranges out of
    tar/parquet blobs)."""
    src = batch.column(from_col).cast(pa.binary())
    return pa.table(
        {
            id_col: batch.column(id_col).cast(pa.int64()),
            payload_col: src,
        }
    )
