"""Publish sinks beyond the Parquet lake.

``write_csv_gzip`` is the OpenData-upload analog (reference
databridge_etl_tools/opendata/opendata.py:68-75, 249-263: transform →
final CSV → gzip level 7 → put under the opendata bucket).  Ray
shape: a ``map_batches`` sink stage — each task serializes its block
to CSV, gzips at the reference's level 7, and writes a content-hash
named part file (idempotent under task retry: a retried block
rewrites identical bytes at the identical path).  The stage emits one
manifest row per part so the consuming pipeline can verify counts —
the reference's ``verify_count`` step (carto/carto_.py:363-384).

Output is a DIRECTORY of ``part-<sha12>.csv.gz`` files (resumable,
never one giant file).  Every part carries its own header row, so
consumers read the parts as independent CSV files — which is exactly
what pandas/DuckDB glob reads do.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os

import pyarrow as pa
import pyarrow.csv as pacsv

from ..functions.retry import retry_call

GZIP_LEVEL = 7  # reference: opendata/opendata.py:70


class CsvGzipWriter:
    """Per-block gzip-CSV part writer (map_batches sink stage)."""

    def __init__(self, out_dir: str, *, level: int = GZIP_LEVEL, retry_tries: int = 5, retry_sleep=None):
        self.out_dir = out_dir
        self.level = level
        # the put-to-bucket analog gets the reference's upload retry
        # budget (ago/ago.py:716-931 sniffs-and-retries its edits);
        # retrying OSError covers transient FS/object-store hiccups and
        # the write is idempotent (content-hash name, tmp+rename)
        self.retry_tries = retry_tries
        self.retry_sleep = retry_sleep
        os.makedirs(out_dir, exist_ok=True)

    def _put(self, path: str, data: bytes) -> None:
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        buf = io.BytesIO()
        pacsv.write_csv(batch, buf)
        raw = buf.getvalue()
        data = gzip.compress(raw, compresslevel=self.level, mtime=0)  # deterministic
        sha = hashlib.sha256(data).hexdigest()[:12]
        path = os.path.join(self.out_dir, f"part-{sha}.csv.gz")
        if not os.path.exists(path):  # idempotent under retry
            kw = {"tries": self.retry_tries, "retry_on": (OSError,)}
            if self.retry_sleep is not None:
                kw["sleep"] = self.retry_sleep
            retry_call(self._put, path, data, **kw)
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "rows": pa.array([len(batch)], pa.int64()),
                "bytes_gz": pa.array([len(data)], pa.int64()),
                "bytes_raw": pa.array([len(raw)], pa.int64()),
            }
        )


def write_csv_gzip(ds, out_dir: str, *, level: int = GZIP_LEVEL):
    """Publish a Dataset as gzip CSV parts; returns the per-part
    manifest DataFrame (small — one row per block)."""
    return ds.map_batches(
        CsvGzipWriter,
        fn_constructor_kwargs={"out_dir": out_dir, "level": level},
        batch_format="pyarrow",
        concurrency=(2, 8),
    ).to_pandas()
