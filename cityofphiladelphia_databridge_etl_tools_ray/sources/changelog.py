"""Change-log (WAL/binlog tail) reader.

The reference's extract stage reads a full table snapshot from a DB
into a CSV (oracle/oracle.py:177-270); the engine's source instead
tails a directory of LSN-bucketed Parquet change files, pruning at
the read:

- **file-level pruning** by the lsn range encoded in the file name
  (``changes-<bucket>-lsn-<lo>-<hi>.parquet``, see
  datagen.write_change_log) — committed ranges are never even opened
  on resume;
- **row-group pruning + column projection** via
  ``ray.data.read_parquet(filter=..., columns=...)`` pushdown.

Segments come in two formats (datagen.write_change_log):

- ``.parquet`` — columnar-scan friendly; row-group pruning + column
  projection pushdown.
- ``.arrow`` — Arrow IPC with lz4 frames, the tail-optimized format:
  a WAL segment is written once and tailed once, so decode CPU (not
  scan compression) is what matters — IPC decode measures 3-6× faster
  than parquet on the same segments, and the replay's read stage is
  its single largest CPU consumer.  Decoded one segment per Ray task
  (the natural log-segment granularity), filtered after decode.
"""

from __future__ import annotations

import os
import re

_LSN_RANGE = re.compile(r"lsn-(\d+)-(\d+)\.(parquet|arrow)$")


def prune_files_by_lsn(paths: list[str], min_lsn_exclusive: int) -> list[str]:
    """Drop files whose encoded lsn range lies entirely at or below
    the watermark. Files without an encoded range are kept."""
    out = []
    for p in paths:
        m = _LSN_RANGE.search(os.path.basename(p))
        # file name encodes [lo, hi) → max lsn in file is hi-1
        if m and int(m.group(2)) - 1 <= min_lsn_exclusive:
            continue
        out.append(p)
    return out


def read_change_log(
    path: str | list[str],
    *,
    min_lsn_exclusive: int = -1,
    columns: list[str] | None = None,
):
    """Dataset of change events with lsn > ``min_lsn_exclusive``."""
    import pyarrow.compute as pc
    import ray.data

    if isinstance(path, str) and os.path.isdir(path):
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".parquet", ".arrow"))
        )
    elif isinstance(path, str):
        paths = [path]
    else:
        paths = list(path)
    if min_lsn_exclusive >= 0:
        paths = prune_files_by_lsn(paths, min_lsn_exclusive)
    if not paths:
        from ..schema import CHANGE_SCHEMA

        return ray.data.from_arrow(CHANGE_SCHEMA.empty_table())
    flt = (pc.field("lsn") > min_lsn_exclusive) if min_lsn_exclusive >= 0 else None
    pq_paths = [p for p in paths if p.endswith(".parquet")]
    ipc_paths = [p for p in paths if p.endswith(".arrow")]
    parts = []
    if pq_paths:
        parts.append(ray.data.read_parquet(pq_paths, columns=columns, filter=flt))
    if ipc_paths:
        parts.append(_read_ipc_segments(ipc_paths, columns=columns, min_lsn_exclusive=min_lsn_exclusive))
    ds = parts[0]
    for extra in parts[1:]:
        ds = ds.union(extra)
    return ds


def _read_ipc_segments(paths: list[str], *, columns, min_lsn_exclusive: int):
    """Arrow-IPC WAL segments as a Dataset: one decode task per
    segment file (streaming — segments enter the pipeline as their
    task runs, with normal backpressure)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    def decode(b: pa.Table) -> pa.Table:
        from pyarrow import feather

        tabs = []
        for p in b.column("path").to_pylist():
            t = feather.read_table(p, columns=columns)
            if min_lsn_exclusive >= 0:
                t = t.filter(pc.greater(t.column("lsn"), min_lsn_exclusive))
            tabs.append(t)
        return pa.concat_tables(tabs)

    items = ray.data.from_items(
        [{"path": p} for p in paths], override_num_blocks=len(paths)
    )
    return items.map_batches(decode, batch_format="pyarrow")
