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
"""

from __future__ import annotations

import os
import re

_LSN_RANGE = re.compile(r"lsn-(\d+)-(\d+)\.parquet$")


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
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
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
    return ray.data.read_parquet(paths, columns=columns, filter=flt)
