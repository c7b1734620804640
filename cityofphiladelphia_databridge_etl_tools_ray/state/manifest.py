"""Per-partition manifests — the exactly-once commit unit.

Generalizes two reference protocols:
- the Carto build-aside / verify / atomic-rename-swap publish
  (reference carto/carto_.py:422-436, 471-490);
- the Oracle SCN watermark history table with RUNNING→FINISHED
  status rows (reference db2/db2.py:596-655).

A partition's state is whatever its ``manifest.json`` pointer
resolves to.  Data files are written first (atomic object write),
the manifest pointer last; a crash between the two leaves orphan data
files (cleaned by ``TranscriptLake.vacuum``) but never a torn table.
Replaying an LSN range at or below ``high_lsn`` is a no-op, which is
what makes task retries and checkpoint resume idempotent.

Storage-agnostic: pointer semantics come from ``state/fs.py`` —
``os.replace`` rename-swap on POSIX, a versioned-object commit log on
object stores (no rename anywhere on that path).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field, asdict

_POSIX = None


def _default_store():
    """Lazy POSIX backend for legacy path-only calls."""
    global _POSIX
    if _POSIX is None:
        from .fs import PosixStorage

        _POSIX = PosixStorage("/")
    return _POSIX


def write_json_atomic(path: str, obj: dict) -> None:
    """tmp-write + fsync + ``os.replace`` — the rename swap (POSIX
    paths only; storage-routed callers use ``store.put_json``)."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".manifest-", suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


@dataclass
class PartitionManifest:
    partition_id: int
    high_lsn: int                 # watermark: max lsn applied (-1 = empty)
    files: list[dict] = field(default_factory=list)  # {path, rows, sha256}
    row_count: int = 0
    schema_json: str = ""         # serialized Arrow schema (b64 of IPC)
    lineage: list[dict] = field(default_factory=list)  # one record per commit:
    #   {lsn_lo, lsn_hi, events_applied, rows_before, rows_after, merge_sec, events_per_sec}

    def to_json(self) -> dict:
        return asdict(self)

    @classmethod
    def from_json(cls, obj: dict) -> "PartitionManifest":
        return cls(**obj)

    @classmethod
    def load(cls, path: str, store=None) -> "PartitionManifest | None":
        """Resolve the manifest POINTER at ``path`` (None if absent).
        ``store`` selects the storage backend; omitted = POSIX."""
        obj = (store or _default_store()).get_json(path, pointer=True)
        return None if obj is None else cls.from_json(obj)

    def save(self, path: str, store=None) -> None:
        (store or _default_store()).put_json(path, self.to_json(), pointer=True)
