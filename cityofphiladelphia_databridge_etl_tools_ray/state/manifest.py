"""Per-partition manifests — the exactly-once commit unit.

Generalizes two reference protocols:
- the Carto build-aside / verify / atomic-rename-swap publish
  (reference carto/carto_.py:422-436, 471-490);
- the Oracle SCN watermark history table with RUNNING→FINISHED
  status rows (reference db2/db2.py:596-655).

A partition's state is whatever its ``manifest.json`` points at.
Data files are written first (temp name → atomic ``os.replace``),
the manifest last; a crash between the two leaves orphan data files
(cleaned by ``TranscriptLake.vacuum``) but never a torn table.
Replaying an LSN range at or below ``high_lsn`` is a no-op, which is
what makes task retries and checkpoint resume idempotent.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field, asdict


def write_json_atomic(path: str, obj: dict) -> None:
    """tmp-write + fsync + ``os.replace`` — the rename swap."""
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
    def load(cls, path: str) -> "PartitionManifest | None":
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return cls.from_json(json.load(f))

    def save(self, path: str) -> None:
        write_json_atomic(path, self.to_json())
