"""The partitioned Parquet transcripts lake.

Layout (one directory per hash partition — resumable output; a rerun
skips partitions whose manifest watermark already covers the replay
range)::

    <root>/lake.json                      # {num_partitions, schema}
    <root>/part-00000/manifest.json       # committed state pointer
    <root>/part-00000/data-<hilsn>-<sha8>.parquet
    ...

On a real cluster this root is shared storage (S3/NFS); in the
sandbox it's a local dir — the protocol (content-named files +
atomic manifest replace) is identical.  Partition count is FIXED at
creation and recorded in ``lake.json`` so the hash routing
(functions/hashing.py) stays aligned with file ownership across runs
— the analog of the reference's stable PK constraint.
"""

from __future__ import annotations

import base64
import hashlib
import io
import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import TRANSCRIPT_SCHEMA
from .manifest import PartitionManifest, write_json_atomic


def _schema_to_json(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def _schema_from_json(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


class TranscriptLake:
    def __init__(self, root: str):
        self.root = root
        meta_path = os.path.join(root, "lake.json")
        with open(meta_path) as f:
            meta = json.load(f)
        self.num_partitions: int = meta["num_partitions"]
        self.base_schema: pa.Schema = _schema_from_json(meta["schema"])

    # -- creation ----------------------------------------------------
    @classmethod
    def create(
        cls,
        root: str,
        num_partitions: int = 32,
        schema: pa.Schema = TRANSCRIPT_SCHEMA,
        exist_ok: bool = False,
    ) -> "TranscriptLake":
        meta_path = os.path.join(root, "lake.json")
        if os.path.exists(meta_path):
            if not exist_ok:
                raise FileExistsError(meta_path)
            return cls(root)
        os.makedirs(root, exist_ok=True)
        write_json_atomic(
            meta_path, {"num_partitions": num_partitions, "schema": _schema_to_json(schema)}
        )
        return cls(root)

    # -- partition access --------------------------------------------
    def part_dir(self, pid: int) -> str:
        return os.path.join(self.root, f"part-{pid:05d}")

    def _manifest_path(self, pid: int) -> str:
        return os.path.join(self.part_dir(pid), "manifest.json")

    def manifest(self, pid: int) -> PartitionManifest | None:
        return PartitionManifest.load(self._manifest_path(pid))

    def watermark(self, pid: int) -> int:
        m = self.manifest(pid)
        return m.high_lsn if m else -1

    def watermarks(self) -> dict[int, int]:
        return {p: self.watermark(p) for p in range(self.num_partitions)}

    def min_watermark(self) -> int:
        return min(self.watermarks().values())

    def read_partition(self, pid: int) -> pa.Table:
        m = self.manifest(pid)
        if m is None or not m.files:
            return self.base_schema.empty_table()
        schema = _schema_from_json(m.schema_json) if m.schema_json else None
        tables = [pq.read_table(os.path.join(self.part_dir(pid), f["path"])) for f in m.files]
        return pa.concat_tables(tables, promote_options="permissive") if len(tables) > 1 else tables[0]

    # -- commit (exactly-once unit) ----------------------------------
    def commit_partition(
        self,
        pid: int,
        table: pa.Table,
        high_lsn: int,
        lineage_record: dict | None = None,
    ) -> PartitionManifest:
        """Write ``table`` as the partition's new state.

        Idempotent under retry: the data file name is derived from
        (high_lsn, content sha) so a retried task overwrites the same
        bytes at the same path, and the manifest replace is atomic.
        """
        pdir = self.part_dir(pid)
        os.makedirs(pdir, exist_ok=True)
        buf = io.BytesIO()
        pq.write_table(table, buf, compression="zstd")
        data = buf.getvalue()
        sha = hashlib.sha256(data).hexdigest()
        fname = f"data-{high_lsn}-{sha[:12]}.parquet"
        fpath = os.path.join(pdir, fname)
        if not os.path.exists(fpath):
            fd, tmp = tempfile.mkstemp(dir=pdir, prefix=".data-", suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, fpath)

        prev = self.manifest(pid)
        lineage = (prev.lineage if prev else []) + ([lineage_record] if lineage_record else [])
        m = PartitionManifest(
            partition_id=pid,
            high_lsn=high_lsn,
            files=[{"path": fname, "rows": len(table), "sha256": sha}],
            row_count=len(table),
            schema_json=_schema_to_json(table.schema),
            lineage=lineage[-64:],  # bounded history
        )
        m.save(self._manifest_path(pid))
        return m

    # -- whole-lake views --------------------------------------------
    def data_files(self) -> list[str]:
        out = []
        for pid in range(self.num_partitions):
            m = self.manifest(pid)
            if m:
                out.extend(os.path.join(self.part_dir(pid), f["path"]) for f in m.files)
        return out

    def dataset(self):
        """Committed lake state as a streaming ``ray.data.Dataset``
        (reads only manifest-referenced files — orphans invisible)."""
        import ray.data

        files = self.data_files()
        if not files:
            return ray.data.from_arrow(self.base_schema.empty_table())
        return ray.data.read_parquet(files)

    def read_all(self) -> pa.Table:
        """Full lake as one Arrow table — small lakes / tests only."""
        tables = [self.read_partition(p) for p in range(self.num_partitions)]
        tables = [t for t in tables if len(t)]
        if not tables:
            return self.base_schema.empty_table()
        return pa.concat_tables(tables, promote_options="permissive")

    def total_rows(self) -> int:
        return sum((m.row_count if (m := self.manifest(p)) else 0) for p in range(self.num_partitions))

    def metrics(self) -> dict:
        """Aggregated lineage/lag metrics across partitions
        (north_rule: per-partition lineage + throughput/lag)."""
        per_part = {}
        for pid in range(self.num_partitions):
            m = self.manifest(pid)
            if m:
                per_part[pid] = {
                    "high_lsn": m.high_lsn,
                    "row_count": m.row_count,
                    "commits": len(m.lineage),
                    "events_applied": sum(r.get("events_applied", 0) for r in m.lineage),
                    "merge_sec": sum(r.get("merge_sec", 0.0) for r in m.lineage),
                }
        wms = [v["high_lsn"] for v in per_part.values()] or [-1]
        return {
            "partitions": per_part,
            "row_count": sum(v["row_count"] for v in per_part.values()),
            "min_watermark": min(wms),
            "max_watermark": max(wms),
            "watermark_lag": max(wms) - min(wms),  # skew indicator
        }

    def vacuum(self) -> list[str]:
        """Delete data files not referenced by any manifest (orphans
        from crashes between data write and manifest replace)."""
        removed = []
        for pid in range(self.num_partitions):
            pdir = self.part_dir(pid)
            if not os.path.isdir(pdir):
                continue
            m = self.manifest(pid)
            live = {f["path"] for f in m.files} if m else set()
            for name in os.listdir(pdir):
                if name.startswith("data-") and name.endswith(".parquet") and name not in live:
                    os.unlink(os.path.join(pdir, name))
                    removed.append(os.path.join(pdir, name))
        return removed
