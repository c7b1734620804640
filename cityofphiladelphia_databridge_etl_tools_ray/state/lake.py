"""The partitioned Parquet transcripts lake.

Layout (one directory per hash partition — resumable output; a rerun
skips partitions whose manifest watermark already covers the replay
range)::

    <root>/lake.json                      # {num_partitions, schema}
    <root>/part-00000/manifest.json       # committed state pointer
    <root>/part-00000/data-<hilsn>-<sha8>.parquet
    ...

On a real cluster this root is SHARED storage; the backend rides in
the root string (state/fs.py): a plain path = POSIX (atomic manifest
replace), ``norename://`` / ``s3://`` = object-store protocol where
every pointer is a versioned-object commit log and NOTHING renames.
The content-named data files + pointer-last commit ordering are
identical on both.  Partition count is FIXED at creation and recorded
in ``lake.json`` so the hash routing (functions/hashing.py) stays
aligned with file ownership across runs — the analog of the
reference's stable PK constraint.
"""

from __future__ import annotations

import base64
import hashlib
import io

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import PRIMARY_KEY, TRANSCRIPT_SCHEMA, conform
from .fs import storage_for
from .manifest import PartitionManifest


def _column_stats(table: pa.Table) -> dict:
    """Zone-map statistics for a data file: ``{col: [min, max]}`` for
    every non-all-null numeric / temporal column (timestamps and dates
    recorded as epoch int64 so the JSON stays portable).  Computed on
    the already-in-memory table at commit time — one vectorized
    ``min_max`` per column, no extra I/O.  Strings/binary are skipped:
    hash partitioning scatters key strings, so their ranges never
    prune, and truncation-safe string bounds add complexity for
    nothing."""
    stats: dict[str, list] = {}
    if len(table) == 0:
        return stats
    for i, f in enumerate(table.schema):
        t = f.type
        if not (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_timestamp(t)
            or pa.types.is_date(t)
        ):
            continue
        col = table.column(i)
        if col.null_count == len(table):
            continue
        mm = pc.min_max(col)
        lo, hi = mm["min"], mm["max"]
        if pa.types.is_timestamp(t) or pa.types.is_date(t):
            lo, hi = lo.cast(pa.int64()), hi.cast(pa.int64())
        stats[f.name] = [lo.as_py(), hi.as_py()]
    return stats


def _stat_bound(v):
    """Normalize a scan bound to the zone-map domain: temporal values
    compare as epoch int64 (mirroring :func:`_column_stats`), numerics
    pass through."""
    import datetime

    import numpy as np

    if isinstance(v, np.datetime64):
        return int(v.astype("datetime64[us]").astype(np.int64))
    if isinstance(v, datetime.datetime):
        s = pa.scalar(v, pa.timestamp("us"))
        return s.cast(pa.int64()).as_py()
    if isinstance(v, datetime.date):
        return pa.scalar(v, pa.date32()).cast(pa.int64()).as_py()
    return v


def _pk_bloom_entry(table: pa.Table, pk0: str) -> dict | None:
    """LSM-style per-run primary-key Bloom filter, stored in the
    manifest entry: ~10 bits/key (FP ≈ 1%), sized to the run
    (2^10..2^22 bits) and zlib+base64'd so small runs cost ~100 bytes
    of JSON.  Lets :meth:`TranscriptLake.lookup_plan` short-circuit
    definite misses with ZERO data I/O — the standard LSM read-path
    optimization (and Parquet/Iceberg's column bloom analog).  Keys
    are the stable partition hash of ``pk0`` (functions/hashing.py),
    so any PK type works; tombstone keys are included (conservative).
    """
    import zlib

    if pk0 not in table.schema.names or len(table) == 0:
        return None
    from ..functions.hashing import stable_hash_any

    h = stable_hash_any(table.column(pk0)).view(np.int64)
    log2_bits = int(np.clip(np.ceil(np.log2(max(len(h), 1) * 10)), 10, 22))
    from ..functions.lookup import Int64Bloom

    bloom = Int64Bloom(log2_bits=log2_bits, k=4)
    bloom.add(h)
    packed = zlib.compress(bloom.words.tobytes(), 6)
    return {
        "log2_bits": log2_bits,
        "k": 4,
        "zb64": base64.b64encode(packed).decode(),
    }


def _bloom_maybe(entry: dict, hashes) -> bool:
    """True if ANY of the int64 key hashes may be present per the
    stored bloom (no false negatives)."""
    import zlib

    from ..functions.lookup import Int64Bloom

    words = np.frombuffer(
        zlib.decompress(base64.b64decode(entry["zb64"])), dtype=np.uint64
    ).copy()
    bloom = Int64Bloom(log2_bits=entry["log2_bits"], k=entry["k"], words=words)
    return bool(bloom.contains(hashes).any())


def _write_data_file(store, pdir: str, table: pa.Table, high_lsn: int) -> dict:
    """Content-named Parquet data file write (atomic object write —
    tmp + fsync + replace on POSIX, one whole-object PUT on object
    stores): idempotent under retry because the name derives from
    (high_lsn, content sha) — a re-run lands on the same path with the
    same bytes.  Returns the manifest file entry (with zone-map column
    stats for scan pruning)."""
    buf = io.BytesIO()
    pq.write_table(table, buf, compression="zstd")
    data = buf.getvalue()
    sha = hashlib.sha256(data).hexdigest()
    fname = f"data-{high_lsn}-{sha[:12]}.parquet"
    fpath = store.join(pdir, fname)
    if not store.exists(fpath):
        store.put_object(fpath, data)
    return {"path": fname, "rows": len(table), "sha256": sha, "stats": _column_stats(table)}


def _schema_to_json(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def _schema_from_json(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


class TranscriptLake:
    def __init__(self, root: str):
        self.root = root  # backend scheme travels in the string
        self.store, self.phys = storage_for(root)
        meta = self.store.get_json(
            self.store.join(self.phys, "lake.json"), pointer=True
        )
        if meta is None:
            raise FileNotFoundError(f"no lake at {root} (missing lake.json)")
        self.num_partitions: int = meta["num_partitions"]
        self.base_schema: pa.Schema = _schema_from_json(meta["schema"])
        # configurable per-lake primary key (reference --primary_key,
        # ago/ago_commands.py:41; catalog PKs _properties.py:88-101);
        # absent in pre-existing lake.json → transcripts default.
        self.primary_key: list[str] = list(meta.get("primary_key", PRIMARY_KEY))
        # metadata generation: bumped by each online rescale
        # (split/coalesce).  Partition manifests are generation-named,
        # so a rescale prepares the entire next-generation layout
        # invisibly and publishes it with ONE atomic lake.json replace
        # — the Iceberg metadata-pointer-swap idea applied to the
        # reference's rename-swap publish (carto/carto_.py:422-436).
        self.generation: int = int(meta.get("generation", 1))

    # -- creation ----------------------------------------------------
    @classmethod
    def create(
        cls,
        root: str,
        num_partitions: int = 32,
        schema: pa.Schema = TRANSCRIPT_SCHEMA,
        primary_key: list[str] | None = None,
        exist_ok: bool = False,
    ) -> "TranscriptLake":
        store, phys = storage_for(root)
        meta_path = store.join(phys, "lake.json")
        if store.pointer_exists(meta_path):
            if not exist_ok:
                raise FileExistsError(meta_path)
            return cls(root)
        pk = list(primary_key) if primary_key else list(PRIMARY_KEY)
        missing = [k for k in pk if k not in schema.names]
        if missing:
            raise ValueError(f"primary_key columns {missing} not in lake schema {schema.names}")
        store.ensure_dir(phys)
        store.put_json(
            meta_path,
            {
                "num_partitions": num_partitions,
                "schema": _schema_to_json(schema),
                "primary_key": pk,
                "generation": 1,
            },
            pointer=True,
        )
        return cls(root)

    # -- partition access --------------------------------------------
    def part_dir(self, pid: int) -> str:
        return self.store.join(self.phys, f"part-{pid:05d}")

    def _manifest_path(self, pid: int, generation: int | None = None) -> str:
        g = self.generation if generation is None else generation
        name = "manifest.json" if g == 1 else f"manifest-g{g}.json"
        return self.store.join(self.part_dir(pid), name)

    def manifest(self, pid: int) -> PartitionManifest | None:
        return PartitionManifest.load(self._manifest_path(pid), self.store)

    def watermark(self, pid: int) -> int:
        m = self.manifest(pid)
        return m.high_lsn if m else -1

    def watermarks(self) -> dict[int, int]:
        pids = range(self.num_partitions)
        if self.store.pa_filesystem is None:
            return {p: self.watermark(p) for p in pids}
        # object backend: a pointer read is a LIST + GET round trip;
        # N serial round trips on the driver would add N×latency to
        # every replay cycle — overlap them (I/O-bound, thread-safe
        # pyarrow filesystem)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, self.num_partitions)) as ex:
            wms = list(ex.map(self.watermark, pids))
        return dict(zip(pids, wms))

    def min_watermark(self) -> int:
        return min(self.watermarks().values())

    def read_partition(
        self,
        pid: int,
        *,
        resolve: bool = True,
        columns: list[str] | None = None,
        manifest: PartitionManifest | None = None,
    ) -> pa.Table:
        """Partition state.  With delta runs present, ``resolve=True``
        applies the LWW merge across runs (newest lsn wins, tombstones
        drop) — the read half of merge-on-read; ``resolve=False``
        returns the raw concatenation (op/lsn columns intact) for
        compaction and debugging.

        ``columns`` prunes at the parquet read (only the requested
        columns plus what resolution itself needs — the primary key,
        and op/lsn on delta runs — leave storage; resolution-only
        columns are dropped again before returning).  A requested
        column this partition predates (schema evolution) is absent
        from the result; :meth:`dataset` null-fills it against the
        lake-wide unified schema.

        ``manifest`` overrides the committed pointer — time-travel
        reads pass a snapshot's recorded manifest here (the files it
        references are retained by the snapshot-aware :meth:`vacuum`).
        """
        m = manifest if manifest is not None else self.manifest(pid)
        if m is None or not m.files:
            empty = self.base_schema.empty_table()
            if columns is not None:
                empty = empty.select([c for c in columns if c in empty.schema.names])
            return empty
        want_base = (
            None
            if columns is None
            else list(dict.fromkeys([*self.primary_key, *columns]))
        )
        base_tbls, delta_tbls = [], []
        for f in m.files:
            path = self.store.join(self.part_dir(pid), f["path"])
            if want_base is None:
                t = self.store.read_table(path)
            else:
                want = want_base + (["op", "lsn"] if f.get("kind") == "delta" else [])
                names = set(self.store.read_parquet_schema(path).names)
                t = self.store.read_table(path, columns=[c for c in want if c in names])
            (delta_tbls if f.get("kind") == "delta" else base_tbls).append(t)
        def project(t: pa.Table) -> pa.Table:
            if columns is None:
                return t
            return t.select([c for c in columns if c in t.schema.names])

        if not delta_tbls:
            return project(
                base_tbls[0]
                if len(base_tbls) == 1
                else pa.concat_tables(base_tbls, promote_options="permissive")
            )
        deltas = (
            delta_tbls[0]
            if len(delta_tbls) == 1
            else pa.concat_tables(delta_tbls, promote_options="permissive")
        )
        base = (
            None
            if not base_tbls
            else (base_tbls[0] if len(base_tbls) == 1 else pa.concat_tables(base_tbls, promote_options="permissive"))
        )
        if not resolve:
            # raw runs keep op/lsn — they ARE the request here
            return deltas if base is None else pa.concat_tables(
                [base, deltas], promote_options="permissive"
            )
        from ..stages.merge import merge_partition

        return project(merge_partition(base, deltas, keys=self.primary_key))

    def run_count(self, pid: int) -> int:
        m = self.manifest(pid)
        return len(m.files) if m else 0

    # -- commit (exactly-once unit) ----------------------------------
    def commit_partition(
        self,
        pid: int,
        table: pa.Table,
        high_lsn: int,
        lineage_record: dict | None = None,
        mode: str = "replace",
        txn: str | None = None,
    ) -> PartitionManifest:
        """Write ``table`` as the partition's new state.

        ``mode="replace"``: ``table`` is the fully-merged payload and
        becomes the single base run (copy-on-write, O(partition)).
        ``mode="delta"``: ``table`` is a key-sorted run of change rows
        (op + lsn + payload, tombstones INCLUDED) appended to the run
        list — O(batch) commit; reads resolve via merge-on-read and
        :meth:`compact_partition` folds runs back into one base.

        Idempotent under retry: the data file name is derived from
        (high_lsn, content sha) so a retried task overwrites the same
        bytes at the same path, and the manifest replace is atomic.

        ``txn`` STAGES the commit instead of publishing it: the
        manifest lands at ``<current>.txn-<id>`` — a write-once OBJECT
        invisible to every reader — until :meth:`publish_txn` flips it
        into the pointer (or :meth:`abort_txn` discards it).  One
        staged commit per partition per txn; the cross-table commit
        point is the transaction record (state/txn.py), not any single
        manifest.
        """
        entry = _write_data_file(self.store, self.part_dir(pid), table, high_lsn)
        if (b := _pk_bloom_entry(table, self.primary_key[0])) is not None:
            entry["pk_bloom"] = b

        prev = self.manifest(pid)
        lineage = (prev.lineage if prev else []) + ([lineage_record] if lineage_record else [])
        if mode == "delta":
            entry["kind"] = "delta"
            files = (prev.files if prev else []) + [entry]
            row_count = -1  # unknown until resolved/compacted
        else:
            files = [entry]
            row_count = len(table)
        m = PartitionManifest(
            partition_id=pid,
            high_lsn=high_lsn,
            files=files,
            row_count=row_count,
            schema_json=_schema_to_json(table.schema),
            lineage=lineage[-64:],  # bounded history
        )
        path = self._manifest_path(pid)
        if txn:
            # staged = write-once object (atomic PUT / tmp+replace);
            # publish copies it into the pointer's commit log
            self.store.put_json(path + f".txn-{txn}", m.to_json())
        else:
            m.save(path, self.store)
        return m

    # -- cross-table transactions (staged manifests) -------------------
    def staged_txn_manifests(self, txn: str | None = None) -> list[str]:
        """Staged (unpublished) manifest paths — for one txn id, or all."""
        suffix = f".txn-{txn}" if txn else None
        out = []
        for d in self.store.list_subdirs(self.phys):
            if not d.startswith("part-"):
                continue
            pdir = self.store.join(self.phys, d)
            for name in self.store.list_objects(pdir):
                if not (name.startswith("manifest") and ".txn-" in name):
                    continue
                if suffix is not None and not name.endswith(suffix):
                    continue
                out.append(self.store.join(pdir, name))
        return sorted(out)

    def publish_txn(self, txn: str) -> int:
        """Flip every manifest staged under ``txn`` to current — the
        per-lake half of the cross-table commit (run only AFTER the
        transaction record exists; state/txn.py owns the ordering).
        Idempotent: re-running after a partial publish flips the
        remaining staged files and skips the already-flipped ones
        (POSIX: atomic rename; object store: copy the staged bytes in
        as the next pointer version, then delete the staged object —
        a crash in between just re-publishes identical bytes)."""
        n = 0
        for staged in self.staged_txn_manifests(txn):
            self.store.publish_staged(staged, staged[: -len(f".txn-{txn}")])
            n += 1
        return n

    def abort_txn(self, txn: str) -> int:
        """Discard a txn's staged manifests (their data files become
        vacuum orphans).  The published state is untouched — staged
        manifests were never visible."""
        n = 0
        for staged in self.staged_txn_manifests(txn):
            self.store.delete(staged)
            n += 1
        return n

    def stamp_watermark(self, pid: int, lsn: int) -> PartitionManifest | None:
        """Advance a partition's watermark WITHOUT touching its data —
        the CDC heartbeat (Debezium's low-watermark advancement): after
        a replay consumed the WAL up to ``lsn``, a partition that
        received no events has still SEEN everything ≤ ``lsn``, so its
        watermark may advance.  Without this, one quiet partition pins
        ``min_watermark`` forever and every tail cycle re-decodes all
        segments above it.  No-op if the watermark is already ≥ lsn."""
        m = self.manifest(pid)
        if m is None:
            m = PartitionManifest(
                partition_id=pid,
                high_lsn=lsn,
                files=[],
                row_count=0,
                schema_json=_schema_to_json(self.base_schema),
                lineage=[{"op": "stamp", "lsn_hi": lsn}],
            )
            m.save(self._manifest_path(pid), self.store)
            return m
        if m.high_lsn >= lsn:
            return m
        m.high_lsn = lsn
        m.lineage = (m.lineage + [{"op": "stamp", "lsn_hi": lsn}])[-64:]
        m.save(self._manifest_path(pid), self.store)
        return m

    def compact_partition(self, pid: int) -> PartitionManifest | None:
        """Fold all runs into one base run (same watermark).  The
        write-aside + manifest-swap makes it safe to run any time; the
        replaced run files become orphans for :meth:`vacuum`."""
        m = self.manifest(pid)
        if m is None or len(m.files) <= 1:
            return m
        resolved = self.read_partition(pid)
        return self.commit_partition(
            pid,
            resolved,
            m.high_lsn,
            lineage_record={"compacted_runs": len(m.files), "rows_after": len(resolved)},
            mode="replace",
        )

    def fold_delta_runs(self, pid: int) -> PartitionManifest | None:
        """Collapse ALL delta runs into ONE key-sorted run, leaving
        the base untouched — O(sum of delta bytes) instead of the full
        compaction's O(partition).  Tombstones are PRESERVED (the fold
        is ``dedup_last_writer``, not a resolve): the folded run is
        still a delta, and LWW across runs is decided by lsn, so run
        boundaries can be collapsed freely without changing the
        resolved state.  Watermark unchanged; replaced runs become
        vacuum orphans."""
        m = self.manifest(pid)
        if m is None:
            return m
        deltas = [f for f in m.files if f.get("kind") == "delta"]
        if len(deltas) <= 1:
            return m
        from ..stages.merge import dedup_last_writer

        tbls = [
            self.store.read_table(self.store.join(self.part_dir(pid), f["path"]))
            for f in deltas
        ]
        merged = (
            tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls, promote_options="permissive")
        )
        folded = dedup_last_writer(merged, keys=self.primary_key)
        entry = _write_data_file(self.store, self.part_dir(pid), folded, m.high_lsn)
        if (b := _pk_bloom_entry(folded, self.primary_key[0])) is not None:
            entry["pk_bloom"] = b
        entry["kind"] = "delta"
        files = [f for f in m.files if f.get("kind") != "delta"] + [entry]
        new_m = PartitionManifest(
            partition_id=pid,
            high_lsn=m.high_lsn,
            files=files,
            row_count=-1,
            schema_json=_schema_to_json(folded.schema),
            lineage=(
                m.lineage
                + [{"op": "fold_deltas", "runs_folded": len(deltas), "rows_after": len(folded)}]
            )[-64:],
        )
        new_m.save(self._manifest_path(pid), self.store)
        return new_m

    def compact_partition_adaptive(
        self, pid: int, full_ratio: float = 0.5
    ) -> PartitionManifest | None:
        """Size-tiered compaction trigger (the LSM write-amplification
        fix for frequent small tails): while the accumulated delta
        bytes are small relative to the base, only fold the deltas
        (cheap, base file untouched on disk); rewrite the base only
        once deltas reach ``full_ratio`` of its size — so a partition
        receiving K small tails costs O(K · delta) + amortized
        O(partition), not K · O(partition)."""
        m = self.manifest(pid)
        if m is None or len(m.files) <= 1:
            return m

        def nbytes(f):
            try:
                return self.store.size(self.store.join(self.part_dir(pid), f["path"]))
            except (OSError, FileNotFoundError):
                return 0

        base_bytes = sum(nbytes(f) for f in m.files if f.get("kind") != "delta")
        delta_bytes = sum(nbytes(f) for f in m.files if f.get("kind") == "delta")
        if base_bytes == 0 or delta_bytes >= full_ratio * base_bytes:
            return self.compact_partition(pid)
        return self.fold_delta_runs(pid)

    # -- online partition rescale (split / coalesce) ------------------
    def split_partitions(self, factor: int = 2, *, parallel: bool = True) -> dict:
        """Online partition split: N → N·factor, preserving state and
        watermarks, with ONE atomic metadata publish.

        Why it works: routing is ``hash(pk[0]) % N``
        (functions/hashing.py), so every row of parent partition ``p``
        lands in exactly one of the ``factor`` children
        ``{p + j·N}`` under ``% (N·factor)`` — a split never moves rows
        between parents, making it embarrassingly parallel (one Ray
        task per parent, no shuffle).  Each child inherits the parent's
        ``high_lsn`` watermark, so a replay resumed after the split
        stays exactly-once.

        Crash-safe and resumable: children are written as
        NEXT-generation manifests (invisible to current readers), the
        intent file records the target layout, and only when every
        parent is split does one atomic ``lake.json`` replace flip the
        lake to the new generation.  A crash at any point leaves the
        current generation fully consistent; re-running resumes (parents
        whose children already exist at the target watermark are
        skipped).  Requires no concurrent writers (a maintenance
        operation, like the reference's atomic rename swap,
        carto/carto_.py:422-436).  Run :meth:`vacuum` afterwards to
        reclaim the previous generation's files.
        """
        if factor < 2:
            raise ValueError("split factor must be >= 2")
        return self._rescale(self.num_partitions * factor, factor, parallel)

    def coalesce_partitions(self, factor: int = 2, *, parallel: bool = True) -> dict:
        """Online partition coalesce: N → N/factor (inverse of
        :meth:`split_partitions`; same generation protocol).  Child
        ``c`` is the concatenation of parents ``{c + j·(N/factor)}`` —
        key-disjoint by the same mod arithmetic, so a plain concat.

        The child watermark is the MIN of its parents' watermarks:
        events in (min, max] are re-delivered by the next replay, but
        re-applying them is idempotent — base rows merge with sentinel
        lsn = -1, so a re-applied upsert overwrites the identical
        payload and a re-applied delete removes an already-absent key
        (the LWW kernel contract, stages/merge.py)."""
        if factor < 2:
            raise ValueError("coalesce factor must be >= 2")
        if self.num_partitions % factor:
            raise ValueError(
                f"num_partitions={self.num_partitions} not divisible by factor={factor}"
            )
        return self._rescale(self.num_partitions // factor, factor, parallel)

    def _rescale(self, new_n: int, factor: int, parallel: bool) -> dict:
        next_gen = self.generation + 1
        intent_path = self.store.join(self.phys, f"rescale-g{next_gen}.json")
        intent = {"from": self.num_partitions, "to": new_n, "generation": next_gen}
        prev = self.store.get_json(intent_path)
        if prev is not None:
            if prev != intent:
                raise RuntimeError(
                    f"conflicting in-progress rescale {prev} != {intent}; "
                    "finish it by re-running the original rescale, or "
                    "discard its progress with abort_rescale() first"
                )
        else:
            self.store.put_json(intent_path, intent)

        split = new_n > self.num_partitions
        units = list(range(self.num_partitions if split else new_n))
        worker = _split_parent if split else _coalesce_group
        root = self.root

        if parallel and len(units) > 1:
            import ray.data

            def run(b: pa.Table) -> pa.Table:
                rows = [
                    worker(root, int(u), factor, next_gen).get("rows", 0)
                    for u in b.column("u").to_pylist()
                ]
                return pa.table({"rows": pa.array(rows, pa.int64())})

            # one block per unit so the per-partition rewrites fan out
            # across the cluster (the dataset() resolution pattern)
            moved = int(
                ray.data.from_items([{"u": u} for u in units], override_num_blocks=len(units))
                .map_batches(run, batch_format="pyarrow", batch_size=1)
                .to_pandas()["rows"]
                .sum()
            )
        else:
            moved = sum(worker(root, u, factor, next_gen).get("rows", 0) for u in units)

        # pre-flip verification: if any parent advanced between its
        # rewrite and now (a writer raced the replay-side guard), its
        # next-generation output is stale — the resume check inside the
        # worker detects the watermark mismatch and re-processes; in
        # the normal case this pass is manifest reads only
        for u in units:
            worker(root, u, factor, next_gen)

        # publish: the ONE atomic metadata swap that makes the new
        # layout visible; everything before this line is invisible to
        # readers and safely re-runnable (POSIX: rename swap; object
        # store: one new lake.json pointer version)
        self.store.put_json(
            self.store.join(self.phys, "lake.json"),
            {
                "num_partitions": new_n,
                "schema": _schema_to_json(self.base_schema),
                "primary_key": list(self.primary_key),
                "generation": next_gen,
            },
            pointer=True,
        )
        self.store.delete(intent_path)
        self.num_partitions = new_n
        self.generation = next_gen
        return {"num_partitions": new_n, "generation": next_gen, "rows": moved}

    # -- whole-lake views --------------------------------------------
    def data_files(self) -> list[str]:
        out = []
        for pid in range(self.num_partitions):
            m = self.manifest(pid)
            if m:
                out.extend(self.store.join(self.part_dir(pid), f["path"]) for f in m.files)
        return out

    def _has_deltas(self) -> bool:
        return any(
            f.get("kind") == "delta"
            for p in range(self.num_partitions)
            if (m := self.manifest(p))
            for f in m.files
        )

    def dataset(
        self,
        columns: list[str] | None = None,
        *,
        snapshot: int | None = None,
        pids: list[int] | None = None,
    ):
        """Committed lake state as a streaming ``ray.data.Dataset``
        (reads only manifest-referenced files — orphans invisible).

        Fast path: all partitions compacted → plain ``read_parquet``
        (with ``columns`` pushed into the parquet read, so only the
        requested columns leave storage).  With delta runs, one Ray
        task per partition performs the merge-on-read resolution
        (partition-parallel, no shuffle), reading only ``columns``
        plus the key/op/lsn columns resolution needs; partitions that
        predate a requested column (schema evolution) null-fill it
        against the lake-wide unified schema.

        ``snapshot`` time-travels: reads the partition manifests
        recorded by :meth:`snapshot` instead of the committed pointers
        (snapshot manifests are metadata-small and ship to the
        resolution tasks by closure; a deployment with ≥10^5
        partitions would shard them).  ``pids`` restricts the read to
        a partition subset — the pruning hook :meth:`scan` and
        :meth:`lookup` use."""
        import ray.data

        # ONE manifest pass serves file listing, delta detection, and
        # (for projected reads) the schema checks — manifests may live
        # on object storage, so repeated scans are round-trips
        if snapshot is not None:
            snap = self._load_snapshot(snapshot)
            snap_manifests = {
                int(p): PartitionManifest.from_json(mj)
                for p, mj in snap["manifests"].items()
            }
            all_pids = sorted(snap_manifests)
        else:
            snap_manifests = None
            all_pids = list(range(self.num_partitions))
        if pids is not None:
            want = set(pids)
            all_pids = [p for p in all_pids if p in want]
        manifests = [
            m
            for p in all_pids
            if (m := (snap_manifests[p] if snap_manifests is not None else self.manifest(p)))
            is not None
        ]
        files = [
            self.store.join(self.part_dir(m.partition_id), f["path"])
            for m in manifests
            for f in m.files
        ]
        has_deltas = any(f.get("kind") == "delta" for m in manifests for f in m.files)
        if columns is not None:
            from ..schema import promote_schemas

            unified = self.base_schema
            for m in manifests:
                if m.schema_json:
                    unified = promote_schemas(unified, _schema_from_json(m.schema_json))
            drop = {"op"} | ({"lsn"} - set(self.base_schema.names))
            unified = pa.schema([f for f in unified if f.name not in drop])
            missing = [c for c in columns if c not in unified.names]
            if missing:
                raise KeyError(f"columns {missing} not in lake schema {unified.names}")
            target = pa.schema([unified.field(c) for c in columns])
        else:
            target = None
        if not files:
            empty = self.base_schema.empty_table()
            return ray.data.from_arrow(conform(empty, target) if target else empty)
        pa_fs = self.store.pa_filesystem
        if not has_deltas:
            if columns is None:
                return ray.data.read_parquet(files, filesystem=pa_fs)
            # column presence from the recorded manifest schemas — no
            # per-file footer I/O on the driver
            if all(
                m.schema_json
                and set(columns) <= set(_schema_from_json(m.schema_json).names)
                for m in manifests
                if m.files
            ):
                return ray.data.read_parquet(
                    files, columns=list(columns), filesystem=pa_fs
                )
            # some partition predates a requested column: fall through
            # to the per-partition path, which conforms (null-fills)

        root = self.root
        snap_json = (
            None
            if snap_manifests is None
            else {p: m.to_json() for p, m in snap_manifests.items()}
        )

        def resolve(batch: pa.Table) -> pa.Table:
            lake = TranscriptLake(root)
            out = [
                lake.read_partition(
                    int(p),
                    columns=columns,
                    manifest=(
                        PartitionManifest.from_json(snap_json[int(p)])
                        if snap_json is not None
                        else None
                    ),
                )
                for p in batch.column("pid").to_pylist()
            ]
            out = [t for t in out if len(t)]
            if not out:
                return conform(lake.base_schema.empty_table(), target) if target else lake.base_schema.empty_table()
            got = pa.concat_tables(out, promote_options="permissive")
            return conform(got, target) if target else got

        # one block per partition so resolution fans out across tasks
        # (from_arrow would yield a single block and run serially)
        pid_ds = ray.data.from_items(
            [{"pid": p} for p in all_pids],
            override_num_blocks=max(1, len(all_pids)),
        )
        return pid_ds.map_batches(resolve, batch_format="pyarrow", batch_size=1)

    # -- pruned reads (zone maps + hash routing) -----------------------
    def scan_plan(self, col: str, lo, hi) -> list[int]:
        """Partition ids a range scan ``lo <= col <= hi`` must read,
        decided from the zone-map stats recorded at commit time
        (:func:`_column_stats`): a partition is skipped only when EVERY
        run's [min, max] for ``col`` misses the window.

        Partition-level (never run-level) pruning is the correct unit
        under LWW merge-on-read: a row's final value comes from exactly
        one run, so if no run intersects the window no resolved row
        can either — but a run inside the window may still be
        overwritten by one outside it, so runs are never skipped
        individually.  Files without stats for ``col`` (all-null, old
        writers, non-numeric) keep their partition — pruning is always
        conservative.  Whether anything prunes depends on layout:
        value-correlated runs (e.g. time-ordered tails) prune; columns
        uniform across hash partitions don't (see the Z-order query
        for layout-aware file pruning on the write side)."""
        lo, hi = _stat_bound(lo), _stat_bound(hi)
        keep = []
        for pid in range(self.num_partitions):
            m = self.manifest(pid)
            if m is None or not m.files:
                continue
            ranges = [f.get("stats", {}).get(col) for f in m.files]
            if any(r is None for r in ranges) or any(
                not (r[1] < lo or r[0] > hi) for r in ranges
            ):
                keep.append(pid)
        return keep

    def scan(self, col: str, lo, hi, *, columns: list[str] | None = None):
        """Range scan ``lo <= col <= hi`` (inclusive) over the resolved
        lake state as a streaming Dataset: zone-map partition pruning
        (:meth:`scan_plan`) + projected per-partition reads + a
        vectorized residual filter.  ``col`` must be numeric or
        temporal (the stats domain)."""
        read_cols = (
            None if columns is None else list(dict.fromkeys([*columns, col]))
        )
        ds = self.dataset(read_cols, pids=self.scan_plan(col, lo, hi))

        def residual(b: pa.Table) -> pa.Table:
            c = b.column(col)
            lo_s = pa.scalar(lo).cast(c.type) if not isinstance(lo, pa.Scalar) else lo.cast(c.type)
            hi_s = pa.scalar(hi).cast(c.type) if not isinstance(hi, pa.Scalar) else hi.cast(c.type)
            b = b.filter(pc.and_(pc.greater_equal(c, lo_s), pc.less_equal(c, hi_s)))
            return b.select(columns) if columns is not None else b

        return ds.map_batches(residual, batch_format="pyarrow")

    def lookup_plan(self, values) -> list[int]:
        """Partitions a point lookup must read: hash routing narrows
        to the owning partitions, then each owner's per-run PK Bloom
        filters (:func:`_pk_bloom_entry`) short-circuit definite
        misses with no data I/O — a lookup of absent keys reads
        NOTHING, the LSM read path.  No false negatives: a kept pid is
        pruned only when every run's bloom rejects every routed key;
        runs without a bloom (old writers) keep their partition."""
        from ..functions.hashing import stable_hash_any

        arr = pa.array(values, type=self.base_schema.field(self.primary_key[0]).type)
        h = stable_hash_any(arr)
        pids = (h % np.uint64(self.num_partitions)).astype(np.int32)
        hi64 = h.view(np.int64)
        keep = []
        for pid in sorted(set(pids.tolist())):
            m = self.manifest(pid)
            if m is None or not m.files:
                continue  # definite miss: partition never written
            routed = hi64[pids == pid]
            blooms = [f.get("pk_bloom") for f in m.files]
            if any(b is None for b in blooms) or any(
                _bloom_maybe(b, routed) for b in blooms
            ):
                keep.append(pid)
        return keep

    def lookup(self, values, *, columns: list[str] | None = None):
        """Point lookup by ``primary_key[0]`` values: hash-route to the
        owning partitions and read ONLY those (≤ |values| of N), with a
        residual membership filter — the reference's AGO per-row PK
        lookup (ago/ago.py:1063-1086) made lake-native: one routed
        partition read instead of one remote query per row.  Returns a
        streaming Dataset (resolved, delta runs included)."""
        key = self.primary_key[0]
        read_cols = (
            None if columns is None else list(dict.fromkeys([*columns, key]))
        )
        ds = self.dataset(read_cols, pids=self.lookup_plan(values))
        want = pa.array(values, type=self.base_schema.field(key).type)

        def member(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_in(b.column(key), value_set=want))
            return b.select(columns) if columns is not None else b

        return ds.map_batches(member, batch_format="pyarrow")

    # -- snapshots (time travel) ---------------------------------------
    def _snapshot_dir(self) -> str:
        return self.store.join(self.phys, "snapshots")

    def _snapshot_path(self, sid: int) -> str:
        return self.store.join(self._snapshot_dir(), f"snap-{sid:06d}.json")

    def _load_snapshot(self, sid: int) -> dict:
        obj = self.store.get_json(self._snapshot_path(sid))
        if obj is None:
            raise FileNotFoundError(f"no snapshot {sid}")
        return obj

    def snapshot(self, note: str | None = None) -> int:
        """Record the current committed state as a named, immutable
        snapshot (Iceberg-style): copies every partition's manifest
        CONTENTS into one metadata file, so later commits / compactions
        / rescales can't disturb it, and :meth:`vacuum` retains every
        data file a live snapshot references.  Metadata-only — no data
        is copied.  Returns the snapshot id for
        ``dataset(snapshot=id)`` time-travel reads; drop with
        :meth:`drop_snapshot` to let vacuum reclaim the files.

        The reference's publish protocol keeps exactly one past
        version implicitly (the pre-swap table, carto/carto_.py:
        422-436); snapshots generalize that to N retained versions
        with explicit lifecycle."""
        existing = self.snapshots()
        sid = (max((s["id"] for s in existing), default=0)) + 1
        manifests = {
            str(p): m.to_json()
            for p in range(self.num_partitions)
            if (m := self.manifest(p)) is not None
        }
        self.store.put_json(
            self._snapshot_path(sid),
            {
                "id": sid,
                "generation": self.generation,
                "num_partitions": self.num_partitions,
                "note": note or "",
                "manifests": manifests,
            },
        )
        return sid

    def _snapshot_names(self) -> list[str]:
        return [
            n
            for n in self.store.list_objects(self._snapshot_dir())
            if n.startswith("snap-") and n.endswith(".json")
        ]

    def snapshots(self) -> list[dict]:
        """Live snapshots, oldest first: ``{id, generation,
        num_partitions, note}`` (manifest payloads omitted)."""
        out = []
        for name in self._snapshot_names():
            s = self.store.get_json(self.store.join(self._snapshot_dir(), name))
            if s is not None:
                out.append(
                    {k: s[k] for k in ("id", "generation", "num_partitions", "note")}
                )
        return out

    def drop_snapshot(self, sid: int) -> None:
        """Delete a snapshot's metadata; its exclusively-referenced
        data files become vacuum-reclaimable orphans."""
        self.store.delete(self._snapshot_path(sid))

    def _snapshot_live_files(self) -> dict[int, set]:
        """pid → data-file names referenced by ANY live snapshot (the
        vacuum retention set)."""
        live: dict[int, set] = {}
        for name in self._snapshot_names():
            s = self.store.get_json(self.store.join(self._snapshot_dir(), name))
            if s is None:
                continue
            for p, mj in s["manifests"].items():
                live.setdefault(int(p), set()).update(f["path"] for f in mj["files"])
        return live

    def read_all(self) -> pa.Table:
        """Full lake as one Arrow table — small lakes / tests only."""
        tables = [self.read_partition(p) for p in range(self.num_partitions)]
        tables = [t for t in tables if len(t)]
        if not tables:
            return self.base_schema.empty_table()
        return pa.concat_tables(tables, promote_options="permissive")

    def total_rows(self) -> int:
        """Live row count; partitions with unresolved delta runs
        (row_count == -1) are resolved on demand."""
        total = 0
        for p in range(self.num_partitions):
            m = self.manifest(p)
            if not m:
                continue
            total += m.row_count if m.row_count >= 0 else len(self.read_partition(p))
        return total

    def metrics(self) -> dict:
        """Aggregated lineage/lag metrics across partitions
        (north_rule: per-partition lineage + throughput/lag)."""
        per_part = {}
        if self.store.pa_filesystem is None:
            manifests = [self.manifest(p) for p in range(self.num_partitions)]
        else:
            # object backend: overlap the LIST+GET pointer round trips
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(32, self.num_partitions)) as ex:
                manifests = list(ex.map(self.manifest, range(self.num_partitions)))
        for pid, m in enumerate(manifests):
            if m:
                # row_count == -1 marks unresolved delta runs; resolve on
                # demand (as total_rows does) so aggregated counts are
                # never sentinel-biased after a mode='delta' replay
                rows = m.row_count if m.row_count >= 0 else len(self.read_partition(pid))
                per_part[pid] = {
                    "high_lsn": m.high_lsn,
                    "row_count": rows,
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

    def export_json_schema(self) -> dict:
        """Frictionless-style JSON Table Schema for the lake — the
        reference's catalog-driven schema exporter
        (postgres/_properties.py:36-85: information_schema + PK
        constraint → ``{fields: [{name, type}], primaryKey}`` sidecar),
        derived here from the committed partition manifests' unified
        Arrow schema (falling back to the creation schema)."""
        from ..schema import promote_schemas

        schema = self.base_schema
        part_schemas = [
            _schema_from_json(m.schema_json)
            for p in range(self.num_partitions)
            if (m := self.manifest(p)) and m.schema_json
        ]
        for s in part_schemas:
            schema = promote_schemas(schema, s)

        def friction_type(t: pa.DataType) -> str:
            if pa.types.is_integer(t):
                return "integer"
            if pa.types.is_floating(t) or pa.types.is_decimal(t):
                return "number"
            if pa.types.is_boolean(t):
                return "boolean"
            if pa.types.is_timestamp(t):
                return "datetime"
            if pa.types.is_date(t):
                return "date"
            if pa.types.is_time(t):
                return "time"
            if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_struct(t):
                return "object"
            return "string"

        return {
            "fields": [
                {"name": f.name, "type": friction_type(f.type)} for f in schema
            ],
            "primaryKey": [k for k in self.primary_key if k in schema.names],
        }

    def fsck(self, *, verify_hashes: bool = True) -> dict:
        """Integrity audit of the committed state — the engine's analog
        of the reference's count asserts after every load (e.g. the
        post-COPY row-count verification, postgres/postgres.py, and the
        Carto select-count check before the rename swap,
        carto/carto_.py:471-490):

        - every manifest-referenced data file exists, and (with
          ``verify_hashes``) its bytes match the recorded sha256;
        - non-delta manifests' ``row_count`` matches the parquet
          metadata row count (footer only — no data read);
        - lineage watermarks are monotonic (a commit never regressed
          ``high_lsn``).

        Returns ``{ok, partitions_checked, files_checked, errors}``
        with one error string per violation; never raises."""
        errors: list[str] = []
        files_checked = 0
        for pid in range(self.num_partitions):
            m = self.manifest(pid)
            if m is None:
                continue
            total_rows = 0
            for f in m.files:
                path = self.store.join(self.part_dir(pid), f["path"])
                if not self.store.exists(path):
                    errors.append(f"part {pid}: missing data file {f['path']}")
                    continue
                files_checked += 1
                try:
                    meta_rows = self.store.read_parquet_metadata(path).num_rows
                except Exception as e:  # corrupt footer
                    errors.append(f"part {pid}: unreadable parquet {f['path']}: {e}")
                    continue
                if f.get("rows", -1) >= 0 and meta_rows != f["rows"]:
                    errors.append(
                        f"part {pid}: {f['path']} has {meta_rows} rows, "
                        f"manifest says {f['rows']}"
                    )
                total_rows += meta_rows
                if verify_hashes:
                    h = hashlib.sha256()
                    with self.store.open_input(path) as fh:
                        for chunk in iter(lambda: fh.read(1 << 20), b""):
                            h.update(chunk)
                    if h.hexdigest() != f["sha256"]:
                        errors.append(f"part {pid}: sha mismatch on {f['path']}")
            if m.row_count >= 0 and total_rows != m.row_count:
                errors.append(
                    f"part {pid}: manifest row_count {m.row_count} != "
                    f"sum of file rows {total_rows}"
                )
            lsns = [r["lsn_hi"] for r in m.lineage if "lsn_hi" in r]
            if any(b < a for a, b in zip(lsns, lsns[1:])):
                errors.append(f"part {pid}: lineage watermark regressed: {lsns}")
            if lsns and m.high_lsn < lsns[-1]:
                errors.append(
                    f"part {pid}: high_lsn {m.high_lsn} below last lineage {lsns[-1]}"
                )
        return {
            "ok": not errors,
            "partitions_checked": self.num_partitions,
            "files_checked": files_checked,
            "errors": errors,
        }

    def _inflight_rescale_generation(self) -> int | None:
        """Generation of an in-progress (crashed, not yet published)
        rescale, i.e. an intent file for generation current+1."""
        path = self.store.join(self.phys, f"rescale-g{self.generation + 1}.json")
        if self.store.exists(path):
            return self.generation + 1
        return None

    def abort_rescale(self) -> list[str]:
        """Discard an in-progress rescale's partial progress: delete
        its next-generation manifests and intent file (the data files
        they referenced become orphans for :meth:`vacuum`).  The
        current generation is untouched — this is always safe, since
        an unpublished rescale is invisible to readers."""
        gen = self._inflight_rescale_generation()
        if gen is None:
            return []
        removed = []
        name = f"manifest-g{gen}.json"
        for d in self.store.list_subdirs(self.phys):
            if not d.startswith("part-"):
                continue
            path = self.store.join(self.phys, d, name)
            if self.store.pointer_exists(path):
                self.store.delete_pointer(path)
                removed.append(path)
        intent = self.store.join(self.phys, f"rescale-g{gen}.json")
        self.store.delete(intent)
        removed.append(intent)
        return removed

    def vacuum(self) -> list[str]:
        """Delete files not referenced by the CURRENT generation:
        orphan data files (crashes between data write and manifest
        replace), stale previous-generation manifests, and emptied
        beyond-range partition dirs left by a coalesce.

        An IN-PROGRESS rescale's next-generation manifests and the
        data files they reference are preserved (its intent file marks
        it) so vacuuming between a crash and the resume cannot destroy
        resumable progress; use :meth:`abort_rescale` to discard it
        deliberately.  Data files referenced by any live snapshot
        (:meth:`snapshot`) are likewise retained — time-travel reads
        survive compaction and rescale until :meth:`drop_snapshot`.

        Storage-agnostic: manifests are POINTERS (on the object
        backend a commit-log directory, whose superseded versions this
        pass also garbage-collects via ``gc_pointer``); data files /
        staged txn manifests are objects.  Same concurrency contract
        on both backends: a maintenance operation, no concurrent
        writers."""
        store = self.store
        removed = []
        cur_manifest = "manifest.json" if self.generation == 1 else f"manifest-g{self.generation}.json"
        inflight = self._inflight_rescale_generation()
        keep_manifests = {cur_manifest} | (
            {f"manifest-g{inflight}.json"} if inflight else set()
        )
        snap_live = self._snapshot_live_files()
        for d in store.list_subdirs(self.phys):
            if not d.startswith("part-"):
                continue
            pdir = store.join(self.phys, d)
            try:
                pid = int(d.split("-", 1)[1])
            except ValueError:
                continue
            live = set(snap_live.get(pid, ()))
            if pid < self.num_partitions and (m := self.manifest(pid)):
                live |= {f["path"] for f in m.files}
            if inflight:
                nm = PartitionManifest.load(
                    store.join(pdir, f"manifest-g{inflight}.json"), store
                )
                if nm:
                    live |= {f["path"] for f in nm.files}
            # staged txn manifests and the files they reference belong
            # to txn recovery (publish/abort, state/txn.py) — vacuuming
            # them mid-transaction would break roll-forward
            for name in store.list_objects(pdir):
                if ".txn-" in name and name.startswith("manifest"):
                    smj = store.get_json(store.join(pdir, name))
                    if smj:
                        live |= {f["path"] for f in smj["files"]}
            # stale manifest pointers (previous generations) + version GC
            for name in store.list_pointers(pdir):
                if not name.startswith("manifest") or ".txn-" in name:
                    continue
                path = store.join(pdir, name)
                if name not in keep_manifests:
                    store.delete_pointer(path)
                    removed.append(path)
                else:
                    removed.extend(store.gc_pointer(path))
            # orphan data files + leftover tmps
            for name in store.list_objects(pdir):
                path = store.join(pdir, name)
                stale_data = (
                    name.startswith("data-") and name.endswith(".parquet") and name not in live
                )
                if stale_data or name.endswith(".tmp"):
                    store.delete(path)
                    removed.append(path)
            store.remove_dir_if_empty(pdir)
        removed.extend(store.gc_pointer(store.join(self.phys, "lake.json")))
        for name in store.list_objects(self.phys):
            # an abandoned intent whose generation already published
            if not (name.startswith("rescale-g") and name.endswith(".json")):
                continue
            leftover = store.join(self.phys, name)
            obj = store.get_json(leftover)
            if obj is not None and obj.get("generation", -1) <= self.generation:
                store.delete(leftover)
                removed.append(leftover)
        return removed


def _split_parent(root: str, p: int, factor: int, next_gen: int) -> dict:
    """Split one parent partition into its ``factor`` children under
    the next generation (invisible until the lake.json flip).  Pure
    function of committed state — safe to retry and to run on any
    node."""
    import numpy as np

    from ..functions.hashing import partition_ids

    lake = TranscriptLake(root)
    n = lake.num_partitions
    new_n = n * factor
    children = [p + j * n for j in range(factor)]
    parent_m = lake.manifest(p)
    if parent_m is None:
        # never-written parent: children inherit watermark -1 by
        # having no manifest either
        return {"parent": p, "rows": 0, "skipped": True}
    existing = [
        PartitionManifest.load(lake._manifest_path(c, next_gen), lake.store)
        for c in children
    ]
    if all(m is not None and m.high_lsn == parent_m.high_lsn for m in existing):
        return {"parent": p, "rows": sum(m.row_count for m in existing), "resumed": True}
    table = lake.read_partition(p)  # resolved: split doubles as compaction
    if len(table):
        pids = partition_ids(table.column(lake.primary_key[0]), new_n)
        if not np.all(pids % n == p):
            raise AssertionError(
                f"routing invariant violated splitting partition {p}: "
                "rows present that do not hash to this partition"
            )
    else:
        pids = np.empty(0, np.int32)
    total = 0
    for c in children:
        child = table.filter(pa.array(pids == c)) if len(table) else table
        entry = _write_data_file(
            lake.store, lake.part_dir(c), child, parent_m.high_lsn
        )
        if (b := _pk_bloom_entry(child, lake.primary_key[0])) is not None:
            entry["pk_bloom"] = b
        m = PartitionManifest(
            partition_id=c,
            high_lsn=parent_m.high_lsn,
            files=[entry],
            row_count=len(child),
            schema_json=_schema_to_json(child.schema),
            lineage=[
                {
                    "op": "split",
                    "from_partition": p,
                    "from_generation": next_gen - 1,
                    "rows": len(child),
                }
            ],
        )
        m.save(lake._manifest_path(c, next_gen), lake.store)
        total += len(child)
    return {"parent": p, "rows": total}


def _coalesce_group(root: str, c: int, factor: int, next_gen: int) -> dict:
    """Merge one child's parent group ``{c + j·new_n}`` into child
    ``c`` under the next generation.  Parents are key-disjoint (same
    mod arithmetic as the split), so this is a concat, not a merge;
    the child watermark is the parents' MIN (re-delivery of the
    (min, max] window is idempotent under the LWW kernel)."""
    lake = TranscriptLake(root)
    n = lake.num_partitions
    new_n = n // factor
    parents = [c + j * new_n for j in range(factor)]
    manifests = [lake.manifest(pp) for pp in parents]
    if all(m is None for m in manifests):
        return {"child": c, "rows": 0, "skipped": True}
    high_lsn = min((m.high_lsn if m else -1) for m in manifests)
    existing = PartitionManifest.load(lake._manifest_path(c, next_gen), lake.store)
    if existing is not None and existing.high_lsn == high_lsn:
        return {"child": c, "rows": existing.row_count, "resumed": True}
    tables = [
        t
        for pp, m in zip(parents, manifests)
        if m is not None and len(t := lake.read_partition(pp))
    ]
    if not tables:
        merged = lake.base_schema.empty_table()
    elif len(tables) == 1:
        merged = tables[0]
    else:
        merged = pa.concat_tables(tables, promote_options="permissive")
    entry = _write_data_file(lake.store, lake.part_dir(c), merged, high_lsn)
    if (b := _pk_bloom_entry(merged, lake.primary_key[0])) is not None:
        entry["pk_bloom"] = b
    m = PartitionManifest(
        partition_id=c,
        high_lsn=high_lsn,
        files=[entry],
        row_count=len(merged),
        schema_json=_schema_to_json(merged.schema),
        lineage=[
            {
                "op": "coalesce",
                "from_partitions": parents,
                "from_generation": next_gen - 1,
                "rows": len(merged),
            }
        ],
    )
    m.save(lake._manifest_path(c, next_gen), lake.store)
    return {"child": c, "rows": len(merged)}
