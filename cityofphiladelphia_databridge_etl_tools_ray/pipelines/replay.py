"""The flagship pipeline: CDC replay into the transcripts lake.

Ray shape (SURVEY.md §3.1 "Ray shape" and §4 physical plan)::

    read_change_log(events)                         # pruned at the read
      → map_batches(ChangeNormalizer, pyarrow)      # validate + rename + scrub
                                                    #   + assign _part + LOCAL pre-dedup
      → groupby("_part")                            # the ONE shuffle (hash on conv_id)
      → map_groups(merge-and-commit, pyarrow)       # per-partition LWW merge vs base,
                                                    #   atomic manifest commit
      → small metrics dataset (one row per partition)

The pre-shuffle combiner (per-batch keep-max-lsn, associative — see
stages/merge.dedup_last_writer) is the skew mitigation: an
update-heavy hot conv_id collapses to ≤ one row per (conv_id,
turn_idx) per input batch before any bytes move, the batch analog of
salting.  Residual skew is bounded by partition granularity; pick
``num_partitions`` ≥ 8× workers so hot partitions interleave.

Normalization reimplements the reference's extract/load fixups
(SURVEY.md §2.3): column rename maps (postgres/postgres.py:203-228),
header/ column canonicalization, null-byte scrub
(postgres/_cleanup.py:30-54 — here vectorized and unconditional),
op-enum validation with a dead-letter route (ago/ago.py:319-344),
and type casts to the change schema.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import partition_ids
from ..schema import CHANGE_SCHEMA, OPS, PRIMARY_KEY
from ..stages.merge import (
    dedup_last_writer,
    dedup_last_writer_skew_aware,
    merge_partition,
)

PART_COL = "_part"
SALT_COL = "_salt"
BLOB_COL = "_blob"

_ALLOC_TUNED = False


def _pack_codec() -> str | None:
    """Exchange blob compression codec (GRAFT_PACK_CODEC=lz4|zstd|none)."""
    import os

    c = os.environ.get("GRAFT_PACK_CODEC", "lz4")
    return None if c == "none" else c


def _salt_buckets(salt: int | None) -> int:
    """Coarse bucket count for the packed phase-1 salted exchange:
    buckets×salt ≈ 4×CPUs (computed on the DRIVER so all producers
    agree), so the (bucket, salt) groupby has enough groups to spread
    across reducers without blob-count blowup."""
    from ..functions.cluster import parallelism

    if not salt or salt <= 1:
        return 1
    return max(1, parallelism(4.0) // salt)


def _pack_enabled() -> bool:
    """Packed-exchange gate (GRAFT_PACK_EXCHANGE=0 disables)."""
    import os

    return os.environ.get("GRAFT_PACK_EXCHANGE", "1") != "0"


def _pack_max_blob_bytes() -> int:
    """Per-blob serialized-size cap (GRAFT_PACK_MAX_BLOB, default 64 MB).

    One (batch, partition) slice normally compresses into one IPC blob;
    a hot partition fed by a very large normalizer batch would otherwise
    become a single multi-hundred-MB large_binary CELL that must
    materialize contiguously on its reducer — re-introducing the skew
    the salted path exists to avoid.  Slices above the cap split into
    multiple blob rows; ``unpack_exchange`` already concatenates
    multiple blobs per partition, so readers need no change."""
    import os

    return int(os.environ.get("GRAFT_PACK_MAX_BLOB", str(64 << 20)))


def pack_exchange(batch: pa.Table, pids: np.ndarray, salts: np.ndarray | None = None) -> pa.Table:
    """Map-side exchange packing: group the batch's rows by partition
    id (and optionally salt) and serialize each slice to compressed
    Arrow-IPC blobs, emitting ``(PART_COL[, SALT_COL], BLOB_COL)`` rows.

    Why: the replay's single all-to-all moves the full text payload.
    Shuffling raw rows makes Ray's sort shuffle order 14M+ strings and
    push ~2× the payload bytes through the object store — and on a
    multi-worker host the exchange is memory-BANDWIDTH bound, which is
    exactly what breaks N→4N scaling efficiency.  Packing turns the
    exchange into ≤ maps×partitions tiny rows whose payload is
    lz4-compressed columnar IPC (≈3× fewer bytes, C++ codec), so the
    sort is trivial and reducers unpack zero-copy.  The loop below is
    over PARTITIONS in the batch (≤ num_partitions), not rows.

    With ``salts`` (the two-phase hot-key merge), slices group on the
    composite (pid, salt) so hot-key streams also move compressed
    through the phase-1 (part, salt) exchange."""
    if len(batch) == 0:
        return _EMPTY_PACKED_SALTED if salts is not None else _EMPTY_PACKED
    if salts is not None:
        n_salt = int(salts.max()) + 1
        combined = pids.astype(np.int64) * n_salt + salts
    else:
        combined = pids
    order = np.argsort(combined, kind="stable")
    sp = combined[order]
    starts = np.r_[0, np.flatnonzero(np.diff(sp)) + 1]
    bounds = np.r_[starts, len(sp)]
    sorted_batch = batch.take(pa.array(order)).combine_chunks()
    opts = pa.ipc.IpcWriteOptions(compression=_pack_codec())
    cap = _pack_max_blob_bytes()
    blobs: list[bytes] = []
    blob_key: list[int] = []
    for i in range(len(starts)):
        s, e = int(bounds[i]), int(bounds[i + 1])
        sl = sorted_batch.slice(s, e - s)
        # cap check on the uncompressed in-memory size (cheap, computed
        # from buffer lengths; the compressed blob is strictly smaller)
        n_chunks = max(1, -(-sl.nbytes // cap)) if sl.nbytes > cap else 1
        rows_per = -(-len(sl) // n_chunks)
        for c0 in range(0, len(sl), rows_per):
            chunk = sl.slice(c0, rows_per)
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, chunk.schema, options=opts) as w:
                w.write_table(chunk)
            blobs.append(sink.getvalue().to_pybytes())
            blob_key.append(int(sp[s]))
    key_arr = np.asarray(blob_key, dtype=np.int64)
    cols = {PART_COL: pa.array((key_arr // n_salt if salts is not None else key_arr).astype(np.int32))}
    if salts is not None:
        cols[SALT_COL] = pa.array((key_arr % n_salt).astype(np.int32))
    cols[BLOB_COL] = pa.array(blobs, pa.large_binary())
    return pa.table(cols)


_EMPTY_PACKED = pa.schema(
    [(PART_COL, pa.int32()), (BLOB_COL, pa.large_binary())]
).empty_table()

_EMPTY_PACKED_SALTED = pa.schema(
    [(PART_COL, pa.int32()), (SALT_COL, pa.int32()), (BLOB_COL, pa.large_binary())]
).empty_table()


def unpack_exchange(group: pa.Table) -> pa.Table:
    """Reduce-side unpack: deserialize a partition's IPC blobs and
    concatenate (per-blob schemas may differ across producers —
    unified permissively, same rule as the merge stage)."""
    tables = [
        pa.ipc.open_stream(pa.BufferReader(b)).read_all()
        for b in group.column(BLOB_COL).to_pylist()
    ]
    if not tables:
        return CHANGE_SCHEMA.empty_table()
    if len(tables) == 1:
        return tables[0]
    try:
        return pa.concat_tables(tables, promote_options="permissive")
    except TypeError:  # pyarrow < 14 signature drift
        return pa.concat_tables(tables, promote=True)


def _tune_worker_allocator() -> None:
    """Disable jemalloc page decay in this worker process (idempotent,
    call from any per-batch hot path).

    Arrow's jemalloc pool returns dirty pages to the OS after ~1 s of
    decay; every subsequent large kernel output then re-faults fresh
    pages.  Under many concurrent worker processes, page-fault handling
    (zeroing + TLB shootdowns) serializes in the kernel and measures
    ~100× slower than warm-page copies on large hosts — the replay's
    merge stage ran 5× slower end-to-end before this.  Retaining pages
    for the worker's lifetime trades bounded per-worker RSS (the peak
    block working set) for allocation at memory speed."""
    global _ALLOC_TUNED
    if _ALLOC_TUNED:
        return
    _ALLOC_TUNED = True
    try:
        pa.jemalloc_set_decay_ms(-1)
    except (AttributeError, pa.lib.ArrowInvalid, OSError):  # non-jemalloc build
        pass


def localize_naive_timestamps(batch: pa.Table, tz: str) -> pa.Table:
    """Timezone localization, vectorized (the reference walks the
    catalog for datetime columns and ``pytz.localize``s each value —
    oracle/oracle.py:197-221, postgres/postgres.py:327-341; here one
    ``pc.assume_timezone`` kernel per timestamp column per batch).

    Naive timestamp columns are interpreted as wall time in ``tz`` and
    normalized to naive-UTC instants; already-aware columns are
    converted to the same naive-UTC representation.  Emitting UTC
    instants (rather than the reference's tz-aware values) keeps the
    lake schema tz-free and stable — the information content is
    identical.  DST edges resolve as ``earliest`` (matches DuckDB's
    ``timezone()`` on the synthesized inputs; verified bit-exact)."""
    for i, f in enumerate(batch.schema):
        if not pa.types.is_timestamp(f.type):
            continue
        col = batch.column(i)
        if f.type.tz is None:
            col = pc.assume_timezone(
                col, tz, ambiguous="earliest", nonexistent="earliest"
            )
        col = col.cast(pa.timestamp(f.type.unit))
        batch = batch.set_column(i, pa.field(f.name, col.type), col)
    return batch


class ChangeNormalizer:
    """Stateless-ish batch normalizer (used as an actor pool so the
    compiled rename map / validators are built once per worker —
    reference pattern: pyproj Transformer cached outside the row loop,
    ago/ago.py:347-354)."""

    def __init__(
        self,
        num_partitions: int,
        *,
        rename_map: dict[str, str] | None = None,
        invalid_ops: str = "error",  # "error" | "drop" | "dead_letter"
        dead_letter_dir: str | None = None,
        scrub_text: bool = True,
        min_lsn_exclusive: int = -1,
        assume_tz: str | None = None,
        pack: bool = True,
        salt: int | None = None,
        salt_buckets: int | None = None,
        keys: list[str] | None = None,
        combiner: str = "lww",
    ):
        if combiner not in ("lww", "patch"):
            raise ValueError(f"combiner must be 'lww' or 'patch', got {combiner!r}")
        self.combiner = combiner
        self.num_partitions = num_partitions
        self.keys = list(keys) if keys else list(PRIMARY_KEY)
        # salt > 1 → pack on (COARSE bucket, lsn % salt) so the phase-1
        # salted exchange also moves compressed blobs.  The bucket is
        # part % salt_buckets, NOT the full partition id: packing on
        # (part, salt) would emit parts×salt tiny blobs per batch whose
        # per-blob IPC schema overhead triples pack time and adds ~60%
        # bytes (measured); buckets×salt ≈ 4×CPUs keeps reducers busy
        # while blobs stay batch-sized.  The prereduce re-packs on the
        # true partition for phase 2.
        self.salt = salt if salt and salt > 1 else None
        if self.salt:
            self.salt_buckets = max(1, min(num_partitions, salt_buckets or 16))
        else:
            self.salt_buckets = None
        self.rename_map = {k.lower(): v for k, v in (rename_map or {}).items()}
        self.invalid_ops = invalid_ops
        self.dead_letter_dir = dead_letter_dir
        if invalid_ops == "dead_letter" and not dead_letter_dir:
            raise ValueError("invalid_ops='dead_letter' requires dead_letter_dir")
        self.scrub_text = scrub_text
        self.min_lsn_exclusive = min_lsn_exclusive
        self.assume_tz = assume_tz
        import os

        self.pack = pack and _pack_enabled()
        self._valid_ops = pa.array(list(OPS))

    def __call__(self, batch: pa.Table) -> pa.Table:
        _tune_worker_allocator()
        # header canonicalization: lowercase + rename map
        # (reference lowercases headers, opendata/opendata.py:82-84)
        names = [self.rename_map.get(n.lower(), n.lower()) for n in batch.column_names]
        batch = batch.rename_columns(names)

        # watermark pre-filter (cheap, exact filter re-done per partition)
        if self.min_lsn_exclusive >= 0:
            batch = batch.filter(pc.greater(batch.column("lsn"), self.min_lsn_exclusive))
        if len(batch) == 0:
            # keep the stream's own (renamed) schema so custom-PK lakes
            # never see a stray transcripts-schema block
            if self.pack:
                return _EMPTY_PACKED_SALTED if self.salt else _EMPTY_PACKED
            return _with_part_col(batch, self.num_partitions, self.keys)

        # op enum validation
        ok = pc.is_in(batch.column("op"), value_set=self._valid_ops)
        if not pc.all(ok).as_py():
            if self.invalid_ops == "drop":
                batch = batch.filter(ok)
            elif self.invalid_ops == "dead_letter":
                self._write_dead_letter(batch.filter(pc.invert(ok)))
                batch = batch.filter(ok)
            else:
                bad = pc.unique(batch.filter(pc.invert(ok)).column("op")).to_pylist()
                raise ValueError(f"invalid op values: {bad}")

        # cast metadata + payload to the change schema types
        # (lsn → int64, turn_idx kept as-is if wider — evolution)
        if batch.column("lsn").type != pa.int64():
            i = batch.column_names.index("lsn")
            batch = batch.set_column(i, "lsn", batch.column("lsn").cast(pa.int64()))

        # timezone localization (reference: force-localize naive
        # datetimes to US/Eastern; engine normalizes to UTC instants)
        if self.assume_tz:
            batch = localize_naive_timestamps(batch, self.assume_tz)

        # null-byte scrub, vectorized (reference scans 500 lines then
        # rewrites the file; here one pc.replace_substring per batch)
        if self.scrub_text and "text" in batch.column_names:
            i = batch.column_names.index("text")
            t = batch.column("text")
            if pa.types.is_string(t.type) or pa.types.is_large_string(t.type):
                batch = batch.set_column(
                    i, batch.schema.field(i), pc.replace_substring(t, "\x00", "")
                )

        # local combiner: keep max-lsn row per key within the batch —
        # (dead-letter write above happens first so rejected rows are
        # preserved pre-dedup).  Skew-aware gate: gathers when the
        # batch-global reduction clears 20%, OR when any single hash
        # partition would shed ≥50% of its rows — concentrated hot-key
        # duplication that a global gate misses (and which otherwise
        # serializes that partition's reducer; see
        # stages/merge.dedup_last_writer_skew_aware).
        if self.combiner == "patch":
            # patch streams fold associatively into lsn-stamped states
            # (stages/merge.patch_prereduce) — the LWW combiner would
            # DROP earlier writes of columns the last event omitted
            from ..stages.merge import patch_prereduce

            batch = patch_prereduce(batch, keys=self.keys)
            pids = partition_ids(batch.column(self.keys[0]), self.num_partitions)
        else:
            pids = partition_ids(batch.column(self.keys[0]), self.num_partitions)
            batch, pids = dedup_last_writer_skew_aware(
                batch, pids, self.num_partitions, keys=self.keys
            )
        if self.pack:
            if self.salt:
                lsn = batch.column("lsn")
                if isinstance(lsn, pa.ChunkedArray):
                    lsn = lsn.combine_chunks()
                salts = (lsn.to_numpy(zero_copy_only=False) % self.salt).astype(np.int32)
                buckets = (pids % self.salt_buckets).astype(np.int32)
                return pack_exchange(batch, buckets, salts=salts)
            return pack_exchange(batch, pids)
        return batch.append_column(PART_COL, pa.array(pids, pa.int32()))

    def _write_dead_letter(self, rejected: pa.Table) -> None:
        """Dead-letter Parquet file per rejected batch, content-hash
        named so a retried task rewrites the same file (idempotent) —
        the reference's timestamped error file on S3
        (ago/ago.py:319-344) made replay-safe.  Storage-routed
        (state/fs.py): the dead-letter dir can live on the same object
        store as the lake on a multi-node cluster."""
        import hashlib
        import io

        import pyarrow.parquet as pq

        from ..state.fs import storage_for

        store, phys = storage_for(self.dead_letter_dir)
        buf = io.BytesIO()
        pq.write_table(rejected, buf)
        data = buf.getvalue()
        sha = hashlib.sha256(data).hexdigest()[:16]
        path = store.join(phys, f"rejected-{sha}.parquet")
        if not store.exists(path):
            store.put_object(path, data)


def _with_part_col(batch: pa.Table, num_partitions: int = 1, keys: list[str] | None = None) -> pa.Table:
    key0 = (keys or PRIMARY_KEY)[0]
    pids = partition_ids(batch.column(key0), num_partitions) if len(batch) else np.array([], np.int32)
    return batch.append_column(PART_COL, pa.array(pids, pa.int32()))


def _enable_push_shuffle() -> None:
    """Select Ray's push-based sort shuffle for the replay jobs.

    The replay's one all-to-all exchange moves the full payload; the
    default pull-based sort shuffle materializes every map task's
    partitioned sub-blocks before any reduce starts — an extra full
    pass of memory traffic.  Push-based shuffle pipelines the reduce
    merge into the map wave.  Measured on the 16M-event replay at 32
    CPUs: median 29s vs 46s pull-based vs 56s hash (identical output).
    Session-global (DataContext), set when a replay pipeline is built;
    override with GRAFT_SHUFFLE=SORT_SHUFFLE_PULL_BASED|HASH_SHUFFLE.
    """
    import os

    try:
        from ray.data.context import DataContext, ShuffleStrategy
    except ImportError:  # API drift guard
        return
    name = os.environ.get("GRAFT_SHUFFLE", "SORT_SHUFFLE_PUSH_BASED")
    strategy = getattr(ShuffleStrategy, name, None)
    if strategy is not None:
        DataContext.get_current().shuffle_strategy = strategy


def _merge_group_to_state(group: pa.Table, keep_lsn: bool, keys: list[str]) -> pa.Table:
    if BLOB_COL in group.column_names:
        changes = unpack_exchange(group)
    else:
        changes = group.drop_columns([PART_COL])
    return merge_partition(None, changes, keys=keys, keep_lsn=keep_lsn)


def _salted_prereduce(
    ds,
    salt: int,
    keys: list[str] = PRIMARY_KEY,
    *,
    packed: bool = True,
    num_partitions: int | None = None,
):
    """Phase-1 of the two-phase hot-key merge: shuffle on
    (partition, lsn % salt) and pre-reduce each sub-group with the
    keep-max-lsn combiner, tombstones retained.  A conv_id receiving a
    disproportionate share of updates is thereby split across ``salt``
    parallel reducers before the final per-partition merge — the
    explicit "salted repartition of hot conv_id keys" from the north
    rule.  Correct because dedup_last_writer is associative: phase 2
    re-merges the ≤salt survivors per key in lsn order.

    With ``packed=True`` (default) the normalizer already emitted
    (part, salt, blob) rows, so BOTH exchanges of the two-phase merge
    move compressed IPC blobs — phase 1 unpacks, dedups, and re-packs
    on part alone for the final groupby."""

    def add_salt(b: pa.Table) -> pa.Table:
        s = pc.cast(
            pc.subtract(
                b.column("lsn"),
                pc.multiply(pc.divide(b.column("lsn"), pa.scalar(salt)), pa.scalar(salt)),
            ),
            pa.int32(),
        )
        return b.append_column(SALT_COL, s)

    def prereduce(g: pa.Table) -> pa.Table:
        """Dedup the (bucket, salt) sub-group, then PACK the survivors
        into compressed blob rows keyed on the TRUE partition so the
        second exchange (final groupby on part) moves ≤ salt blob rows
        per partition instead of re-shuffling the full payload — the
        same bandwidth argument as the primary packed exchange, and
        hot-key streams are where the exchange volume is highest."""
        if BLOB_COL in g.column_names:
            # packed phase-1: PART_COL carried a coarse bucket; the true
            # partition is recomputed from the key after dedup
            rows = unpack_exchange(g)
            deduped = dedup_last_writer(rows, keys=keys)
            pids = partition_ids(deduped.column(keys[0]), num_partitions)
            return pack_exchange(deduped, np.asarray(pids, np.int32))
        pid = int(g.column(PART_COL)[0].as_py())
        rows = g.drop_columns([PART_COL, SALT_COL])
        deduped = dedup_last_writer(rows, keys=keys)
        return pack_exchange(deduped, np.full(len(deduped), pid, np.int32))

    prereduce.__name__ = "salted_prereduce"
    if not packed:
        ds = ds.map_batches(add_salt, batch_format="pyarrow")
    return ds.groupby([PART_COL, SALT_COL]).map_groups(prereduce, batch_format="pyarrow")


def replay_to_table(
    changes_ds,
    *,
    num_partitions: int = 32,
    rename_map: dict[str, str] | None = None,
    keep_lsn: bool = False,
    concurrency: int | None = None,
    salt: int | None = None,
    assume_tz: str | None = None,
    keys: list[str] | None = None,
):
    """Replay a change stream into final table state with NO base lake
    (first full load — the reference's truncate-and-load,
    oracle/oracle.py:286-406). Returns a Dataset of the final rows.

    ``salt=S`` enables the two-phase hot-key merge: sub-shuffle on
    (partition, lsn%S) with a parallel pre-reduce, then the final
    per-partition merge — for update-heavy streams where single
    conversations would otherwise serialize one reducer."""
    _enable_push_shuffle()
    keys = list(keys) if keys else list(PRIMARY_KEY)
    ds = _normalized(
        changes_ds,
        ChangeNormalizer(
            num_partitions,
            rename_map=rename_map,
            assume_tz=assume_tz,
            keys=keys,
            # salt > 1 → pack on (bucket, salt) so BOTH exchanges of
            # the two-phase merge move compressed blobs
            salt=salt,
            salt_buckets=_salt_buckets(salt),
        ),
        concurrency,
    )
    if salt and salt > 1:
        ds = _salted_prereduce(
            ds, salt, keys=keys, packed=_pack_enabled(), num_partitions=num_partitions
        )
    return ds.groupby(PART_COL).map_groups(
        lambda g: _merge_group_to_state(g, keep_lsn, keys), batch_format="pyarrow"
    )


def _normalized(changes_ds, normalizer: ChangeNormalizer, concurrency):
    """Stateless tasks by default (elastic); an actor pool when the
    caller pins ``concurrency`` (heavy rename maps / validators built
    once per actor)."""
    if concurrency is None:
        return changes_ds.map_batches(normalizer, batch_format="pyarrow")
    return changes_ds.map_batches(
        ChangeNormalizer,
        fn_constructor_kwargs={
            "num_partitions": normalizer.num_partitions,
            "rename_map": normalizer.rename_map,
            "invalid_ops": normalizer.invalid_ops,
            "dead_letter_dir": normalizer.dead_letter_dir,
            "scrub_text": normalizer.scrub_text,
            "min_lsn_exclusive": normalizer.min_lsn_exclusive,
            "assume_tz": normalizer.assume_tz,
            "pack": normalizer.pack,
            "keys": normalizer.keys,
            "combiner": normalizer.combiner,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class _MergeCommit:
    """Per-partition merge + exactly-once commit (runs inside
    map_groups tasks; constructs a lake handle lazily per process).

    ``mode="merge"``: copy-on-write — read the base run, apply the
    LWW merge, commit the fully-merged payload (reads pay nothing).
    ``mode="delta"``: merge-on-read — commit the deduped change run
    (tombstones included) without touching the base, O(batch) per
    incremental replay; runs fold together at read and via
    ``compact_after`` (the min-heap-over-sorted-runs layout from
    SURVEY.md §4 step 4, materialized as files instead of heap state).
    """

    __name__ = "merge_commit"  # map_groups wraps fn and reads __name__

    def __init__(
        self,
        lake_root: str,
        mode: str = "merge",
        compact_after: int = 8,
        compact_policy: str = "tiered",
        txn: str | None = None,
    ):
        if mode not in ("merge", "delta", "snapshot", "patch"):
            raise ValueError(
                f"mode must be 'merge', 'delta', 'snapshot' or 'patch', got {mode!r}"
            )
        if compact_policy not in ("tiered", "full"):
            raise ValueError(f"compact_policy must be 'tiered' or 'full', got {compact_policy!r}")
        self.lake_root = lake_root
        self.mode = mode
        self.compact_after = compact_after
        self.compact_policy = compact_policy
        self.txn = txn
        self._lake = None

    def __getstate__(self):
        return {
            "lake_root": self.lake_root,
            "mode": self.mode,
            "compact_after": self.compact_after,
            "compact_policy": self.compact_policy,
            "txn": self.txn,
            "_lake": None,
        }

    @property
    def lake(self):
        if self._lake is None:
            from ..state.lake import TranscriptLake

            self._lake = TranscriptLake(self.lake_root)
        return self._lake

    def __call__(self, group: pa.Table) -> pa.Table:
        _tune_worker_allocator()
        t0 = time.perf_counter()
        pid = int(group.column(PART_COL)[0].as_py())
        if BLOB_COL in group.column_names:
            changes = unpack_exchange(group)
        else:
            changes = group.drop_columns([PART_COL])

        wm = self.lake.watermark(pid)
        if self.mode == "patch":
            return self._apply_patch(pid, wm, changes, t0)
        changes = changes.filter(pc.greater(changes.column("lsn"), wm))
        n_events = len(changes)
        if n_events == 0:  # fully below watermark → idempotent no-op
            return _metrics_row(pid, wm, wm, 0, self.lake.manifest(pid), 0.0)

        high_lsn = int(pc.max(changes.column("lsn")).as_py())
        lineage = {
            "lsn_lo": int(pc.min(changes.column("lsn")).as_py()),
            "lsn_hi": high_lsn,
            "events_applied": n_events,
        }
        keys = self.lake.primary_key
        if self.mode == "delta":
            run = dedup_last_writer(changes, keys=keys)  # key-sorted, tombstones kept
            dt = time.perf_counter() - t0
            lineage.update({"rows_after": -1, "merge_sec": round(dt, 4)})
            m = self.lake.commit_partition(
                pid, run, high_lsn, lineage_record=lineage, mode="delta", txn=self.txn
            )
            # compaction publishes directly, so it must not run inside
            # a staged (not-yet-committed) transaction
            if (
                self.txn is None
                and self.compact_after
                and self.lake.run_count(pid) >= self.compact_after
            ):
                # size-tiered by default: fold the (small) delta runs
                # and leave the base alone until deltas amortize a
                # full rewrite — K tails cost O(K·delta) + amortized
                # O(partition), not K·O(partition)
                m = (
                    self.lake.compact_partition_adaptive(pid)
                    if self.compact_policy == "tiered"
                    else self.lake.compact_partition(pid)
                )
        else:
            base = self.lake.read_partition(pid)
            merged = merge_partition(base, changes, keys=keys)
            if self.mode == "snapshot":
                # delete-stale: the incoming batch is a FULL snapshot of
                # this partition's keys, so any merged row whose PK is
                # absent from it was deleted upstream — the reference's
                # anti-semi-join DELETE .. USING (SELECT pk FROM prod
                # EXCEPT SELECT pk FROM staging)
                # (postgres/postgres.py:450-495), applied per partition.
                keep = pc.is_in(
                    _pk_strings(merged, keys), value_set=pc.unique(_pk_strings(changes, keys))
                )
                n_stale = len(merged) - pc.sum(pc.cast(keep, pa.int64())).as_py()
                merged = merged.filter(keep)
                lineage["deleted_stale"] = int(n_stale)
            dt = time.perf_counter() - t0
            lineage.update(
                {
                    "rows_before": len(base),
                    "rows_after": len(merged),
                    "merge_sec": round(dt, 4),
                    "events_per_sec": round(n_events / dt, 1) if dt > 0 else None,
                }
            )
            m = self.lake.commit_partition(
                pid, merged, high_lsn, lineage_record=lineage, txn=self.txn
            )
        return _metrics_row(pid, wm, high_lsn, n_events, m, dt)

    def _apply_patch(self, pid: int, wm: int, states: pa.Table, t0: float) -> pa.Table:
        """Patch-mode commit: ``states`` are lsn-stamped
        ``patch_prereduce`` rows (one per key per upstream batch), not
        raw events — a row-level ``lsn > wm`` filter can no longer
        express exactly-once, so the base enters the resolve stamped at
        the watermark instead and stale components lose per column
        (stages/merge.merge_partition_patch)."""
        from ..stages.merge import merge_partition_patch

        keys = self.lake.primary_key
        n_states = len(states)
        if n_states == 0:  # e.g. all-empty packed blocks carry the raw schema
            return _metrics_row(pid, wm, wm, 0, self.lake.manifest(pid), 0.0)
        hi_wr = pc.max(states.column("wr_lsn")).as_py()
        hi_del = pc.max(states.column("del_lsn")).as_py()
        high_lsn = max(int(hi_wr if hi_wr is not None else -1),
                       int(hi_del if hi_del is not None else -1))
        if high_lsn <= wm:  # fully stale → idempotent no-op
            return _metrics_row(pid, wm, wm, 0, self.lake.manifest(pid), 0.0)
        base = self.lake.read_partition(pid)
        merged = merge_partition_patch(base, states, keys=keys, watermark=wm)
        dt = time.perf_counter() - t0
        lineage = {
            "lsn_lo": int(wm + 1),
            "lsn_hi": high_lsn,
            "events_applied": n_states,
            "rows_before": len(base),
            "rows_after": len(merged),
            "merge_sec": round(dt, 4),
        }
        m = self.lake.commit_partition(
            pid, merged, high_lsn, lineage_record=lineage, txn=self.txn
        )
        return _metrics_row(pid, wm, high_lsn, n_states, m, dt)


def validate_replay_sample(
    changes_ds,
    *,
    sample: int = 500,
    check_ops: bool = True,
    geom_col: str | None = None,
    expected_geom_kind: str | None = None,
    keys: list[str] = PRIMARY_KEY,
) -> None:
    """Fail-fast sanity gate over the first ``sample`` rows, run on the
    driver BEFORE the shuffle — the reference's pre-append geometry
    scan (``ago/ago.py:516-551``: assert the first 500 rows' WKT kind
    matches the declared type, hard-fail on unknown) generalized to
    the CDC stream: required columns, PK/lsn nullability, op enum, and
    optionally the EWKT kind of a geometry column.

    A poisoned WAL therefore dies in milliseconds instead of after a
    full normalize+shuffle; the per-batch validation in the normalizer
    still guards the remaining rows.
    """
    # take_batch alone (no .limit): Ray's limit-pushdown rewrite drops
    # children from a ≥3-way Union plan (plan_union_op asserts ≥2) —
    # take_batch already stops after `sample` rows with backpressure
    try:
        head = changes_ds.take_batch(sample, batch_format="pyarrow")
    except ValueError:
        # empty stream (e.g. an idle follow_wal cycle, or a fully
        # watermark-pruned WAL): nothing to validate, replay no-ops
        return
    missing = [c for c in ("op", "lsn", *keys) if c not in head.column_names]
    if missing:
        raise ValueError(f"replay sample missing required columns: {missing}")
    for c in (*keys, "lsn"):
        n_null = pc.sum(pc.cast(pc.is_null(head.column(c)), pa.int64())).as_py() or 0
        if n_null:
            raise ValueError(f"replay sample: {n_null} null {c!r} values in first {len(head)} rows")
    if check_ops:
        ok = pc.is_in(head.column("op"), value_set=pa.array(list(OPS)))
        if not pc.all(ok).as_py():
            bad = pc.unique(head.filter(pc.invert(ok)).column("op")).to_pylist()
            raise ValueError(f"replay sample: invalid op values {bad}")
    if geom_col and expected_geom_kind:
        shapes = head.column(geom_col)
        kind = pc.struct_field(
            pc.extract_regex(shapes, r"^(?:SRID=[0-9]+;)?(?P<kind>[A-Z]+)"), "kind"
        )
        want = pa.array([expected_geom_kind.upper(), "MULTI" + expected_geom_kind.upper()])
        ok = pc.is_in(kind, value_set=want)
        n_bad = len(head) - (pc.sum(pc.cast(pc.fill_null(ok, False), pa.int64())).as_py() or 0)
        if n_bad:
            raise ValueError(
                f"replay sample: {n_bad} rows whose geometry kind != {expected_geom_kind!r}"
            )


def _pk_strings(t: pa.Table, keys: list[str] = PRIMARY_KEY):
    """Composite-PK membership key: key columns joined with ␟ (unit
    separator cannot appear in any side) — vectorized string join."""
    cols = [pc.cast(t.column(k), pa.string()) for k in keys]
    if len(cols) == 1:
        return cols[0]
    return pc.binary_join_element_wise(*cols, "\x1f")


def _metrics_row(pid, wm_before, wm_after, n_events, manifest, secs) -> pa.Table:
    return pa.table(
        {
            "partition_id": pa.array([pid], pa.int32()),
            "watermark_before": pa.array([wm_before], pa.int64()),
            "watermark_after": pa.array([wm_after], pa.int64()),
            "events_applied": pa.array([n_events], pa.int64()),
            "row_count": pa.array([manifest.row_count if manifest else 0], pa.int64()),
            "merge_sec": pa.array([round(secs, 4)], pa.float64()),
        }
    )


def replay_into_lake(
    lake_root: str,
    changes_ds,
    *,
    rename_map: dict[str, str] | None = None,
    invalid_ops: str = "error",
    dead_letter_dir: str | None = None,
    concurrency: int | None = None,
    mode: str = "merge",
    compact_after: int = 8,
    compact_policy: str = "tiered",
    salt: int | None = None,
    assume_tz: str | None = None,
    validate_sample: int | None = 500,
    txn: str | None = None,
):
    """Replay a change stream into an existing lake. Exactly-once:
    events at or below each partition's committed watermark are
    skipped, so re-running after a crash (or replaying an overlapping
    LSN range) converges to the same state.

    ``mode="merge"`` rewrites each touched partition (copy-on-write —
    best for full replays); ``mode="delta"`` appends O(batch) change
    runs resolved at read and folded by compaction every
    ``compact_after`` runs — best for frequent small incremental
    tails, where rewriting the partition per tail would be
    O(lake size) per run.  ``mode="snapshot"`` treats the stream as a
    FULL table snapshot: after the LWW upsert, base rows whose PK is
    absent from the snapshot are deleted (the reference's optional
    delete-stale anti-join, postgres/postgres.py:450-495); snapshot
    rows must carry lsn above every partition watermark.
    ``mode="patch"`` ingests a SPARSE-diff (Debezium-style) stream
    where an update's NULL column means KEEP the prior value: batches
    fold associatively into lsn-stamped per-column states before the
    shuffle (stages/merge.patch_prereduce), and the per-partition
    merge resolves them against the base stamped at the watermark —
    per-column last-non-null-writer after the key's last tombstone,
    exactly-once included (merge_partition_patch).

    Returns a pandas DataFrame of per-partition metrics (small —
    one row per touched partition)."""
    from ..state.lake import TranscriptLake

    if txn is not None and mode == "snapshot":
        # the unseen-partition truncation sweep publishes directly;
        # staging it would need a txn-aware sweep nobody needs yet
        raise ValueError("mode='snapshot' cannot run inside a transaction")
    if salt and salt > 1 and mode == "patch":
        # the salted two-phase prereduce folds with the LWW combiner;
        # patch states would need a salt-aware resolve nobody needs yet
        # (the patch prereduce already collapses hot keys to one state
        # row per batch, which is the salting win)
        raise ValueError("mode='patch' does not support salting")
    lake = TranscriptLake(lake_root)
    if (gen := lake._inflight_rescale_generation()) is not None:
        # writing during a rescale can publish stale children: a split
        # child snapshots its parent at watermark W; a commit advancing
        # the parent past W lands only in the CURRENT generation's
        # files, and the flip would silently drop it.  (The rescale
        # also re-verifies watermarks before flipping — this guard
        # gives writers the clear error instead of racing it.)
        raise RuntimeError(
            f"lake {lake_root} has a rescale to generation {gen} in progress; "
            "finish it (re-run the rescale) or lake.abort_rescale() before replaying"
        )
    keys = lake.primary_key
    if validate_sample:
        # fail-fast head-N gate before any shuffle work; op-enum check
        # only when invalid ops would hard-error anyway (drop /
        # dead_letter streams legitimately carry bad ops)
        validate_replay_sample(
            changes_ds, sample=validate_sample, check_ops=(invalid_ops == "error"), keys=keys
        )
    _enable_push_shuffle()
    ds = _normalized(
        changes_ds,
        ChangeNormalizer(
            lake.num_partitions,
            rename_map=rename_map,
            invalid_ops=invalid_ops,
            dead_letter_dir=dead_letter_dir,
            keys=keys,
            # snapshot mode keeps below-watermark rows through the
            # shuffle: their PRESENCE is what marks a partition as
            # covered by the snapshot (the unseen-partition sweep
            # truncates the rest), and the per-group watermark filter
            # still no-ops re-applied events.
            min_lsn_exclusive=(-1 if mode == "snapshot" else lake.min_watermark()),
            assume_tz=assume_tz,
            salt=salt,
            salt_buckets=_salt_buckets(salt),
            combiner=("patch" if mode == "patch" else "lww"),
        ),
        concurrency,
    )
    if salt and salt > 1:
        ds = _salted_prereduce(
            ds,
            salt,
            keys=keys,
            packed=_pack_enabled(),
            num_partitions=lake.num_partitions,
        )
    metrics = ds.groupby(PART_COL).map_groups(
        _MergeCommit(
            lake_root,
            mode=mode,
            compact_after=compact_after,
            compact_policy=compact_policy,
            txn=txn,
        ),
        batch_format="pyarrow",
    )
    out = metrics.to_pandas()
    if mode == "snapshot" and len(out):
        stale = _truncate_unseen_partitions(
            lake, touched=set(out["partition_id"]), snapshot_lsn=int(out["watermark_after"].max())
        )
        if len(stale):
            import pandas as pd

            out = pd.concat([out, stale], ignore_index=True)
    return out


def replay_transactional(
    tables: list[tuple[str, object]],
    txn_dir: str,
    txn_id: str,
    **replay_kwargs,
):
    """Replay one LSN window into SEVERAL lakes with all-or-nothing
    visibility — the binlog-router transaction (a consumer must never
    observe table A advanced past table B for the same window; the
    reference gets this from a single DB transaction,
    db2/db2.py:358-594, which multiple independent lakes don't have).

    ``tables`` is ``[(lake_root, changes_dataset), ...]``.  Protocol
    (state/txn.py): recover any crashed transaction first (roll
    committed ones forward, roll orphaned stages back), stage every
    lake's replay under ``txn_id`` (manifests invisible), write the
    ONE atomic transaction record — the commit point — then publish
    each lake's staged manifests and retire the record.  A crash at
    any point either fully disappears (pre-record: stages roll back
    and the published watermarks make the re-replay exactly-once) or
    fully lands (post-record: recovery finishes the publishes).

    Returns per-table metrics DataFrames (same shape as
    :func:`replay_into_lake`)."""
    from ..state.txn import TxnLog

    roots = [r for r, _ in tables]
    log = TxnLog(txn_dir)
    log.recover(roots)
    metrics = [
        replay_into_lake(root, ds, txn=txn_id, **replay_kwargs) for root, ds in tables
    ]
    log.commit(txn_id, roots)  # the commit point
    log.publish(txn_id, roots)
    return metrics


def _truncate_unseen_partitions(lake, *, touched: set, snapshot_lsn: int):
    """Snapshot-mode sweep for partitions the snapshot stream carried
    NO rows for: every key of such a partition vanished upstream, so
    its rows are all stale and the partition is truncated to empty
    (the table-wide reach of the reference's DELETE .. USING EXCEPT,
    postgres/postgres.py:450-495 — the per-group anti-join in
    ``_MergeCommit`` can only see partitions the groupby visits).

    One Ray task per non-empty unseen partition (parallel, and
    idempotent: re-running commits the same empty state at the same
    ``snapshot_lsn``).  Returns a metrics DataFrame shaped like the
    merge metrics (one row per truncated partition).
    """
    import pandas as pd
    import ray

    candidates = []
    for pid in range(lake.num_partitions):
        if pid in touched or lake.watermark(pid) >= snapshot_lsn:
            continue
        m = lake.manifest(pid)
        if m is None or m.row_count == 0:
            continue  # already empty (row_count == -1 means unknown → sweep)
        candidates.append(pid)
    if not candidates:
        return pd.DataFrame()

    root = lake.root

    @ray.remote(num_cpus=1)
    def truncate(pid: int) -> pa.Table:
        from ..state.lake import TranscriptLake

        lk = TranscriptLake(root)
        t0 = time.perf_counter()
        base = lk.read_partition(pid)
        wm = lk.watermark(pid)
        if len(base) == 0:  # delta runs resolved to empty — just stamp
            empty = base
        else:
            empty = base.schema.empty_table()
        m = lk.commit_partition(
            pid,
            empty,
            snapshot_lsn,
            lineage_record={
                "lsn_lo": snapshot_lsn,
                "lsn_hi": snapshot_lsn,
                "events_applied": 0,
                "deleted_stale": len(base),
                "rows_before": len(base),
                "rows_after": 0,
            },
        )
        return _metrics_row(pid, wm, snapshot_lsn, 0, m, time.perf_counter() - t0)

    tables = ray.get([truncate.remote(p) for p in candidates])
    return pa.concat_tables(tables).to_pandas()


def follow_wal(
    lake_root: str,
    wal_dir: str,
    *,
    poll_interval: float = 2.0,
    max_cycles: int | None = None,
    idle_stop: int | None = 3,
    sleep=None,
    mode: str = "delta",
    advance_watermarks: bool = True,
    **replay_kwargs,
):
    """Continuous WAL tail — the binlog ``follow`` loop (the always-on
    version of the reference's cron-scheduled extract→upsert jobs):
    poll the WAL directory, replay everything above the lake's MIN
    committed watermark, record a per-cycle lag row, repeat.

    Cost of a quiet cycle is one directory listing: segment filenames
    encode their lsn range, so fully-applied files are pruned before
    any read (sources/changelog.py), and per-partition watermarks make
    redelivery of the boundary segment a no-op (exactly-once).  A
    producer may keep appending segments while the loop runs — each
    cycle picks up whatever is new.

    Stops after ``idle_stop`` consecutive cycles that applied nothing
    (``None`` = run forever) or after ``max_cycles`` total.  ``sleep``
    is a seam for tests (it doubles as the producer hook: tests append
    WAL segments from it).  Returns one metrics row per cycle:
    (cycle, events_applied, cycle_sec, events_per_sec, min_watermark,
    max_watermark, watermark_lag, idle)."""
    import time as _time

    from ..sources.changelog import read_change_log
    from ..state.lake import TranscriptLake

    do_sleep = sleep if sleep is not None else _time.sleep
    lake = TranscriptLake(lake_root)
    cycles = []
    idle = 0
    c = 0
    while max_cycles is None or c < max_cycles:
        wm = lake.min_watermark()
        t0 = time.perf_counter()
        m = replay_into_lake(
            lake_root,
            read_change_log(wal_dir, min_lsn_exclusive=wm),
            mode=mode,
            **replay_kwargs,
        )
        dt = time.perf_counter() - t0
        applied = int(m["events_applied"].sum()) if len(m) else 0
        if applied and advance_watermarks:
            # watermark heartbeat: the cycle consumed the WAL up to the
            # highest lsn any partition applied, so partitions that
            # received nothing have still seen everything below it —
            # stamp them forward (metadata-only) so a quiet partition
            # cannot pin min_watermark and force every later cycle to
            # re-decode already-applied segments.  Sound under the WAL
            # contract the whole engine assumes: segments deliver in
            # lsn order (no late arrivals below a delivered range).
            high = int(m["watermark_after"].max())
            for pid, wm in lake.watermarks().items():
                if wm < high:
                    lake.stamp_watermark(pid, high)
        wms = lake.watermarks().values()
        lo, hi = min(wms), max(wms)
        cycles.append(
            {
                "cycle": c,
                "events_applied": applied,
                "cycle_sec": round(dt, 4),
                "events_per_sec": round(applied / dt) if dt > 0 else 0,
                "min_watermark": lo,
                "max_watermark": hi,
                "watermark_lag": hi - lo,
                "idle": applied == 0,
            }
        )
        c += 1
        idle = idle + 1 if applied == 0 else 0
        if idle_stop is not None and idle >= idle_stop:
            break
        do_sleep(poll_interval)
    return pd.DataFrame(cycles)
