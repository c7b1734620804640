"""Incremental materialized-view maintenance from the WAL.

The replay path keeps per-key LATEST STATE; this module keeps a
per-key ADDITIVE AGGREGATE (change counts by op, character volume,
high lsn) maintained incrementally: each maintenance run folds only
the NEW change rows into the stored view — never recomputing from the
full WAL — yet the result is always equal to the direct groupby over
everything replayed so far (pinned in tests and by the driver oracle).

This is the CDC-engine feature the reference approximates with
downstream full refreshes (its OpenData/enterprise copies re-extract
the whole table per run — opendata/opendata.py, db2.py); here the
10^10-event target makes recompute-from-scratch a non-starter, so the
view must be maintained in O(delta).

Shape (mirrors the replay's exactly-once design one-for-one):
- narrow projection of the change stream (conv_id, lsn, op, chars) —
  only ~30 bytes/row enter the exchange;
- ONE shuffle on the same ``partition_ids`` hash the replay uses;
- per-partition task: watermark-filter (lsn > stored high_lsn, so a
  re-delivered batch is a no-op), one vectorized Arrow group_by of
  the delta, outer-add onto the stored aggregate rows, commit through
  the SAME atomic content-hash manifest machinery as the lake
  (idempotent under retry).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import partition_ids
from ..state.lake import TranscriptLake

PART_COL = "_part"

VIEW_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_changes", pa.int64()),
        ("n_inserts", pa.int64()),
        ("n_updates", pa.int64()),
        ("n_deletes", pa.int64()),
        ("sum_text_chars", pa.int64()),
        ("high_lsn", pa.int64()),
    ]
)

_ADD_COLS = ("n_changes", "n_inserts", "n_updates", "n_deletes", "sum_text_chars")


def create_view(root: str, num_partitions: int = 16) -> TranscriptLake:
    """A view is a small lake: per-partition parquet + atomic
    manifests; only the payload schema differs."""
    return TranscriptLake.create(
        root, num_partitions=num_partitions, schema=VIEW_SCHEMA, primary_key=["conv_id"]
    )


def _delta_aggregate(changes: pa.Table) -> pa.Table:
    """One vectorized group_by turning raw change rows into per-key
    additive deltas (+ per-key max lsn)."""
    op = changes.column("op")
    t = pa.table(
        {
            "conv_id": changes.column("conv_id"),
            "n_changes": pa.array(np.ones(len(changes), np.int64)),
            "n_inserts": pc.cast(pc.equal(op, "insert"), pa.int64()),
            "n_updates": pc.cast(pc.equal(op, "update"), pa.int64()),
            "n_deletes": pc.cast(pc.equal(op, "delete"), pa.int64()),
            "sum_text_chars": pc.cast(changes.column("chars"), pa.int64()),
            "high_lsn": changes.column("lsn"),
        }
    )
    g = t.group_by("conv_id").aggregate(
        [(c, "sum") for c in _ADD_COLS] + [("high_lsn", "max")]
    )
    # select by generated aggregate names, not position — pyarrow's
    # keys-first column ordering has differed across major versions
    cols = {"conv_id": g.column("conv_id")}
    for c in _ADD_COLS:
        cols[c] = g.column(f"{c}_sum")
    cols["high_lsn"] = g.column("high_lsn_max")
    return pa.table(cols)


def _fold(base: pa.Table, delta: pa.Table) -> pa.Table:
    """Outer-add the delta onto the stored aggregate (numpy
    searchsorted alignment — both sides keyed by conv_id)."""
    if len(base) == 0:
        return delta.sort_by("conv_id").cast(VIEW_SCHEMA)
    bkeys = np.asarray(base.column("conv_id"), dtype=object)
    dkeys = np.asarray(delta.column("conv_id"), dtype=object)
    all_keys = np.unique(np.concatenate([bkeys, dkeys]))
    bpos = np.searchsorted(all_keys, bkeys)
    dpos = np.searchsorted(all_keys, dkeys)
    cols: dict[str, pa.Array] = {"conv_id": pa.array(all_keys, pa.string())}
    for c in _ADD_COLS:
        acc = np.zeros(len(all_keys), np.int64)
        acc[bpos] = base.column(c).to_numpy(zero_copy_only=False)
        np.add.at(acc, dpos, delta.column(c).to_numpy(zero_copy_only=False))
        cols[c] = pa.array(acc)
    hi = np.full(len(all_keys), -1, np.int64)
    hi[bpos] = base.column("high_lsn").to_numpy(zero_copy_only=False)
    np.maximum.at(hi, dpos, delta.column("high_lsn").to_numpy(zero_copy_only=False))
    cols["high_lsn"] = pa.array(hi)
    return pa.table(cols).cast(VIEW_SCHEMA)


class _ViewCommit:
    """Per-partition fold + exactly-once commit (same lazy-handle,
    watermark-filter, atomic-manifest shape as replay._MergeCommit)."""

    __name__ = "view_commit"

    def __init__(self, view_root: str):
        self.view_root = view_root
        self._lake = None

    def __getstate__(self):
        return {"view_root": self.view_root, "_lake": None}

    @property
    def lake(self):
        if self._lake is None:
            self._lake = TranscriptLake(self.view_root)
        return self._lake

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = int(group.column(PART_COL)[0].as_py())
        changes = group.drop_columns([PART_COL])
        wm = self.lake.watermark(pid)
        changes = changes.filter(pc.greater(changes.column("lsn"), wm))
        if len(changes) == 0:  # idempotent no-op on re-delivery
            return pa.table({"pid": pa.array([pid], pa.int32()), "applied": pa.array([0], pa.int64())})
        delta = _delta_aggregate(changes)
        m = self.lake.manifest(pid)
        base = self.lake.read_partition(pid, resolve=False) if m and m.files else VIEW_SCHEMA.empty_table()
        folded = _fold(base, delta)
        high = int(pc.max(changes.column("lsn")).as_py())
        self.lake.commit_partition(
            pid,
            folded,
            high,
            lineage_record={"view_delta_rows": len(changes), "keys_after": len(folded)},
        )
        return pa.table(
            {"pid": pa.array([pid], pa.int32()), "applied": pa.array([len(changes)], pa.int64())}
        )


def maintain_view(view_root: str, changes_ds) -> int:
    """Fold a change stream into the view; returns events applied.
    O(delta) work: only the narrow projection is shuffled, only
    partitions that received rows are rewritten."""
    lake = TranscriptLake(view_root)
    nparts = lake.num_partitions

    def prep(b: pa.Table) -> pa.Table:
        chars = pc.coalesce(pc.utf8_length(b.column("text")), pa.scalar(0, pa.int32()))
        t = pa.table(
            {
                "conv_id": b.column("conv_id"),
                "lsn": b.column("lsn"),
                "op": b.column("op"),
                "chars": pc.cast(chars, pa.int64()),
            }
        )
        pids = partition_ids(t.column("conv_id"), nparts) if len(t) else np.array([], np.int32)
        return t.append_column(PART_COL, pa.array(pids, pa.int32()))

    res = (
        changes_ds.map_batches(prep, batch_format="pyarrow")
        .groupby(PART_COL)
        .map_groups(_ViewCommit(view_root), batch_format="pyarrow")
        .to_pandas()  # ≤ num_partitions metric rows
    )
    return 0 if res.empty else int(res["applied"].sum())


def read_view(view_root: str) -> pa.Table:
    """Whole-view snapshot (tiny: one row per key)."""
    lake = TranscriptLake(view_root)
    parts = [
        lake.read_partition(pid, resolve=False)
        for pid in range(lake.num_partitions)
        if (m := lake.manifest(pid)) and m.files
    ]
    if not parts:
        return VIEW_SCHEMA.empty_table()
    return pa.concat_tables(parts).cast(VIEW_SCHEMA)
