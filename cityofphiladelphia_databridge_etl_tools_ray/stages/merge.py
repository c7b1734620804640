"""The LWW merge kernel — pure ``pyarrow.Table`` in / out.

Semantics (the heart of the engine, generalizing the reference's
upsert SQL):

- upsert (op ∈ {insert, update}) = full-row replace, newest ``lsn``
  wins per (conv_id, turn_idx) — the ``INSERT .. ON CONFLICT ON
  CONSTRAINT pk DO UPDATE SET col = EXCLUDED.col`` statement at
  reference databridge_etl_tools/postgres/postgres.py:497-573.
- delete = tombstone; the row disappears unless a later-lsn upsert
  re-inserts it — the ``DELETE FROM prod USING (… EXCEPT …)``
  anti-join at reference postgres/postgres.py:450-495, expressed as
  explicit delete events.
- duplicate events (same (conv_id, turn_idx, lsn) replayed twice)
  collapse to one — the reference's AGO dedup-on-2-hits rule
  (ago/ago.py:1070-1078).
- ties on identical lsn: the later input row wins (Arrow sorts are
  stable), mirroring "later statement wins" in sequential SQL replay.

Performance contract: the wide payload columns (transcript ``text``
can be KiB-sized cells) are gathered exactly ONCE.  All ordering work
happens on a narrow projection of the key columns —
``pc.sort_indices`` over (conv_id, turn_idx, lsn) — and the winning
row indices are applied to the full table in a single ``take``.
Sorting the whole table (``Table.sort_by``) would gather the text
payload once per sort; at lake scale that triples the memory traffic
of every merge.

Base rows participate with a sentinel ``lsn = -1`` — callers
guarantee (via the partition watermark) that every change in
``changes`` has lsn greater than the lsn that produced the base rows,
so any change beats any base row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import PRIMARY_KEY, promote_schemas, conform

_META_COLS = ("op", "lsn")


def _keep_last_mask(table: pa.Table, keys: list[str]) -> pa.Array:
    """Boolean mask keeping the LAST row of each consecutive run of
    equal ``keys`` values.  ``table`` must already be sorted by keys."""
    n = len(table)
    if n <= 1:
        return pa.array([True] * n)
    same_as_next = None
    for k in keys:
        col = table.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()  # pyarrow>=15: returns a single Array
        # key columns are non-nullable by contract, so plain equality.
        eq = pc.equal(col.slice(0, n - 1), col.slice(1))
        same_as_next = eq if same_as_next is None else pc.and_(same_as_next, eq)
    keep = pc.invert(same_as_next)
    return pa.concat_arrays([keep, pa.array([True])])


def _winner_indices(
    table: pa.Table, keys: list[str], order_col: str
) -> pa.Array:
    """Row indices of the max-``order_col`` row per key, in key-sorted
    order.  Touches only the narrow key columns; stable sort makes the
    later input row win on order ties."""
    narrow = table.select(list(keys) + [order_col])
    sort_idx = pc.sort_indices(
        narrow,
        sort_keys=[(k, "ascending") for k in keys] + [(order_col, "ascending")],
    )
    sorted_keys = narrow.take(sort_idx)
    keep = _keep_last_mask(sorted_keys, keys)
    return sort_idx.filter(keep)


def dedup_last_writer(
    changes: pa.Table,
    keys: list[str] = PRIMARY_KEY,
    order_col: str = "lsn",
    min_reduction: float = 0.0,
) -> pa.Table:
    """Keep only the highest-``order_col`` row per key (output in
    key-sorted order).

    Associative: applying this per input batch (the pre-shuffle
    combiner) and again after the shuffle yields the same result as
    one global pass — which is what makes hot-key pre-reduction safe.

    ``min_reduction``: skip the (full-payload-width) gather unless it
    would drop at least this fraction of rows.  The winner count is
    known from the narrow key sort alone, so a low-duplication batch
    costs only the narrow pass — paying a whole-batch copy to shed 5%
    of rows loses on memory traffic; the post-shuffle merge dedups
    exactly anyway.
    """
    if len(changes) == 0:
        return changes
    win = _winner_indices(changes, keys, order_col)
    if min_reduction > 0.0 and len(win) >= len(changes) * (1.0 - min_reduction):
        return changes
    return changes.take(win)


def dedup_last_writer_skew_aware(
    changes: pa.Table,
    partition_of_row,
    num_partitions: int,
    keys: list[str] = PRIMARY_KEY,
    order_col: str = "lsn",
    global_gate: float = 0.2,
    partition_gate: float = 0.5,
):
    """Pre-shuffle combiner with a SKEW-AWARE gather gate.

    The plain ``min_reduction`` gate compares winner count to the whole
    batch — but hot-key duplication is concentrated: a stream sending
    10% of its events to one conversation shows only ~10% batch-global
    reduction (below any sane global gate) while that conversation's
    merge partition receives 10% of ALL rows and serializes one reducer
    (measured: a 1.75M-row reduce block vs 63k mean; an 18s merge task
    vs 1.7s mean).  So: gather if the batch-global reduction clears
    ``global_gate``, OR if any single hash partition would shed at
    least ``partition_gate`` of ITS rows — the skew signature.  Both
    tests need only the narrow key sort + two bincounts.

    Returns ``(table, pids)`` where ``pids`` is the partition id per
    OUTPUT row (computed once, reused by the caller's routing column).
    """
    import numpy as np

    pids = np.asarray(partition_of_row, dtype=np.int32)
    if len(changes) == 0:
        return changes, pids
    win = _winner_indices(changes, keys, order_col)
    if len(win) == len(changes):
        return changes, pids
    win_np = win.to_numpy(zero_copy_only=False)
    if len(win) < len(changes) * (1.0 - global_gate):
        return changes.take(win), pids[win_np]
    tot = np.bincount(pids, minlength=num_partitions)
    kept = np.bincount(pids[win_np], minlength=num_partitions)
    dropped = tot - kept
    hot = dropped >= partition_gate * np.maximum(tot, 1)
    if hot.any():
        return changes.take(win), pids[win_np]
    return changes, pids


def merge_partition(
    base: pa.Table | None,
    changes: pa.Table,
    *,
    keys: list[str] = PRIMARY_KEY,
    keep_lsn: bool = False,
) -> pa.Table:
    """Merge a batch of change events into a base partition table.

    ``base`` holds payload columns only (no op/lsn); ``changes`` holds
    op + lsn + payload.  Schema evolution between the two is resolved
    here with the promotion lattice (column add, int/float/ts widen).
    Output is sorted by ``keys`` (the lake's clustered order, which
    also makes the merge output deterministic regardless of input
    block arrival order).
    """
    if len(changes) == 0:
        if base is None:
            return pa.table({})
        out = base.sort_by([(k, "ascending") for k in keys])
        if keep_lsn:
            out = out.append_column("lsn", pa.array(np.full(len(out), -1, np.int64)))
        return out

    payload_fields = [f for f in changes.schema if f.name not in _META_COLS]
    payload_schema = pa.schema(payload_fields)
    if base is not None and len(base) > 0:
        target = promote_schemas(base.schema, payload_schema)
        full_schema = pa.schema(
            [pa.field("op", pa.string()), pa.field("lsn", pa.int64())] + list(target)
        )
        base_full = base.add_column(
            0, pa.field("lsn", pa.int64()), pa.array(np.full(len(base), -1, np.int64))
        )
        base_full = base_full.add_column(
            0, pa.field("op", pa.string()), pa.nulls(len(base), pa.string()).fill_null("insert")
        )
        # zero-copy two-chunk concat; the single wide gather below
        # resolves it.
        combined = pa.concat_tables(
            [conform(base_full, full_schema), conform(changes, full_schema)]
        )
    else:
        combined = changes

    win = _winner_indices(combined, keys, "lsn")
    # drop tombstone winners before the wide gather so deleted rows'
    # payload bytes never move.
    alive = pc.not_equal(combined.column("op").take(win), pa.scalar("delete"))
    if isinstance(alive, pa.ChunkedArray):
        alive = alive.combine_chunks()
    win = win.filter(alive)
    out = combined.take(win)  # the ONE payload gather, key-sorted
    drop = ["op"] if keep_lsn else ["op", "lsn"]
    return out.drop_columns(drop)
