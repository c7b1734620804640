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


# ---------------------------------------------------------------------------
# Patch-event (partial-update) merge: per-column last-non-null-writer
# ---------------------------------------------------------------------------

PATCH_META = ("del_lsn", "wr_lsn")


def _np_col(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col)


def _key_runs(table: pa.Table, keys: list[str], order_col: str):
    """(order, starts, run_id, n) for rows grouped by ``keys`` and
    sorted by ``order_col`` within each run — arbitrary key column
    types (np.lexsort compares object arrays fine)."""
    key_nps = [_np_col(table.column(k)) for k in keys]
    ord_np = _np_col(table.column(order_col))
    order = np.lexsort((ord_np, *reversed(key_nps)))
    n = len(order)
    diff = np.zeros(n, dtype=bool)
    diff[0] = True
    for k in key_nps:
        ks = k[order]
        diff[1:] |= ks[1:] != ks[:-1]
    starts = np.flatnonzero(diff)
    sizes = np.diff(np.r_[starts, n])
    run_id = np.repeat(np.arange(len(starts)), sizes)
    return order, starts, run_id, n


def patch_prereduce(
    changes: pa.Table, keys: list[str] = PRIMARY_KEY
) -> pa.Table:
    """Associative batch-local fold of a PATCH stream (update events
    carry only the columns they change; NULL = keep prior value):
    ≤1 lsn-stamped state row per key per batch — the patch-merge
    analog of ``dedup_last_writer`` (which is wrong for patches: it
    would drop earlier writes of columns the last event omitted).

    Output schema: keys..., ``del_lsn`` (last tombstone lsn, -1 if
    none), ``wr_lsn`` (last write lsn surviving the local tombstone,
    -1), and for every payload column its value plus ``{col}__lsn``.
    Two states merge exactly in :func:`resolve_patch_states` because
    every element is lsn-stamped; folding per batch, per salt-slice,
    or per shuffle wave all commute."""
    payload = [
        f.name for f in changes.schema if f.name not in ("op", "lsn", *keys)
    ]
    if len(changes) == 0:
        fields = [changes.schema.field(k) for k in keys]
        fields += [pa.field("del_lsn", pa.int64()), pa.field("wr_lsn", pa.int64())]
        for c in payload:
            fields.append(changes.schema.field(c))
            fields.append(pa.field(f"{c}__lsn", pa.int64()))
        return pa.schema(fields).empty_table()

    order, starts, run_id, n = _key_runs(changes, keys, "lsn")
    pos = np.arange(n, dtype=np.int64)
    lsn_s = _np_col(changes.column("lsn"))[order]
    op = changes.column("op")
    if isinstance(op, pa.ChunkedArray):
        op = op.combine_chunks()
    op_s = op.take(pa.array(order))
    is_del = _np_col(pc.equal(op_s, pa.scalar("delete")))
    last_del_pos = np.maximum.reduceat(np.where(is_del, pos, -1), starts)
    del_lsn = np.where(last_del_pos >= 0, lsn_s[np.maximum(last_del_pos, 0)], -1)
    live = ~is_del & (pos > last_del_pos[run_id])
    wr_lsn = np.maximum.reduceat(np.where(live, lsn_s, -1), starts)

    out = {}
    for k in keys:
        kcol = changes.column(k)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        out[k] = kcol.take(pa.array(order[starts]))
    out["del_lsn"] = pa.array(del_lsn)
    out["wr_lsn"] = pa.array(wr_lsn)
    for cname in payload:
        col = changes.column(cname)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col_s = col.take(pa.array(order))
        vc = live & _np_col(pc.is_valid(col_s))
        idx = np.maximum.reduceat(np.where(vc, pos, -1), starts)
        out[cname] = col_s.take(pa.array(np.maximum(idx, 0), mask=(idx < 0)))
        out[f"{cname}__lsn"] = pa.array(
            np.where(idx >= 0, lsn_s[np.maximum(idx, 0)], -1)
        )
    return pa.table(out)


def resolve_patch_states(
    states: pa.Table, keys: list[str] = PRIMARY_KEY
) -> pa.Table:
    """Merge ``patch_prereduce`` state rows per key into final rows:
    global tombstone = max ``del_lsn``; the key survives iff some
    state's qualifying-write lsn beats it; each column's winner is the
    max-``{col}__lsn`` write above the global tombstone.  lsn
    uniqueness (the WAL contract) makes every winner exact."""
    payload = [
        f.name
        for f in states.schema
        if f.name not in (*keys, *PATCH_META) and not f.name.endswith("__lsn")
    ]
    out_fields = [states.schema.field(k) for k in keys] + [
        states.schema.field(c) for c in payload
    ]
    out_schema = pa.schema(out_fields)
    if len(states) == 0:
        return out_schema.empty_table()

    order, starts, run_id, n = _key_runs(states, keys, "wr_lsn")
    pos = np.arange(n, dtype=np.int64)
    del_lsn = _np_col(states.column("del_lsn"))[order]
    wr_lsn = _np_col(states.column("wr_lsn"))[order]
    gdel = np.maximum.reduceat(del_lsn, starts)
    alive = (
        np.maximum.reduceat(np.where(wr_lsn > gdel[run_id], wr_lsn, -1), starts) >= 0
    )
    keep_runs = np.flatnonzero(alive)
    if len(keep_runs) == 0:
        return out_schema.empty_table()

    first = starts[keep_runs]
    out = {}
    for k in keys:
        kcol = states.column(k)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        out[k] = kcol.take(pa.array(order[first]))
    for cname in payload:
        col_lsn = _np_col(states.column(f"{cname}__lsn"))[order]
        qual = np.where(col_lsn > gdel[run_id], col_lsn, -1)
        win_lsn = np.maximum.reduceat(qual, starts)
        hit = (qual == win_lsn[run_id]) & (qual >= 0)
        win_pos = np.maximum.reduceat(np.where(hit, pos, -1), starts)
        idx = win_pos[keep_runs]
        col = states.column(cname)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col_s = col.take(pa.array(order))
        out[cname] = col_s.take(pa.array(np.maximum(idx, 0), mask=(idx < 0)))
    t = pa.table(out)
    return t.sort_by([(k, "ascending") for k in keys])


def _mask_stale_patch_components(
    states: pa.Table, keys: list[str], watermark: int
) -> pa.Table:
    """Drop every state component already covered by the partition
    watermark: rows whose ``wr_lsn`` AND ``del_lsn`` are ≤ watermark
    vanish; surviving rows have stale tombstones/writes clamped to -1
    and stale per-column values nulled (their ``{col}__lsn`` → -1).

    Why letting stale components "lose to the base" is NOT enough:
    the base stamps only keys that still EXIST.  Under a
    NON-contiguous redelivery (an old WAL segment delivered after the
    watermark passed it, alongside fresh events in the same commit) a
    stale write for a since-deleted key has no base row to lose
    against and its tombstone was not redelivered — the resolve would
    resurrect the key or apply the stale column.  Everything ≤
    watermark is by definition already reflected in the base, so it is
    masked outright — restoring LWW-grade idempotence under arbitrary
    redelivery subsets (LWW mode's row-level ``lsn > wm`` filter is
    immune by construction)."""
    payload = [
        f.name
        for f in states.schema
        if f.name not in (*keys, *PATCH_META) and not f.name.endswith("__lsn")
    ]
    def stale(arr: np.ndarray) -> bool:
        return bool(((arr >= 0) & (arr <= watermark)).any())

    lsns = {c: _np_col(states.column(f"{c}__lsn")) for c in payload}
    wr = _np_col(states.column("wr_lsn"))
    dl = _np_col(states.column("del_lsn"))
    if not (stale(wr) or stale(dl) or any(stale(a) for a in lsns.values())):
        return states  # hot path: fully-fresh delivery, zero copies
    fresh_row = (wr > watermark) | (dl > watermark)
    if not fresh_row.all():
        states = states.filter(pa.array(fresh_row))
        wr, dl = wr[fresh_row], dl[fresh_row]
        lsns = {c: a[fresh_row] for c, a in lsns.items()}
    cols = {k: states.column(k) for k in keys}
    cols["del_lsn"] = pa.array(np.where(dl > watermark, dl, -1))
    cols["wr_lsn"] = pa.array(np.where(wr > watermark, wr, -1))
    idx_all = np.arange(len(states), dtype=np.int64)
    for c in payload:
        keep = lsns[c] > watermark
        col = states.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[c] = col.take(pa.array(idx_all, mask=~keep))
        cols[f"{c}__lsn"] = pa.array(np.where(keep, lsns[c], -1))
    out = pa.table(cols)
    # conform: the masked take keeps value types, but re-assert the
    # declared fields so downstream schema unification sees no drift
    return conform(out, pa.schema([states.schema.field(n) for n in out.column_names]))


def merge_partition_patch(
    base: pa.Table | None,
    states: pa.Table,
    *,
    keys: list[str] = PRIMARY_KEY,
    watermark: int = -1,
) -> pa.Table:
    """Merge prereduced patch states into a base partition table.

    Exactly-once contract (two complementary mechanisms):
    - components at or below the ``watermark`` are MASKED before the
      resolve (:func:`_mask_stale_patch_components`) — they are
      already reflected in the base, and under non-contiguous
      redelivery they may lack the base row / tombstone they would
      otherwise lose against;
    - base rows enter the resolve as states whose every column (and
      whose existence) is stamped at the partition ``watermark``, so
      fresh writes (lsn > watermark) beat the base per column and a
      fresh tombstone kills the base row unless a fresher write
      revives it.  (A present base row implies no tombstone at exactly
      the watermark lsn for that key — lsns are unique and the
      watermark event either wrote or deleted it.)

    Payload schema evolution between base and states resolves with the
    same promotion lattice as the LWW merge."""
    if watermark >= 0 and len(states):
        states = _mask_stale_patch_components(states, keys, watermark)
    payload = [
        f.name
        for f in states.schema
        if f.name not in (*keys, *PATCH_META) and not f.name.endswith("__lsn")
    ]
    if base is not None and len(base) > 0:
        state_payload = pa.schema(
            [states.schema.field(c) for c in payload]
        )
        target = promote_schemas(
            pa.schema([f for f in base.schema if f.name not in keys]),
            state_payload,
        )
        payload = [f.name for f in target]
        base_state = {k: base.column(k) for k in keys}
        nb = len(base)
        base_state["del_lsn"] = pa.array(np.full(nb, -1, np.int64))
        base_state["wr_lsn"] = pa.array(np.full(nb, watermark, np.int64))
        base_conf = conform(base, pa.schema(
            [base.schema.field(k) for k in keys] + list(target)
        ))
        for c in payload:
            base_state[c] = base_conf.column(c)
            base_state[f"{c}__lsn"] = pa.array(np.full(nb, watermark, np.int64))
        full_fields = [base_conf.schema.field(k) for k in keys]
        full_fields += [pa.field("del_lsn", pa.int64()), pa.field("wr_lsn", pa.int64())]
        for c in payload:
            full_fields.append(target.field(c))
            full_fields.append(pa.field(f"{c}__lsn", pa.int64()))
        full_schema = pa.schema(full_fields)
        combined = pa.concat_tables(
            [conform(pa.table(base_state), full_schema), conform(states, full_schema)]
        )
    else:
        combined = states
    return resolve_patch_states(combined, keys=keys)
