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

Everything is vectorized: one Arrow sort + shifted-comparison mask,
no Python row loops.  Base rows participate with a sentinel
``lsn = -1`` — callers guarantee (via the partition watermark) that
every change in ``changes`` has lsn greater than the lsn that produced
the base rows, so any change beats any base row.
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


def dedup_last_writer(
    changes: pa.Table,
    keys: list[str] = PRIMARY_KEY,
    order_col: str = "lsn",
) -> pa.Table:
    """Keep only the highest-``order_col`` row per key.

    Associative: applying this per input batch (the pre-shuffle
    combiner) and again after the shuffle yields the same result as
    one global pass — which is what makes hot-key pre-reduction safe.
    """
    if len(changes) == 0:
        return changes
    sort_keys = [(k, "ascending") for k in keys] + [(order_col, "ascending")]
    s = changes.sort_by(sort_keys)
    return s.filter(_keep_last_mask(s, keys))


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

    changes = dedup_last_writer(changes, keys=keys)

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
        combined = pa.concat_tables(
            [conform(base_full, full_schema), conform(changes, full_schema)]
        )
        combined = dedup_last_writer(combined, keys=keys)
    else:
        target = payload_schema
        combined = changes

    live = combined.filter(pc.not_equal(combined.column("op"), pa.scalar("delete")))
    live = live.sort_by([(k, "ascending") for k in keys])
    drop = ["op"] if keep_lsn else ["op", "lsn"]
    return live.drop_columns(drop)
