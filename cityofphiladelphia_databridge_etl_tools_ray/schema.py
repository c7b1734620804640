"""Schemas and the type-promotion lattice.

The transcripts base table (BASELINE.json ``input_hint``) and the CDC
change-event schema, plus schema-evolution rules generalizing the
reference's ``DATA_TYPE_MAP`` / ``GEOM_TYPE_MAP`` widening (reference:
databridge_etl_tools/postgres/postgres_map.py:1-27 — e.g. polygon →
MultiPolygon is its type-promotion rule; here the lattice is
int widen, float widen, timestamp-unit widen, null → anything,
column-add-nullable).
"""

from __future__ import annotations

import pyarrow as pa

# Base table: one row per conversation turn. PK = (conv_id, turn_idx).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

PRIMARY_KEY = ["conv_id", "turn_idx"]

#: CDC metadata columns prepended to the payload.  ``op`` ∈
#: {insert, update, delete} (insert/update are both upserts — the
#: reference's ON CONFLICT DO UPDATE makes no distinction either);
#: ``lsn`` is globally unique and strictly increasing in commit order.
CHANGE_SCHEMA = pa.schema(
    [pa.field("op", pa.string(), nullable=False), pa.field("lsn", pa.int64(), nullable=False)]
    + list(TRANSCRIPT_SCHEMA)
)

OPS = ("insert", "update", "delete")
UPSERT_OPS = ("insert", "update")

_INT_RANK = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_UINT_RANK = {pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3}
_FLOAT_RANK = {pa.float16(): 0, pa.float32(): 1, pa.float64(): 2}
_TS_RANK = {"s": 0, "ms": 1, "us": 2, "ns": 3}


def promote_types(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Least upper bound of two Arrow types under the widening lattice.

    Raises ``TypeError`` for genuinely incompatible pairs (e.g.
    string vs int) — the reference would fail the COPY in that case
    too; incompatible drift is an error, not silent coercion.
    """
    if a.equals(b):
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    if a in _INT_RANK and b in _INT_RANK:
        return a if _INT_RANK[a] >= _INT_RANK[b] else b
    if a in _UINT_RANK and b in _UINT_RANK:
        return a if _UINT_RANK[a] >= _UINT_RANK[b] else b
    # signed/unsigned mix → widen to int64
    if (a in _INT_RANK or a in _UINT_RANK) and (b in _INT_RANK or b in _UINT_RANK):
        return pa.int64()
    if a in _FLOAT_RANK and b in _FLOAT_RANK:
        return a if _FLOAT_RANK[a] >= _FLOAT_RANK[b] else b
    # int + float → float64
    is_num = lambda t: t in _INT_RANK or t in _UINT_RANK or t in _FLOAT_RANK  # noqa: E731
    if is_num(a) and is_num(b):
        return pa.float64()
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        tz = a.tz if a.tz == b.tz else None
        unit = a.unit if _TS_RANK[a.unit] >= _TS_RANK[b.unit] else b.unit
        return pa.timestamp(unit, tz)
    if pa.types.is_large_string(a) and pa.types.is_string(b):
        return a
    if pa.types.is_string(a) and pa.types.is_large_string(b):
        return b
    raise TypeError(f"cannot promote {a} vs {b}")


def promote_schemas(*schemas: pa.Schema) -> pa.Schema:
    """Unify schemas: fields in first-seen order, types promoted,
    columns present in only some schemas become nullable (the
    column-add evolution rule)."""
    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name in types:
                types[f.name] = promote_types(types[f.name], f.type)
            else:
                order.append(f.name)
                types[f.name] = f.type
    return pa.schema([pa.field(n, types[n]) for n in order])


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``schema``: add missing columns as nulls,
    cast widened types, order columns per schema. Extra columns not in
    ``schema`` are dropped (caller widens the schema first if it wants
    them kept)."""
    n = len(table)
    cols = []
    for f in schema:
        if f.name in table.column_names:
            col = table.column(f.name)
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=schema)
