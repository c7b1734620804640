"""Adaptive equi-join operator over ``ray.data.Dataset``.

The reference joins row-at-a-time through the database (upsert lookup
per PK, ago/ago.py:716-931; staging-table merges,
postgres/postgres.py:497-573).  At engine scale a join's right strategy
depends on the BUILD side's size, so this module gives every pipeline
one entry point that picks it:

- **broadcast-hash** when the build side fits the broadcast budget:
  the build table is put into the object store ONCE (``ray.put``) and
  every probe task reads it zero-copy — no shuffle of the probe side
  at all.  The repo's q3/q5/semi/anti builds hand-roll exactly this;
  ``adaptive_join`` packages it.
- **distributed hash-shuffle** otherwise: Ray Data's native
  ``Dataset.join`` (hash partition both sides, Ray 2.49+), partition
  count derived from the live cluster.

Size sensing never materializes a big side on the driver:
``Dataset.size_bytes()`` is metadata for pure reads; for transformed
pipelines the caller passes ``build_size_hint`` or the operator falls
back to the shuffle path (the safe default at unknown scale).

semi / anti joins first reduce the build side to DISTINCT KEYS with a
bucketed exchange (distributed, exact — never a driver pull), then
measure the materialized key set: small key sets broadcast (the same
observation behind the repo's Bloom-prefiltered semi-join — a key
projection broadcasts far past the inner-join budget), large ones go
through a native left join on a ``__hit`` marker + filter.
"""

from __future__ import annotations

import pyarrow as pa

from .cluster import cluster_cpus, parallelism

# 64 MB: a build side bigger than this ships to every probe task and
# starts competing with the probe stream for object-store bandwidth
DEFAULT_BROADCAST_LIMIT = 64 << 20

_HOW = ("inner", "left", "semi", "anti")
_HIT = "__hit"


def _estimate_size(ds, hint: int | None) -> int | None:
    if hint is not None:
        return int(hint)
    try:
        n = ds.size_bytes()
        return int(n) if n is not None else None
    except Exception:
        return None


def _collect(ds) -> pa.Table:
    """Driver-side concat of an ALREADY SIZE-CHECKED small Dataset."""
    tables = [t for t in ds.iter_batches(batch_format="pyarrow", batch_size=None)]
    if not tables:
        s = ds.schema()
        return pa.schema(list(zip(s.names, s.types))).empty_table()
    return pa.concat_tables(
        [t.combine_chunks() for t in tables], promote_options="permissive"
    )


def _distinct_keys(ds, keys: list[str]):
    """Distributed exact distinct of a key projection: per-batch
    distinct partials collapse each block, ONE bucketed exchange on a
    stable hash of keys[0], vectorized distinct per bucket."""
    from .hashing import partition_ids

    n_buckets = parallelism(4.0)

    def partial(b: pa.Table) -> pa.Table:
        d = b.select(keys).group_by(keys).aggregate([])
        return d.append_column(
            "__bkt", pa.array(partition_ids(d.column(keys[0]), n_buckets))
        )

    def exact(g: pa.Table) -> pa.Table:
        return g.select(keys).group_by(keys).aggregate([])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(exact, batch_format="pyarrow")
    )


def broadcast_hash_join(left, build: pa.Table, on: list[str], how: str = "inner"):
    """Join a Dataset against an in-memory build table: ONE ``ray.put``
    of the build side, per-batch vectorized pandas merge (inner/left)
    or key-membership mask (semi/anti) on the probe side — no shuffle.
    Build-side keys must be unique for inner/left (the PK-lookup
    contract, asserted); semi/anti accept duplicates."""
    import ray

    if how not in _HOW:
        raise ValueError(f"how must be one of {_HOW}")
    keys = list(on)
    if how in ("semi", "anti"):
        build = build.select(keys).group_by(keys).aggregate([])
    else:
        n_distinct = build.select(keys).group_by(keys).aggregate([]).num_rows
        if n_distinct != build.num_rows:
            raise ValueError("broadcast build side has duplicate join keys")
    ref = ray.put(build)

    def probe(b: pa.Table) -> pa.Table:
        bt: pa.Table = ray.get(ref)
        if how in ("semi", "anti"):
            lk = b.select(keys).to_pandas()
            hit = (
                lk.merge(bt.to_pandas().assign(**{_HIT: 1}), on=keys, how="left")[_HIT]
                .notna()
                .to_numpy()
            )
            return b.filter(pa.array(hit if how == "semi" else ~hit))
        lp = b.to_pandas()
        out = lp.merge(bt.to_pandas(), on=keys, how=how, sort=False)
        return pa.Table.from_pandas(out, preserve_index=False)

    return left.map_batches(probe, batch_format="pyarrow")


def adaptive_join(
    left,
    right,
    on: list[str],
    how: str = "inner",
    *,
    broadcast_limit_bytes: int = DEFAULT_BROADCAST_LIMIT,
    build_size_hint: int | None = None,
    num_partitions: int | None = None,
):
    """Equi-join two Datasets on ``on``, picking the strategy from the
    build (right) side's estimated size.  Returns ``(joined_dataset,
    strategy)`` where strategy is 'broadcast' | 'broadcast-keys' |
    'shuffle' | 'shuffle-keys', so tests and plan audits can assert
    the choice."""
    if how not in _HOW:
        raise ValueError(f"how must be one of {_HOW}")
    keys = list(on)
    n_parts = num_partitions or max(8, cluster_cpus() * 2)

    if how in ("semi", "anti"):
        # reduce build to distinct keys (distributed), then measure the
        # MATERIALIZED key set — a decision on real bytes, not a guess
        distinct = _distinct_keys(right, keys).materialize()
        if (distinct.size_bytes() or 0) <= broadcast_limit_bytes:
            return (
                broadcast_hash_join(left, _collect(distinct), keys, how),
                "broadcast-keys",
            )
        joined = left.join(
            distinct,
            join_type=f"left_{how}",
            num_partitions=n_parts,
            on=tuple(keys),
        )
        return joined, "shuffle-keys"

    est = _estimate_size(right, build_size_hint)
    if est is not None and est <= broadcast_limit_bytes:
        return (
            broadcast_hash_join(left, _collect(right), keys, how),
            "broadcast",
        )
    native = {"inner": "inner", "left": "left_outer"}[how]
    return (
        left.join(right, join_type=native, num_partitions=n_parts, on=tuple(keys)),
        "shuffle",
    )
