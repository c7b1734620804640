"""Deterministic vectorized hashing for partition assignment.

The partition function must be stable across processes, runs and
nodes — partition ownership is recorded in manifests (the analog of
the reference's PK-constraint-driven routing into one Postgres table,
postgres/postgres.py:497-573) and a different hash on resume would
route keys to the wrong partition's watermark.

``pandas.util.hash_array`` (SipHash-ish with a fixed key, vectorized
C) provides that: deterministic for a given pandas major version, no
PYTHONHASHSEED dependence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash_strings(values) -> np.ndarray:
    """uint64 stable hash of a string array (numpy / pandas / Arrow)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def stable_hash_any(values) -> np.ndarray:
    """uint64 stable hash of a key column of any primitive type.

    Integer keys take the vectorized numeric ``hash_array`` path
    (zero-copy from Arrow); everything else goes through the string
    hasher.  Needed since the lake's primary key is configurable
    (reference ``--primary_key``, ago/ago_commands.py:41) — e.g. an
    int64 surrogate key instead of the transcripts' conv_id string."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(values.type):
            arr = values.to_numpy(zero_copy_only=False)
            return pd.util.hash_array(np.ascontiguousarray(arr, dtype=np.int64))
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return pd.util.hash_array(np.ascontiguousarray(arr, dtype=np.int64))
    return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False)


def partition_ids(keys, num_partitions: int) -> np.ndarray:
    """Stable partition id per key: ``hash(key) % P`` as int32."""
    return (stable_hash_any(keys) % np.uint64(num_partitions)).astype(np.int32)
