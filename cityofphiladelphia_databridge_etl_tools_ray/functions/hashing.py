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


def partition_ids(conv_ids, num_partitions: int) -> np.ndarray:
    """Stable partition id per key: ``hash(conv_id) % P`` as int32."""
    return (stable_hash_strings(conv_ids) % np.uint64(num_partitions)).astype(np.int32)
