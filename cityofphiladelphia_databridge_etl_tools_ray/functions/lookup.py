"""Broadcast-small-side lookup joins.

The reference does per-row remote lookups (AGO upsert queries the
endpoint per PK — ago/ago.py:1063-1086; AIS geocoder one REST call
per row — ais_geocoder/ais_geocoder.py:40-114).  The engine replaces
index-nested-loop joins with: ``ray.put`` the small side ONCE on the
driver, hand every map task the ref, ``ray.get`` it once per worker
(zero-copy from the local object store), then vectorized
``np.searchsorted`` lookups per batch.  No shuffle, no re-shipping
per batch.
"""

from __future__ import annotations

import numpy as np


class SortedIntMap:
    """Immutable int-key → value map backed by sorted numpy arrays;
    O(log n) vectorized lookup, shareable via the object store."""

    def __init__(self, keys: np.ndarray, values: np.ndarray | None = None):
        keys = np.asarray(keys, dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.values = None if values is None else np.asarray(values)[order]

    def contains(self, q: np.ndarray) -> np.ndarray:
        q = np.asarray(q, dtype=np.int64)
        pos = np.searchsorted(self.keys, q)
        pos_c = np.clip(pos, 0, len(self.keys) - 1) if len(self.keys) else pos
        return (len(self.keys) > 0) & (pos < len(self.keys)) & (self.keys[pos_c] == q)

    def get(self, q: np.ndarray, default=0):
        """(values, found_mask); missing keys get ``default``."""
        if self.values is None:
            raise ValueError("map built without values")
        q = np.asarray(q, dtype=np.int64)
        pos = np.searchsorted(self.keys, q)
        pos_c = np.clip(pos, 0, max(len(self.keys) - 1, 0))
        found = (len(self.keys) > 0) & (pos < len(self.keys)) & (self.keys[pos_c] == q)
        out = self.values[pos_c].copy()
        if not found.all():
            out[~found] = default
        return out, found


def deref(ref):
    """Resolve a broadcast ObjectRef inside a stateless map task.

    ``ray.get`` on a plasma object is a zero-copy shared-memory read
    after the first fetch per node, so stateless task functions can
    hold broadcast state as cheaply as an actor pool — while scaling
    elastically with no actor-pool concurrency cap."""
    import ray

    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
