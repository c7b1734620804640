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


class Int64Bloom:
    """Mergeable Bloom filter over int64 keys — the join-prefilter
    sketch for two-big-sides semi-joins.

    The broadcast ``SortedIntMap`` path above assumes the dim key set
    fits comfortably in every worker's heap.  When BOTH sides are big
    (100-TB fact ⋉ multi-GB dim), the exact probe must be a
    hash-partition shuffle of the fact — and the Bloom filter is the
    standard way to shrink that shuffle: build it over the dim keys
    (mergeable, OR-combine → a Ray ``AggregateFn``), broadcast the
    fixed-size bitmask (2^log2_bits bits, independent of dim size),
    and drop every fact row the filter rejects BEFORE the exchange.
    No false negatives, so the downstream exact join sees a superset
    of the true matches; FP rate ≈ (1-e^{-kn/m})^k.

    Hashing: splitmix64 finalizer (public-domain mixing constants),
    double hashing h1 + i*h2 for the k probe positions.  All numpy,
    vectorized over the whole batch; uint64 wrap-around is the
    intended modular arithmetic.
    """

    def __init__(self, log2_bits: int = 20, k: int = 4, words: np.ndarray | None = None):
        self.log2_bits = int(log2_bits)
        self.k = int(k)
        n_words = (1 << self.log2_bits) >> 6
        if words is None:
            self.words = np.zeros(n_words, dtype=np.uint64)
        else:
            words = np.asarray(words, dtype=np.uint64)
            if words.shape != (n_words,):
                raise ValueError(f"mask shape {words.shape} != ({n_words},)")
            self.words = words

    @staticmethod
    def _mix(x: np.ndarray) -> np.ndarray:
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def _positions(self, q: np.ndarray) -> np.ndarray:
        """(k, n) array of bit positions for each query key."""
        x = np.ascontiguousarray(q, dtype=np.int64).view(np.uint64)
        h1 = self._mix(x)
        h2 = self._mix(x ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
        mask = np.uint64((1 << self.log2_bits) - 1)
        idx = np.empty((self.k, len(x)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) & mask
        return idx

    def add(self, keys: np.ndarray) -> "Int64Bloom":
        if len(keys) == 0:
            return self
        idx = self._positions(np.asarray(keys)).ravel()
        w = (idx >> np.uint64(6)).astype(np.int64)
        bits = np.uint64(1) << (idx & np.uint64(63))
        np.bitwise_or.at(self.words, w, bits)
        return self

    def contains(self, q: np.ndarray) -> np.ndarray:
        q = np.asarray(q)
        if len(q) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._positions(q)
        w = (idx >> np.uint64(6)).astype(np.int64)
        bits = np.uint64(1) << (idx & np.uint64(63))
        return ((self.words[w] & bits) == bits).all(axis=0)

    def merge(self, other: "Int64Bloom") -> "Int64Bloom":
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    @property
    def fill_ratio(self) -> float:
        """Fraction of set bits — sanity metric for sizing."""
        return float(np.unpackbits(self.words.view(np.uint8)).mean())


def deref(ref):
    """Resolve a broadcast ObjectRef inside a stateless map task.

    ``ray.get`` on a plasma object is a zero-copy shared-memory read
    after the first fetch per node, so stateless task functions can
    hold broadcast state as cheaply as an actor pool — while scaling
    elastically with no actor-pool concurrency cap."""
    import ray

    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
