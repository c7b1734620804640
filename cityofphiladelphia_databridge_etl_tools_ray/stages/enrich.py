"""Lookup-enrichment stage — the reference's AIS geocoder
(databridge_etl_tools/ais_geocoder/ais_geocoder.py:40-114) re-expressed
as an actor-pool batch join.

Reference shape: one REST GET per row against a geocode service, with
a module-level retrying ``requests.Session``
(ais_geocoder/ais_request.py:4-26) and a running failure counter.

Ray shape: a callable class for ``map_batches`` —
- the service client (here ``FakeGeocoder``; a real one opens the
  retry session) is built ONCE per actor in ``__init__``;
- each batch is resolved VECTORIZED: distinct keys in the batch are
  deduplicated before lookup (the reference pays one HTTP call per
  row, repeated addresses included);
- failures don't raise: the enrichment columns stay null and a
  ``geocode_ok`` flag column supports the failure-count aggregate
  (``ds.sum`` over the flag — reference's ``error_count``).

At 100 TB the same class points at a broadcast snapshot (``ray.put`` a
prebuilt address index, zero-copy read per actor) instead of a remote
service; both variants keep the lookup out of the shuffle plane.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.retry import TransientError, retry_call


class FakeGeocoder:
    """Deterministic stand-in for the AIS service: coordinates and a
    standardized address derived from the query string's sha256; keys
    containing ``"bad"`` fail (exercising the null/flag path)."""

    def lookup(self, keys: list[str]) -> dict[str, tuple[float, float, str]]:
        out = {}
        for k in keys:
            if k is None or "bad" in k:
                continue
            d = hashlib.sha256(k.encode()).digest()
            lon = -75.0 - (int.from_bytes(d[:4], "big") % 1000) / 1000.0
            lat = 39.0 + (int.from_bytes(d[4:8], "big") % 1000) / 1000.0
            out[k] = (lon, lat, k.upper())
        return out


class FlakyGeocoder(FakeGeocoder):
    """Failure-injecting fake: the first ``fail_first`` lookup calls
    raise ``TransientError`` before behaving normally — exercises the
    in-actor retry budget."""

    def __init__(self, *, fail_first: int = 2):
        self.fail_first = fail_first
        self._calls = 0

    def lookup(self, keys):
        self._calls += 1
        if self._calls <= self.fail_first:
            raise TransientError(f"injected transient failure #{self._calls}")
        return super().lookup(keys)


class GeocodeEnrich:
    """``map_batches`` actor: append (lon, lat, std_address,
    geocode_ok) for ``key_col``."""

    def __init__(self, key_col: str, client=None, *, retry_tries: int = 5, retry_sleep=None):
        self.key_col = key_col
        self.client = client or FakeGeocoder()  # session built once per actor
        # explicit budget mirroring the reference's retrying session
        # (ais_request.py:6-26: 5 tries, exponential 1-10 s); transient
        # service errors retry in-actor, permanent misses stay null-flag
        self.retry_tries = retry_tries
        self.retry_sleep = retry_sleep

    def _lookup(self, keys: list[str]) -> dict:
        kw = {"tries": self.retry_tries}
        if self.retry_sleep is not None:
            kw["sleep"] = self.retry_sleep
        return retry_call(self.client.lookup, keys, **kw)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys = col.to_pylist()
        resolved = self._lookup(list(dict.fromkeys(keys)))  # dedup per batch
        lon = np.full(len(keys), np.nan)
        lat = np.full(len(keys), np.nan)
        std = np.empty(len(keys), dtype=object)
        ok = np.zeros(len(keys), dtype=bool)
        for i, k in enumerate(keys):
            hit = resolved.get(k)
            if hit is not None:
                lon[i], lat[i], std[i] = hit
                ok[i] = True
        return (
            batch.append_column("lon", pa.array(lon, pa.float64(), mask=~ok))
            .append_column("lat", pa.array(lat, pa.float64(), mask=~ok))
            .append_column("std_address", pa.array(std, pa.string()))
            .append_column("geocode_ok", pa.array(ok))
        )


def geocode_failure_count(ds) -> int:
    """The reference's running error counter as a distributed
    aggregate (ais_geocoder/ais_geocoder.py:54,94-96)."""
    return int(ds.count() - ds.sum("geocode_ok"))
