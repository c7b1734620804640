"""Paginated-REST source — the reference's Airtable/Knack extractors
re-expressed as a parallel Ray Data source.

Reference shape (databridge_etl_tools/airtable/airtable.py:70-140,
knack/knack.py:86-187): recursive offset-cursor pagination at 1000
rows/page, per-row normalization (lowercase keys, JSON-encode
list/object cells, synthetic autoincrement ``objectid``), CSV out.

Ray shape: when the page count is known (or probed with one count
request), pages become work items —
``from_items(pages) → map_batches(FetchPage actor, batch_size=1)`` —
so N actors each hold ONE session/connection (reference pattern: the
lazily-built ``requests.Session`` at ais_geocoder/ais_request.py:4-26)
and pages download in parallel instead of the reference's sequential
cursor walk.  The synthetic ``objectid`` is ``page*page_size + i``:
deterministic and shuffle-stable, unlike a global counter (reference
airtable/airtable.py:25,107-109 relies on single-threaded order).

No network exists in this sandbox, so ``FakePagedServer`` plays the
remote API deterministically; a real client subclasses ``PageFetcher``
and overrides ``_fetch_raw``.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

DEFAULT_PAGE_SIZE = 1000  # reference page size (airtable/airtable.py:21)


class FakePagedServer:
    """Deterministic in-memory 'REST API': ``n_records`` records with
    mixed scalar/list/object fields and MixedCase keys (what the
    normalizer has to fix).  Values are sha256-derived from the record
    id so a SQL oracle can reproduce the whole extract bit-exactly
    (the FakeCodec convention, stages/multimodal.py); per-row hashing
    is fine here — this object plays the REMOTE side, not an engine
    stage."""

    def __init__(self, n_records: int, seed: int = 7):
        self.n_records = n_records
        self.seed = seed  # kept for interface compat; values are id-derived

    def fetch(self, offset: int, limit: int) -> list[dict]:
        import hashlib

        out = []
        for i in range(offset, min(offset + limit, self.n_records)):
            name = f"rec-{i:06d}"
            score = int(hashlib.sha256(name.encode()).hexdigest()[:8], 16) % 100
            out.append(
                {
                    "Name": name,
                    "Score": score,
                    "Tags": [f"t{i % 5}", f"t{i % 3}"],
                    "Meta": {"k": i % 7},
                }
            )
        return out


class PageFetcher:
    """Actor-pool page fetcher: one 'session' per actor, one page per
    batch item.  Normalization (lowercase keys, JSON-encoded nested
    cells, synthetic objectid) happens here, vectorized per page."""

    def __init__(self, server: FakePagedServer, page_size: int = DEFAULT_PAGE_SIZE):
        self.page_size = page_size
        self.session = server  # a real impl opens requests.Session here

    def _fetch_raw(self, page: int) -> list[dict]:
        return self.session.fetch(page * self.page_size, self.page_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for page in batch.column("page").to_pylist():
            records = self._fetch_raw(int(page))
            if not records:
                continue
            cols: dict[str, list] = {}
            for key in records[0]:
                vals = [r.get(key) for r in records]
                # JSON-encode nested cells (reference: airtable
                # process_row airtable.py:96-111, knack convert_type
                # knack.py:120-154); lowercase keys (opendata.py:82-84)
                if any(isinstance(v, (list, dict)) for v in vals):
                    vals = [json.dumps(v, sort_keys=True) if v is not None else None for v in vals]
                cols[key.lower()] = vals
            n = len(records)
            objectid = np.arange(page * self.page_size, page * self.page_size + n, dtype=np.int64)
            t = pa.table({"objectid": pa.array(objectid), **{k: pa.array(v) for k, v in cols.items()}})
            tables.append(t)
        if not tables:
            return pa.table({"objectid": pa.array([], pa.int64())})
        return pa.concat_tables(tables)


def read_paged_api(
    server: FakePagedServer,
    *,
    page_size: int = DEFAULT_PAGE_SIZE,
    concurrency=(1, 4),
):
    """Parallel paginated extract → ``ray.data.Dataset``."""
    import ray.data

    n_pages = (server.n_records + page_size - 1) // page_size
    pages = ray.data.from_items([{"page": p} for p in range(max(n_pages, 1))])
    return pages.map_batches(
        PageFetcher,
        fn_constructor_kwargs={"server": server, "page_size": page_size},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
    )
