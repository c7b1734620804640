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

from ..functions.retry import TransientError, retry_call

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


class FlakyPagedServer(FakePagedServer):
    """Failure-injecting fake: the first ``fail_first`` fetches of every
    page raise ``TransientError`` before succeeding — exercises the
    retry budget end-to-end.  Per-actor state is fine: each page is
    fetched by exactly one actor, so the counter sees every attempt."""

    def __init__(self, n_records: int, *, fail_first: int = 2, seed: int = 7):
        super().__init__(n_records, seed=seed)
        self.fail_first = fail_first
        self._attempts: dict[int, int] = {}

    def fetch(self, offset: int, limit: int) -> list[dict]:
        seen = self._attempts.get(offset, 0)
        self._attempts[offset] = seen + 1
        if seen < self.fail_first:
            raise TransientError(f"injected transient failure #{seen + 1} at offset {offset}")
        return super().fetch(offset, limit)


class PageFetcher:
    """Actor-pool page fetcher: one 'session' per actor, one page per
    batch item.  Normalization (lowercase keys, JSON-encoded nested
    cells, synthetic objectid) happens here, vectorized per page."""

    def __init__(
        self,
        server: FakePagedServer,
        page_size: int = DEFAULT_PAGE_SIZE,
        *,
        retry_tries: int = 5,
        retry_sleep=None,
    ):
        self.page_size = page_size
        self.session = server  # a real impl opens requests.Session here
        # explicit retry budget mirroring the reference's 5-try
        # exponential 1-10 s session retry (ais_request.py:6-26);
        # retry_sleep is a test seam (defaults to time.sleep)
        self.retry_tries = retry_tries
        self.retry_sleep = retry_sleep

    def _fetch_raw(self, page: int) -> list[dict]:
        return self.session.fetch(page * self.page_size, self.page_size)

    def _fetch(self, page: int) -> list[dict]:
        kw = {"tries": self.retry_tries}
        if self.retry_sleep is not None:
            kw["sleep"] = self.retry_sleep
        return retry_call(self._fetch_raw, page, **kw)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for page in batch.column("page").to_pylist():
            records = self._fetch(int(page))
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
    retry_tries: int = 5,
    retry_sleep=None,
):
    """Parallel paginated extract → ``ray.data.Dataset``.

    Two retry layers: the in-actor ``retry_call`` budget (5 tries,
    exponential 1-10 s — the reference's session policy) absorbs
    transient fetch errors without losing the actor, and Ray-level
    ``max_task_retries`` re-runs the page task elsewhere if the whole
    actor dies mid-page (idempotent: objectid is derived from the page
    number, so a re-fetched page is byte-identical)."""
    import ray.data

    n_pages = (server.n_records + page_size - 1) // page_size
    pages = ray.data.from_items([{"page": p} for p in range(max(n_pages, 1))])
    return pages.map_batches(
        PageFetcher,
        fn_constructor_kwargs={
            "server": server,
            "page_size": page_size,
            "retry_tries": retry_tries,
            "retry_sleep": retry_sleep,
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
        max_restarts=2,
        max_task_retries=2,
    )
