"""Paginated-REST source tests (reference: airtable/airtable.py:70-140,
knack/knack.py:86-187 — offset pagination, key lowercasing, JSON-encoded
nested cells, synthetic autoincrement objectid)."""

import json

from cityofphiladelphia_databridge_etl_tools_ray.sources.paged_api import (
    FakePagedServer,
    read_paged_api,
)


def test_paged_extract_complete_and_normalized(ray_session):
    server = FakePagedServer(n_records=2534)
    df = read_paged_api(server, page_size=100).to_pandas().sort_values("objectid").reset_index(drop=True)
    assert len(df) == 2534
    # synthetic objectid is dense and shuffle-stable
    assert list(df["objectid"]) == list(range(2534))
    # keys lowercased
    assert set(df.columns) == {"objectid", "name", "score", "tags", "meta"}
    # nested cells JSON-encoded
    assert json.loads(df["tags"][7]) == ["t2", "t1"]
    assert json.loads(df["meta"][7]) == {"k": 0}
    # content matches the server record at the same offset
    assert df["name"][2533] == "rec-002533"


def test_paged_extract_deterministic(ray_session):
    server = FakePagedServer(n_records=250)
    a = read_paged_api(server, page_size=64).to_pandas().sort_values("objectid").reset_index(drop=True)
    b = read_paged_api(server, page_size=64).to_pandas().sort_values("objectid").reset_index(drop=True)
    assert a.equals(b)


def test_paged_extract_empty_server(ray_session):
    df = read_paged_api(FakePagedServer(n_records=0)).to_pandas()
    assert len(df) == 0
