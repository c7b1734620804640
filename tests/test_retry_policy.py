"""Explicit retry budgets on external-facing stages (VERDICT r2 item 5).

The reference's budget is 5 tries with exponential 1-10 s backoff
(ais_geocoder/ais_request.py:6-26); these tests inject transient
failures and assert the stage still produces the byte-exact extract,
plus budget-exhaustion and permanent-error-passthrough semantics.
"""

import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.functions.retry import (
    TransientError,
    retry_call,
)
from cityofphiladelphia_databridge_etl_tools_ray.sources.paged_api import (
    FakePagedServer,
    FlakyPagedServer,
    read_paged_api,
)
from cityofphiladelphia_databridge_etl_tools_ray.stages.enrich import (
    FlakyGeocoder,
    GeocodeEnrich,
)


def test_retry_call_backoff_schedule():
    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise TransientError("boom")
        return "ok"

    assert retry_call(flaky, sleep=sleeps.append) == "ok"
    # exponential 1-10s: 1, 2, 4 before the 4th (successful) attempt
    assert sleeps == [1.0, 2.0, 4.0]


def test_retry_call_budget_exhausted():
    sleeps = []

    def always():
        raise TransientError("down")

    with pytest.raises(TransientError):
        retry_call(always, tries=3, sleep=sleeps.append)
    assert sleeps == [1.0, 2.0]  # tries-1 sleeps, then the raise


def test_retry_call_permanent_error_passes_through():
    sleeps = []

    def perm():
        raise ValueError("bad key")

    with pytest.raises(ValueError):
        retry_call(perm, sleep=sleeps.append)
    assert sleeps == []  # not retried at all


def test_paged_extract_exact_under_transient_failures(ray_session):
    stable = (
        read_paged_api(FakePagedServer(n_records=230), page_size=50)
        .to_pandas()
        .sort_values("objectid")
        .reset_index(drop=True)
    )
    flaky = (
        read_paged_api(
            FlakyPagedServer(n_records=230, fail_first=3),
            page_size=50,
            retry_sleep=lambda s: None,
        )
        .to_pandas()
        .sort_values("objectid")
        .reset_index(drop=True)
    )
    assert flaky.equals(stable)  # byte-exact despite 3 failures/page


def test_geocode_exact_under_transient_failures():
    t = pa.table({"k": ["100 main st", "bad addr", "2 elm ave", "100 main st"]})
    stable = GeocodeEnrich("k")(t)
    flaky = GeocodeEnrich(
        "k", client=FlakyGeocoder(fail_first=4), retry_sleep=lambda s: None
    )(t)
    assert flaky.equals(stable)
    assert flaky.column("geocode_ok").to_pylist() == [True, False, True, True]


def test_geocode_budget_exhaustion_raises():
    t = pa.table({"k": ["100 main st"]})
    enrich = GeocodeEnrich(
        "k", client=FlakyGeocoder(fail_first=99), retry_tries=3, retry_sleep=lambda s: None
    )
    with pytest.raises(TransientError):
        enrich(t)


def test_csv_gzip_write_retries_oserror(tmp_path):
    from cityofphiladelphia_databridge_etl_tools_ray.stages.publish import CsvGzipWriter

    w = CsvGzipWriter(str(tmp_path), retry_sleep=lambda s: None)
    real_put, fails = w._put, {"n": 0}

    def flaky_put(path, data):
        fails["n"] += 1
        if fails["n"] <= 2:
            raise OSError("transient fs error")
        real_put(path, data)

    w._put = flaky_put
    out = w(pa.table({"a": [1, 2, 3]}))
    assert fails["n"] == 3
    path = out.column("path").to_pylist()[0]
    import gzip

    with gzip.open(path, "rt") as f:
        assert f.read().splitlines() == ['"a"', "1", "2", "3"]
