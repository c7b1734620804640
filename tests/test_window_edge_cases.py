"""Ordered-window kernels vs DuckDB on crafted data the sf tables
can't force: exact ts ties (event_id tie-break), single-event users,
and users whose events interleave across blocks."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    ORACLE_SQL,
    QUERIES,
)


@pytest.fixture(scope="module")
def tie_sf_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tie_sf")
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    # user 1: three events, two tied on ts (ids 11 < 12 break the tie)
    # user 2: single event (no lag row)
    # user 3: two events 90s apart; ids deliberately out of ts order
    t = pa.table(
        {
            "event_id": pa.array([12, 11, 13, 20, 31, 30], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
            "ts": pa.array(
                [base, base, base + 5_000_000, base, base + 90_000_000, base],
                pa.timestamp("us"),
            ),
            "value": pa.array([1.25, 2.5, 3.0, 4.0, 5.0, 6.0], pa.float64()),
        }
    )
    pq.write_table(t, str(root / "events.parquet"))
    return str(root)


@pytest.mark.parametrize(
    "name",
    [
        "events_user_lag_gaps",
        "events_user_running_total",
        "events_user_moving_sum",
        "events_user_value_ntile",
        "events_user_percent_rank",
        "events_user_first_last_value",
    ],
)
def test_window_kernels_on_ties(ray_session, tie_sf_dir, name):
    got = (
        QUERIES[name](tie_sf_dir)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tie_sf_dir}/events.parquet'"
    )
    exp = (
        con.execute(ORACLE_SQL[name])
        .fetchdf()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    exp = exp[got.columns]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_lag_gaps_values(ray_session, tie_sf_dir):
    got = QUERIES["events_user_lag_gaps"](tie_sf_dir).to_pandas()
    rows = {int(r.event_id): int(r.gap_us) for r in got.itertuples()}
    # user 1: 11 -> 12 (tie, gap 0), 12 -> 13 (+5s); user 2 emits nothing;
    # user 3: 30 -> 31 (+90s)
    assert rows == {12: 0, 13: 5_000_000, 31: 90_000_000}


def test_global_rank_degenerate_key_skew(ray_session, tmp_path):
    """All rows sharing ONE sort-key value collapses every sketch
    boundary (np.unique → empty bounds, single range): ranks must
    still be exact via the composite tie-break."""
    import duckdb

    root = tmp_path / "skew_sf"
    root.mkdir()
    base = pd.Timestamp("2024-06-01").value // 1000
    n = 5000
    rng = np.random.default_rng(5)
    t = pa.table(
        {
            "l_orderkey": pa.array(rng.permutation(n).astype(np.int64)),
            "l_linenumber": pa.array(rng.integers(1, 8, n).astype(np.int32)),
            "l_shipdate": pa.array(np.full(n, base), pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(root / "lineitem.parquet"))

    got = (
        QUERIES["lineitem_global_rank"](str(root))
        .to_pandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{root}/lineitem.parquet'")
    exp = (
        con.execute(ORACLE_SQL["lineitem_global_rank"] + " ORDER BY rnk")
        .fetchdf()
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
