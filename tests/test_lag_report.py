"""cdc_replay_lag_report edges on crafted WAL-as-events data:

- a conversation whose every event lies past the checkpoint reports
  watermark −1 and lag = head + 1;
- a fully-committed conversation reports zero pending and lag 0;
- the cut is ⌊max lsn / 2⌋, inclusive on the committed side.
Hand-pinned AND compared against the registered DuckDB oracle.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    ORACLE_SQL,
    QUERIES,
)


def _cmp(got, exp):
    got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.fixture(scope="module")
def lag_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("lag_edge")
    # max lsn = 20 → cut = 10.  user 1: lsns 2, 10 (10 == cut is
    # COMMITTED: inclusive) → wm 10, pending 0, lag 0.  user 2: lsns
    # 11, 20 → nothing committed: wm −1, lag 21.  user 3: 5, 15 →
    # wm 5, pending 1, lag 10.
    ids = [2, 10, 11, 20, 5, 15]
    users = [1, 1, 2, 2, 3, 3]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array([pd.Timestamp("2024-01-01")] * 6, pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(["update"] * 6),
                "value": pa.array([1.0] * 6, pa.float64()),
                "props": pa.array(["{}"] * 6),
            }
        ),
        str(root / "events.parquet"),
    )
    return str(root)


def test_lag_report_edges(ray_session, lag_dir):
    got = QUERIES["cdc_replay_lag_report"](lag_dir).to_pandas()
    exp = pd.DataFrame(
        {
            "conv_id": ["conv-1", "conv-2", "conv-3"],
            "watermark_lsn": [10, -1, 5],
            "pending_events": [0, 2, 1],
            "lag": [0, 21, 10],
        }
    )
    _cmp(got, exp)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{lag_dir}/events.parquet'")
    _cmp(got, con.execute(ORACLE_SQL["cdc_replay_lag_report"]).fetchdf())
