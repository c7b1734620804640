"""HLL inclusion–exclusion overlap (events_type_user_overlap_sketch):
pinned against the EXACT Jaccard on crafted sets with known overlap —
clicks = users [0, 1200), purchases = users [600, 1800), so
|A∩B| = 600, |A∪B| = 1800, J = 1/3.  Cardinalities must land within
the 3σ HLL bound (3·1.04/√1024 ≈ 9.8%); the differenced intersection
compounds errors, so the Jaccard pin is looser (±0.15 absolute).
Also: disjoint sets must report ≈0 overlap (clamped at 0).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import QUERIES


def _events(root, click_users, buy_users):
    uid = np.concatenate([click_users, buy_users])
    et = ["click"] * len(click_users) + ["purchase"] * len(buy_users)
    n = len(uid)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array([pd.Timestamp("2024-01-01")] * n, pa.timestamp("us")),
                "user_id": pa.array(uid.astype(np.int64)),
                "event_type": pa.array(et),
                "value": pa.array(np.ones(n), pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(root / "events.parquet"),
    )
    return str(root)


def test_overlap_sketch_tracks_exact_jaccard(ray_session, tmp_path):
    d = _events(tmp_path, np.arange(0, 1200), np.arange(600, 1800))
    got = QUERIES["events_type_user_overlap_sketch"](d)
    row = got.iloc[0]
    assert abs(row["clicks_est"] - 1200) <= 0.098 * 1200  # 3σ ≈ 9.8%
    assert abs(row["purchases_est"] - 1200) <= 0.098 * 1200
    assert abs(row["union_est"] - 1800) <= 0.098 * 1800
    assert abs(row["jaccard_est"] - 1 / 3) <= 0.15


def test_overlap_sketch_disjoint_sets(ray_session, tmp_path):
    d = _events(tmp_path, np.arange(0, 800), np.arange(10_000, 10_800))
    got = QUERIES["events_type_user_overlap_sketch"](d)
    row = got.iloc[0]
    assert row["jaccard_est"] <= 0.12  # ≈0 up to compounded sketch error
    assert row["jaccard_est"] >= 0.0  # clamped, never negative
