"""Spearman pins on crafted events:

- value strictly increasing with ts → ρ = +1 exactly;
- value strictly decreasing with ts → ρ = −1 exactly;
- a known hand-permutation reproduces the closed form 1 − 6Σd²/(n(n²−1))
  and matches the registered DuckDB oracle.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    ORACLE_SQL,
    QUERIES,
)


def _events(root, values):
    n = len(values)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(
                    pd.date_range("2024-01-01", periods=n, freq="1min"), pa.timestamp("us")
                ),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "event_type": pa.array(["click"] * n),
                "value": pa.array(np.asarray(values, np.float64)),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(root / "events.parquet"),
    )
    return str(root)


def test_spearman_perfect_monotone(ray_session, tmp_path):
    d = _events(tmp_path, np.arange(500, dtype=float))
    got = QUERIES["events_spearman_value_ts"](d)
    assert got["spearman"].iloc[0] == 1.0
    assert got["n"].iloc[0] == 500


def test_spearman_perfect_antimonotone(ray_session, tmp_path):
    d = _events(tmp_path, np.arange(500, 0, -1, dtype=float))
    got = QUERIES["events_spearman_value_ts"](d)
    assert got["spearman"].iloc[0] == -1.0


def test_spearman_matches_oracle_on_permutation(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    vals = rng.permutation(400).astype(float)
    d = _events(tmp_path, vals)
    got = QUERIES["events_spearman_value_ts"](d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    exp = con.execute(ORACLE_SQL["events_spearman_value_ts"]).fetchdf()
    assert got["n"].iloc[0] == exp["n"].iloc[0]
    assert abs(got["spearman"].iloc[0] - exp["spearman"].iloc[0]) < 1e-12
    # closed form against a direct numpy rank computation
    r1 = np.argsort(np.argsort(vals)) + 1
    r2 = np.arange(1, 401)
    n = 400
    rho = 1 - 6 * float(((r1 - r2) ** 2).sum()) / (n * (n * n - 1))
    assert abs(got["spearman"].iloc[0] - rho) < 1e-12
