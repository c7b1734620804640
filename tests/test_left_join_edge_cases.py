"""Left-outer shuffle join vs DuckDB on crafted data: orphan orders
(no matching customer — must not emit), customers with no orders in
the probe window (miss -> 0), duplicate orders per customer, and the
date-window pushdown boundary."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    ORACLE_SQL,
    QUERIES,
)


@pytest.fixture(scope="module")
def lj_sf_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("lj_sf")
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 513, 1025], pa.int64()),  # 1, 513, 1025 share bucket 1
            "c_mktsegment": pa.array(["A", "B", "A", "C"], pa.string()),
        }
    )
    pq.write_table(cust, str(root / "customer.parquet"))
    orders = pa.table(
        {
            # custkey 9999 is an orphan (no customer row); custkey 2 has
            # two in-window orders; custkey 513 only an out-of-window one
            "o_custkey": pa.array([1, 2, 2, 513, 9999], pa.int64()),
            "o_totalprice": pa.array([10.005, 20.0, 30.004, 40.0, 50.0], pa.float64()),
            "o_orderdate": pa.array(
                pd.to_datetime(
                    ["1995-01-15", "1995-02-01", "1995-02-28", "1995-03-01", "1995-01-20"]
                ),
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(orders, str(root / "orders.parquet"))
    return str(root)


def test_left_join_crafted_vs_oracle(ray_session, lj_sf_dir):
    got = (
        QUERIES["left_join_customer_orders"](lj_sf_dir)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{lj_sf_dir}/{t}.parquet'")
    exp = (
        con.execute(ORACLE_SQL["left_join_customer_orders"])
        .fetchdf()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)
    # pin the semantics directly too
    by_key = got.set_index("c_custkey")
    assert by_key.loc[1, "n_orders"] == 1 and by_key.loc[1, "total_cents"] == 1001  # round half away
    assert by_key.loc[2, "n_orders"] == 2 and by_key.loc[2, "total_cents"] == 5000
    assert by_key.loc[513, "n_orders"] == 0  # only an out-of-window order (>= hi bound)
    assert by_key.loc[1025, "n_orders"] == 0  # never ordered
    assert 9999 not in by_key.index  # orphan order emits nothing


def test_full_outer_join_both_side_misses(ray_session):
    """Customers active in only one window must appear with zeros on
    the other side, and shared customers carry both sides' values."""
    import duckdb

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        ORACLE_SQL,
        full_outer_join_customer_windows,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        full_outer_join_customer_windows(sf)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    exp = (
        con.execute(ORACLE_SQL["full_outer_join_customer_windows"])
        .fetchdf()
        .sort_values("c_custkey")
        .reset_index(drop=True)
        .astype({"c_custkey": "int64"})
    )
    assert got[exp.columns.tolist()].equals(exp)
    only_a = ((got["n_orders_a"] > 0) & (got["n_orders_b"] == 0)).sum()
    only_b = ((got["n_orders_a"] == 0) & (got["n_orders_b"] > 0)).sum()
    assert only_a > 0 and only_b > 0  # genuine misses both directions
