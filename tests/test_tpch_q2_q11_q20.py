"""Edge cases for the q2/q11/q20 TPC-H adaptations on crafted data:

- q2 keeps ALL suppliers tied at a part's min cost, ignores non-EUROPE
  suppliers even when cheaper, and ignores non-STANDARD parts;
- q11's share threshold is STRICT (a part whose value lands exactly at
  0.1% of the total is excluded) — possible to pin because both sides
  compute in integer cents;
- q20's majority is STRICT (a supplier with exactly half a part's
  quantity does not qualify), out-of-year lineitems and non-matching
  part names are ignored.
Each engine result is also compared against the registered DuckDB
oracle on the same crafted tables (the compare the driver gate runs).
"""

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


def _con(sf_dir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _cmp(got, exp):
    got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _lineitem(rows):
    ok, pk, sk, qty, ep, disc, ship = zip(*rows)
    n = len(rows)
    return pa.table(
        {
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
            "l_suppkey": pa.array(sk, pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int32()),
            "l_quantity": pa.array(qty, pa.float64()),
            "l_extendedprice": pa.array(ep, pa.float64()),
            "l_discount": pa.array(disc, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n),
            "l_linestatus": pa.array(["O"] * n),
            "l_shipdate": pa.array(
                [pd.Timestamp(s) for s in ship], pa.timestamp("us")
            ),
        }
    )


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tpch_edges")
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["EUROPE", "OTHER"]),
            }
        ),
        str(root / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["NATION_3", "NATION_9"]),
                "n_regionkey": pa.array([0, 1], pa.int32()),
            }
        ),
        str(root / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["S1", "S2", "S3"]),
                "s_nationkey": pa.array([0, 0, 1], pa.int32()),
                "s_acctbal": pa.array([10.0, 20.0, 30.0], pa.float64()),
            }
        ),
        str(root / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_name": pa.array(["small ring", "big bolt", "small gear"]),
                "p_brand": pa.array(["Brand#1"] * 3),
                "p_type": pa.array(["STANDARD", "PROMO", "STANDARD"]),
                "p_size": pa.array([1, 2, 3], pa.int32()),
                "p_retailprice": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        ),
        str(root / "part.parquet"),
    )
    # (orderkey, partkey, suppkey, qty, extendedprice, discount, shipdate)
    pq.write_table(
        _lineitem(
            [
                (1, 1, 1, 2.0, 20.00, 0.0, "1997-06-01"),  # p1/s1 unit 10.00, q=200
                (2, 1, 2, 1.0, 10.00, 0.0, "1997-06-02"),  # p1/s2 unit 10.00 (tie), q=100
                (3, 1, 3, 1.0, 5.00, 0.0, "1997-06-03"),  # s3 non-EU: cheaper but ignored by q2; makes s1 EXACTLY half of p1 qty
                (4, 3, 1, 4.0, 30.00, 0.0, "1996-01-01"),  # p3/s1 unit 7.50; out-of-year for q20
                (5, 3, 2, 1.0, 8.00, 0.0, "1997-03-01"),  # p3/s2 unit 8.00; sole in-year shipper → q20 winner
                (6, 2, 3, 1.0, 7.00, 0.0, "1997-05-01"),  # PROMO 'big bolt': invisible to q2 and q20
            ]
        ),
        str(root / "lineitem.parquet"),
    )
    return str(root)


def test_q2_keeps_ties_and_filters_region_and_type(ray_session, crafted_dir):
    got = QUERIES["q2_min_cost_supplier"](crafted_dir)
    # p1: s1 and s2 tie at 1000 cents (s3's cheaper offer is non-EU);
    # p3: s1 wins at 750; p2 is PROMO → absent.
    exp = pd.DataFrame(
        {
            "p_partkey": [1, 1, 3],
            "s_name": ["S1", "S2", "S1"],
            "s_acctbal": [10.0, 20.0, 10.0],
            "n_name": ["NATION_3", "NATION_3", "NATION_3"],
            "cost_cents": [1000, 1000, 750],
        }
    )
    _cmp(got, exp)
    con = _con(crafted_dir, ["region", "nation", "supplier", "part", "lineitem"])
    _cmp(got, con.execute(ORACLE_SQL["q2_min_cost_supplier"]).fetchdf())


def test_q20_strict_majority_and_pruning(ray_session, crafted_dir):
    got = QUERIES["q20_majority_share_suppliers"](crafted_dir)
    # p1 in-year quantities: s1=200, s2=100, s3=100 → s1 is EXACTLY half
    # (2·200 == 400): excluded.  p3 in-year: only s2 → winner.  The
    # 1996 shipment and the 'big bolt' part must not contribute.
    exp = pd.DataFrame({"s_name": ["S2"], "n_name": ["NATION_3"]})
    _cmp(got, exp)
    con = _con(crafted_dir, ["nation", "supplier", "part", "lineitem"])
    _cmp(got, con.execute(ORACLE_SQL["q20_majority_share_suppliers"]).fetchdf())


@pytest.fixture(scope="module")
def q11_threshold_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("q11_threshold")
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0], pa.int32()),
                "n_name": pa.array(["NATION_3"]),
                "n_regionkey": pa.array([0], pa.int32()),
            }
        ),
        str(root / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1], pa.int64()),
                "s_name": pa.array(["S1"]),
                "s_nationkey": pa.array([0], pa.int32()),
                "s_acctbal": pa.array([0.0], pa.float64()),
            }
        ),
        str(root / "supplier.parquet"),
    )
    # part values (cents): 50, 50, 50, 400, 450 → total 1000 over 5
    # parts, so the 2×-average cut is exactly 400.  p4 lands EXACTLY
    # on the boundary (400·5 == 2·1000, not >) → excluded; only p5
    # clears it.
    pq.write_table(
        _lineitem(
            [
                (1, 1, 1, 1.0, 0.50, 0.0, "1997-01-01"),
                (2, 2, 1, 1.0, 0.50, 0.0, "1997-01-02"),
                (3, 3, 1, 1.0, 0.50, 0.0, "1997-01-03"),
                (4, 4, 1, 1.0, 4.00, 0.0, "1997-01-04"),
                (5, 5, 1, 1.0, 4.50, 0.0, "1997-01-05"),
            ]
        ),
        str(root / "lineitem.parquet"),
    )
    return str(root)


def test_q11_threshold_is_strict(ray_session, q11_threshold_dir):
    got = QUERIES["q11_important_parts"](q11_threshold_dir).to_pandas()
    exp = pd.DataFrame({"l_partkey": [5], "value_cents": [450]})
    _cmp(got, exp)
    con = _con(q11_threshold_dir, ["nation", "supplier", "lineitem"])
    _cmp(got, con.execute(ORACLE_SQL["q11_important_parts"]).fetchdf())
