"""Edge cases for the round-3 continuation ops on crafted data:

- events_session_funnel: strict click-before-purchase (purchase-first
  and equal-timestamp sessions must NOT convert; a 30-min gap splits
  an otherwise-converting pair into two non-converting sessions);
- events_type_transition_matrix: single-event users emit no pair;
  equal timestamps break ties by event_id;
- orders_rolling_3m_revenue: a <3-month history shrinks the frame
  (AVG over 1 then 2 rows), matching the ROWS BETWEEN oracle;
- lineitem_brand_type_share: facts whose partkey is absent from the
  dimension drop (inner join), and shares sum to 1 per type;
- corpus_hapax_stats / corpus_vocab_overlap: empty docs, all-hapax
  sources, cross-doc repeats within a source, disjoint-vocab pairs
  dropping, identical-vocab pairs scoring jaccard = 1.
Each engine result is compared against its registered DuckDB oracle
on the same crafted tables (the same compare the driver gate runs).
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


def _cmp(got, exp, keys=None):
    if keys:
        got = got.sort_values(keys).reset_index(drop=True)
        exp = exp.sort_values(keys).reset_index(drop=True)
    assert sorted(got.columns) == sorted(exp.columns)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        exp[sorted(exp.columns)].reset_index(drop=True),
        check_dtype=False,
    )


def _to_pandas(obj):
    return obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("r3b_edges")
    t0 = pd.Timestamp("2024-01-01 12:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: click then purchase, same session -> converted
        (101, t0, 1, "click"),
        (102, t0 + 5 * m, 1, "purchase"),
        # user 2: purchase BEFORE click, same session -> not converted
        (201, t0, 2, "purchase"),
        (202, t0 + 5 * m, 2, "click"),
        # user 3: click, 31-min gap, purchase -> two sessions, neither converts
        (301, t0, 3, "click"),
        (302, t0 + 31 * m, 3, "purchase"),
        # user 4: click and purchase at the SAME ts -> strict <, no convert
        # (event_id orders the tie deterministically on both sides)
        (401, t0, 4, "click"),
        (402, t0, 4, "purchase"),
        # user 5: single event -> one session, no transition pair
        (501, t0, 5, "view"),
        # user 6: three events with an equal-ts pair: view(610) @t0,
        # click(611) @t0, purchase(612) @t0+1m -> pairs view>click, click>purchase
        (610, t0, 6, "view"),
        (611, t0, 6, "click"),
        (612, t0 + 1 * m, 6, "purchase"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
            }
        ),
        str(root / "events.parquet"),
    )
    # two months only: the 3-month frame must shrink to 1 then 2 rows
    pq.write_table(
        pa.table(
            {
                "o_orderdate": pa.array(
                    pd.to_datetime(
                        ["2024-01-05", "2024-01-20", "2024-02-10"]
                    ),
                    pa.timestamp("us"),
                ),
                "o_totalprice": pa.array([100.00, 50.00, 200.00]),
            }
        ),
        str(root / "orders.parquet"),
    )
    # part 3 is never referenced; lineitem partkey 99 has no dimension row
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_brand": pa.array(["Brand#A", "Brand#B", "Brand#A"]),
                "p_type": pa.array(["TYPE1", "TYPE1", "TYPE2"]),
            }
        ),
        str(root / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 1, 2, 99], pa.int64()),
                "l_extendedprice": pa.array([10.0, 20.0, 30.0, 1000.0]),
                "l_discount": pa.array([0.0, 0.5, 0.1, 0.0]),
            }
        ),
        str(root / "lineitem.parquet"),
    )
    # srcA: "x x y" (x repeats ACROSS docs -> not hapax; y hapax)
    # srcB: all-hapax vocab {x, z} -> overlap with srcA on {x}
    # srcC: empty + whitespace-only docs -> zero vocab, no overlap rows
    # srcD: identical vocab to srcB -> jaccard exactly 1.0
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "text": pa.array(["x x y", "x", "x z", "", " ", "z x"]),
                "source": pa.array(
                    ["srcA", "srcA", "srcB", "srcC", "srcC", "srcD"]
                ),
            }
        ),
        str(root / "documents.parquet"),
    )
    return str(root)


def test_session_funnel_strictness(ray_session, crafted_dir):
    got = _to_pandas(QUERIES["events_session_funnel"](crafted_dir))
    con = _con(crafted_dir, ["events"])
    exp = con.execute(ORACLE_SQL["events_session_funnel"]).fetchdf()
    _cmp(got, exp)
    # sessions: u1=1, u2=1, u3=2, u4=1, u5=1, u6=1 -> 7; u1 and u6 convert
    # (u2 purchase-first, u3 split by the gap, u4 equal-ts -> all excluded)
    assert got["n_sessions"].iloc[0] == 7
    assert got["n_converted"].iloc[0] == 2


def test_transition_matrix_ties_and_singletons(ray_session, crafted_dir):
    got = _to_pandas(QUERIES["events_type_transition_matrix"](crafted_dir))
    con = _con(crafted_dir, ["events"])
    exp = con.execute(ORACLE_SQL["events_type_transition_matrix"]).fetchdf()
    _cmp(got, exp, ["prev_type", "next_type"])
    pairs = set(zip(got["prev_type"], got["next_type"]))
    assert ("view", "click") in pairs  # u6's equal-ts pair, eid order
    # u5's singleton contributes nothing
    assert got["n"].sum() == 6


def test_rolling_3m_short_history(ray_session, crafted_dir):
    got = _to_pandas(QUERIES["orders_rolling_3m_revenue"](crafted_dir))
    con = _con(crafted_dir, ["orders"])
    exp = con.execute(ORACLE_SQL["orders_rolling_3m_revenue"]).fetchdf()
    _cmp(got, exp, ["month"])
    g = got.sort_values("month").reset_index(drop=True)
    assert g["avg_3m_cents"].iloc[0] == 15000.0  # jan alone
    assert g["avg_3m_cents"].iloc[1] == (15000 + 20000) / 2  # jan+feb


def test_brand_type_share_inner_join_and_unity(ray_session, crafted_dir):
    got = _to_pandas(QUERIES["lineitem_brand_type_share"](crafted_dir))
    con = _con(crafted_dir, ["lineitem", "part"])
    exp = con.execute(ORACLE_SQL["lineitem_brand_type_share"]).fetchdf()
    _cmp(got, exp, ["p_type", "p_brand"])
    # orphan partkey 99 dropped; TYPE2 (part 3) never bought -> absent
    assert set(got["p_type"]) == {"TYPE1"}
    assert abs(got.groupby("p_type")["type_share"].sum().iloc[0] - 1.0) < 1e-12


def test_hapax_stats_edges(ray_session, crafted_dir):
    got = _to_pandas(QUERIES["corpus_hapax_stats"](crafted_dir))
    con = _con(crafted_dir, ["documents"])
    exp = con.execute(ORACLE_SQL["corpus_hapax_stats"]).fetchdf()
    _cmp(got, exp, ["source"])
    by = got.set_index("source")
    # srcA: x appears 3 times (2 in doc1 + doc2), y once -> 1 hapax of 2
    assert by.loc["srcA", "vocab_n"] == 2 and by.loc["srcA", "hapax_n"] == 1
    # srcC's docs tokenize to nothing -> no row at all (oracle drops it too)
    assert "srcC" not in by.index


def test_vocab_overlap_edges(ray_session, crafted_dir):
    got = _to_pandas(QUERIES["corpus_vocab_overlap"](crafted_dir))
    con = _con(crafted_dir, ["documents"])
    exp = con.execute(ORACLE_SQL["corpus_vocab_overlap"]).fetchdf()
    _cmp(got, exp, ["src_a", "src_b"])
    key = got.set_index(["src_a", "src_b"])
    # identical vocab {x, z} -> jaccard exactly 1.0
    assert key.loc[("srcB", "srcD"), "jaccard"] == 1.0
    # srcC has no tokens: never appears on either side
    assert not ((got["src_a"] == "srcC") | (got["src_b"] == "srcC")).any()


@pytest.fixture(scope="module")
def cdc_crafted_dir(tmp_path_factory):
    """Events crafted for the derived changelog (lsn=event_id,
    turn_idx=event_id%100, conv=conv-<user_id>): user 1 writes the
    SAME key three times with event time running backwards on the
    middle pair; user 2 touches two distinct keys in time order."""
    root = tmp_path_factory.mktemp("cdc_obs_edges")
    t0 = pd.Timestamp("2024-03-01 09:00:00")
    h = pd.Timedelta(hours=1)
    pq.write_table(
        pa.table(
            {
                # u1: lsn 100 @t0+2h, 200 @t0 (backstep 2h), 300 @t0+3h
                # -> key (conv-1, 0) changed 3x, 1 inversion of 2 pairs
                # u2: lsn 101 @t0, 102 @t0+1h -> keys 1 and 2, no conflict
                "event_id": pa.array([100, 200, 300, 101, 102], pa.int64()),
                "ts": pa.array(
                    [t0 + 2 * h, t0, t0 + 3 * h, t0, t0 + h], pa.timestamp("us")
                ),
                "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "event_type": pa.array(["click", "view", "click", "view", "click"]),
                "props": pa.array(["a", "b", "c", "d", "e"]),
            }
        ),
        str(root / "events.parquet"),
    )
    return str(root)


def test_cdc_conflict_stats_edges(ray_session, cdc_crafted_dir):
    got = _to_pandas(QUERIES["cdc_conflict_stats"](cdc_crafted_dir))
    con = _con(cdc_crafted_dir, ["events"])
    exp = con.execute(ORACLE_SQL["cdc_conflict_stats"]).fetchdf()
    _cmp(got, exp, ["conv_id"])
    by = got.set_index("conv_id")
    assert by.loc["conv-1", "n_keys"] == 1
    assert by.loc["conv-1", "n_conflicted"] == 1
    assert by.loc["conv-1", "max_changes"] == 3
    assert by.loc["conv-2", "n_conflicted"] == 0


def test_wal_reorder_stats_edges(ray_session, cdc_crafted_dir):
    got = _to_pandas(QUERIES["wal_reorder_stats"](cdc_crafted_dir))
    con = _con(cdc_crafted_dir, ["events"])
    exp = con.execute(ORACLE_SQL["wal_reorder_stats"]).fetchdf()
    _cmp(got, exp, ["conv_id"])
    by = got.set_index("conv_id")
    # u1 pairs in lsn order: (100->200) ts backsteps 2h, (200->300) forward
    assert by.loc["conv-1", "n_pairs"] == 2
    assert by.loc["conv-1", "n_inversions"] == 1
    assert by.loc["conv-1", "max_backstep_us"] == 2 * 3600 * 1_000_000
    assert by.loc["conv-2", "n_inversions"] == 0


@pytest.fixture(scope="module")
def rfm_crafted_dir(tmp_path_factory):
    """7 customers (7 mod 5 = 2 -> the first two quintiles take 2 rows,
    SQL NTILE geometry) with deliberate TIES on every measure so the
    custkey tie-break decides tile boundaries: custkeys 1-4 all have 1
    order of 100.00 on the same date; 5-7 have 2 orders each with
    distinct totals/dates."""
    root = tmp_path_factory.mktemp("rfm_edges")
    d = pd.to_datetime
    rows = [
        # custkey, orderdate, totalprice
        (1, "2024-01-10", 100.00),
        (2, "2024-01-10", 100.00),
        (3, "2024-01-10", 100.00),
        (4, "2024-01-10", 100.00),
        (5, "2024-02-01", 50.00),
        (5, "2024-03-01", 60.00),
        (6, "2024-02-15", 70.00),
        (6, "2024-03-10", 80.00),
        (7, "2024-01-05", 300.00),
        (7, "2024-03-20", 10.00),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
                "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_orderdate": pa.array(d([r[1] for r in rows]), pa.timestamp("us")),
                "o_totalprice": pa.array([r[2] for r in rows]),
            }
        ),
        str(root / "orders.parquet"),
    )
    return str(root)


def test_rfm_ntile_geometry_and_ties(ray_session, rfm_crafted_dir):
    got = _to_pandas(QUERIES["customer_rfm_segments"](rfm_crafted_dir))
    con = _con(rfm_crafted_dir, ["orders"])
    exp = con.execute(ORACLE_SQL["customer_rfm_segments"]).fetchdf()
    _cmp(got, exp, ["o_custkey"])
    by = got.set_index("o_custkey").sort_index()
    # frequency: custkeys 1-4 tie at 1 order; NTILE(5) over 7 rows gives
    # tile sizes 2,2,1,1,1 -> custkey order puts 1,2 in f_tile 1; 3,4 in 2
    assert by.loc[1, "f_tile"] == 1 and by.loc[2, "f_tile"] == 1
    assert by.loc[3, "f_tile"] == 2 and by.loc[4, "f_tile"] == 2
    assert by.loc[5, "f_tile"] == 3  # 2-order customers fill tiles 3..5
    # every tile is within 1..5 and the code composes the three digits
    assert got[["r_tile", "f_tile", "m_tile"]].isin(range(1, 6)).all().all()
    assert (
        got["rfm_code"]
        == got["r_tile"] * 100 + got["f_tile"] * 10 + got["m_tile"]
    ).all()


def test_response_latency_by_role_edges(ray_session, cdc_crafted_dir):
    """Role-handoff latency over the replayed state: the crafted WAL's
    conv-1 keeps only lsn 300 for key 0 (LWW), so the state has one
    conversation with one turn per conv -> conv-1 contributes no gap;
    conv-2 has turns 1,2 with a 1h gap (view -> click)."""
    got = _to_pandas(QUERIES["conversation_response_latency_by_role"](cdc_crafted_dir))
    con = _con(cdc_crafted_dir, ["events"])
    exp = con.execute(
        ORACLE_SQL["conversation_response_latency_by_role"]
    ).fetchdf()
    _cmp(got, exp, ["prev_role", "role"])
    assert len(got) == 1
    assert got.iloc[0]["prev_role"] == "view" and got.iloc[0]["role"] == "click"
    assert got.iloc[0]["sum_gap_us"] == 3600 * 1_000_000


def test_pca_topk_matches_direct_numpy(ray_session):
    """The distributed one-pass covariance spectrum must equal a
    direct in-memory PCA over the same table (column means removed,
    ddof=1), pinning both the Gram/mean partial algebra and the
    eigenvalue ordering."""
    import numpy as np
    import pyarrow.parquet as pqt

    sf = "/root/testdata/sf0.001"
    got = _to_pandas(QUERIES["embedding_pca_topk"](sf))
    t = pqt.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    col = t.column("embedding").combine_chunks()
    off = np.asarray(col.offsets, dtype=np.int64)
    m = np.asarray(col.values, dtype=np.float64)[off[0]:off[-1]].reshape(
        len(col), int(off[1] - off[0])
    )
    cov = np.cov(m, rowvar=False, ddof=1)
    evals = np.linalg.eigvalsh(cov)[::-1]
    np.testing.assert_allclose(
        got["eigenvalue"].to_numpy(), evals[: len(got)], rtol=1e-9
    )
    np.testing.assert_allclose(
        got["explained_ratio"].to_numpy(),
        evals[: len(got)] / evals.sum(),
        rtol=1e-9,
    )
    assert (got["explained_ratio"] > 0).all()


def test_new_ops_plan_shapes(ray_session):
    """Exchange budgets for the round-3 continuation ops (asserted on
    the executed plan, the [test_latest_ops_plan_shapes] pattern):
    transition matrix / conflict / reorder / gram = ONE coarse-bucket
    exchange each (the final ≤groups-row Aggregate is not a
    SortReduce); RFM = reduce + fused rank + pivot (3); the as-of
    replay keeps the flagship's single merge exchange."""
    sf = "/root/testdata/sf0.001"
    for name, budget in {
        "events_type_transition_matrix": 1,
        "cdc_conflict_stats": 1,
        "wal_reorder_stats": 1,
        "embedding_gram_matrix": 1,
        "cdc_replay_asof": 1,
        "customer_rfm_segments": 3,
    }.items():
        res = QUERIES[name](sf)
        stats = res.materialize().stats()
        assert stats.count("SortReduce") <= budget, (name, stats)


def test_cohort_matrix_edges(ray_session, crafted_dir):
    """Crafted events span one week: every user lands in its own first
    week with offset 0, and each user counts ONCE per active week even
    with many events (distinct (user, week) dedup)."""
    got = _to_pandas(QUERIES["events_cohort_matrix"](crafted_dir))
    con = _con(crafted_dir, ["events"])
    exp = con.execute(ORACLE_SQL["events_cohort_matrix"]).fetchdf()
    _cmp(got, exp, ["cohort_week", "week_offset"])
    assert (got["week_offset"] == 0).all()
    assert got["n_users"].sum() == 6  # 6 distinct users, 1 week each


def test_cohort_and_size_plan_shapes(ray_session):
    sf = "/root/testdata/sf0.001"
    for name, budget in {
        "events_cohort_matrix": 2,  # user bucket + tiny final sum
        "orders_size_distribution": 2,  # orderkey bucket + tiny final sum
    }.items():
        res = QUERIES[name](sf)
        stats = res.materialize().stats()
        assert stats.count("SortReduce") <= budget, (name, stats)
