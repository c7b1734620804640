"""Edge cases for the temporal-join / orphan-audit / similarity-join
operators on crafted WALs, each compared against its registered DuckDB
oracle (the same compare the driver gate runs):

- cdc_temporal_join: events before any dimension version map to
  'none'; a DELETED turn-0 header is not a joinable version; events
  attribute to the latest version with dim.lsn <= event.lsn, never a
  later one;
- cdc_orphaned_deletes: delete-before-first-upsert and delete-with-no-
  upsert are orphans; delete-after-insert is not;
- conversation_similarity_pairs: identical conversations score
  jaccard 1.0; whitespace/case differences normalize away; the
  df > _SIM_DF_CAP stop-element cut removes boilerplate elements from
  both pair generation AND set sizes (engine and oracle agree).
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
    _SIM_DF_CAP,
)


def _events(rows):
    eid = pa.array([r[0] for r in rows], pa.int64())
    return pa.table(
        {
            "event_id": eid,
            "ts": pa.array(
                [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=r[0]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def _run(name, sf_dir):
    got = QUERIES[name](str(sf_dir))
    df = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    exp = con.sql(ORACLE_SQL[name]).df()
    con.close()
    cols = sorted(df.columns)
    assert cols == sorted(exp.columns)
    got_s = df[cols].sort_values(cols).reset_index(drop=True)
    exp_s = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)
    return got_s


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("temporal_edges")
    rows = [
        # --- temporal join: user 1 has two dim versions (lsn 100 signup,
        # lsn 300 view); facts at 50 (before any version -> none),
        # 150 (-> signup, lag 50), 350 (-> view, lag 50)
        (50, 1, "click", "pre"),
        (100, 1, "signup", "hdr-v1"),
        (150, 1, "click", "f1"),
        (300, 1, "view", "hdr-v2"),
        (350, 1, "purchase", "f2"),
        # user 2: turn-0 header DELETED (error) -> not a version; the
        # later fact must join to none
        (200, 2, "error", "dead-hdr"),
        (250, 2, "click", "f3"),
        # --- orphaned deletes: user 3 turn 1: delete(401) before
        # insert(501) -> orphan; turn 2: insert(402) before delete(502)
        # -> not an orphan; user 4 turn 3: delete only -> orphan
        (401, 3, "error", "x"),
        (501, 3, "signup", "x"),
        (402, 3, "signup", "x"),
        (502, 3, "error", "x"),
        (603, 4, "error", "x"),
        # --- similarity: conv-5 and conv-6 identical at turns 10/11;
        # conv-7 matches turn 10 only, with case+whitespace noise that
        # the fingerprint normalization must erase
        (710, 5, "view", "alpha beta"),
        (711, 5, "view", "gamma"),
        (810, 6, "view", "alpha beta"),
        (811, 6, "view", "gamma"),
        (910, 7, "view", "Alpha  BETA"),
    ]
    # df-cap: _SIM_DF_CAP+6 users share one 'hot' boilerplate turn (99)
    n_hot = _SIM_DF_CAP + 6
    for k in range(n_hot):
        rows.append((10000 + k * 100 + 99, 100 + k, "view", "hot boilerplate"))
    pq.write_table(_events(rows), str(root / "events.parquet"))
    return root


def test_temporal_join_versions_and_dead_header(ray_session, crafted_dir):
    got = _run("cdc_temporal_join", crafted_dir)
    by_role = got.set_index("dim_role")
    # facts 50 (pre-version) and 250 (deleted header) -> none, lag 0
    assert by_role.loc["none", "n_events"] >= 2
    assert by_role.loc["signup", "n_events"] == 1
    assert by_role.loc["signup", "sum_lag"] == 50
    assert by_role.loc["view", "n_events"] == 1
    assert by_role.loc["view", "sum_lag"] == 50
    # no fact may attribute to a version written after it: every lag >= 0
    assert (got["sum_lag"] >= 0).all() and (got["max_lag"] >= 0).all()


def test_orphaned_deletes_crafted(ray_session, crafted_dir):
    got = _run("cdc_orphaned_deletes", crafted_dir)
    orphans = set(zip(got["conv_id"], got["turn_idx"]))
    assert ("conv-3", 1) in orphans  # delete(401) < insert(501)
    assert ("conv-4", 3) in orphans  # delete with no upsert ever
    assert ("conv-3", 2) not in orphans  # insert(402) < delete(502)


def test_similarity_identical_normalized_and_dfcap(ray_session, crafted_dir):
    got = _run("conversation_similarity_pairs", crafted_dir)
    pairs = {(a, b): j for a, b, j in zip(got["conv_a"], got["conv_b"], got["jaccard"])}
    # identical conversations: jaccard exactly 1.0
    assert pairs[("conv-5", "conv-6")] == 1.0
    # normalization: 'Alpha  BETA' == 'alpha beta'; conv-7 has 1 element
    assert pairs[("conv-5", "conv-7")] == pytest.approx(1 / 2)
    assert pairs[("conv-6", "conv-7")] == pytest.approx(1 / 2)
    # df cap: the hot boilerplate element (df = cap+6 > cap) generates
    # NO pairs among the hot-only conversations
    hot = [f"conv-{100 + k}" for k in range(_SIM_DF_CAP + 6)]
    assert not any((a in hot) or (b in hot) for a, b in pairs)


@pytest.fixture(scope="module")
def window_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("window_join_edges")
    t0 = pd.Timestamp("2024-01-01 12:00:00")

    def ev(eid, uid, typ, dt_s):
        return (eid, uid, typ, t0 + pd.Timedelta(seconds=dt_s))

    rows = [
        # user 1: purchase at +3600s; clicks at 0 (== ts-1h, COUNTS),
        # +1 (counts), +3600 (== ts, does NOT count), -1 (outside)
        ev(1, 1, "click", -1),
        ev(2, 1, "click", 0),
        ev(3, 1, "click", 1),
        ev(4, 1, "click", 3600),
        ev(5, 1, "purchase", 3600),
        # user 2: two purchases at the SAME (user, ts) — each counts
        # its own window (1 click apiece), n_purchases = 2
        ev(6, 2, "click", 100),
        ev(7, 2, "purchase", 200),
        ev(8, 2, "purchase", 200),
        # user 3: purchase with no clicks at all
        ev(9, 3, "purchase", 50),
        # user 4: clicks only -> no output row
        ev(10, 4, "click", 10),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["x"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(root / "events.parquet"))
    return root


def test_window_join_boundary_semantics(ray_session, window_dir):
    got = _run("window_join_clicks_purchases", window_dir)
    by_user = got.set_index("user_id")
    # [ts-1h, ts): clicks at 0s and +1s count; -1s and ==ts do not
    assert by_user.loc[1, "clicks_1h_sum"] == 2
    assert by_user.loc[1, "clicks_1h_max"] == 2
    # duplicate-(user, ts) purchases each counted
    assert by_user.loc[2, "n_purchases"] == 2
    assert by_user.loc[2, "clicks_1h_sum"] == 2
    # purchases with zero window clicks still emit a row
    assert by_user.loc[3, "clicks_1h_sum"] == 0
    # click-only users emit nothing
    assert 4 not in by_user.index


def test_new_ops_plan_shape_bounded_exchanges(ray_session):
    """All-to-all budgets for the new operator batch: the temporal
    join, orphan audit, and windowed join run ONE bucket exchange plus
    at most one tiny final groupby; the similarity join runs its three
    documented reduced-stream exchanges after the replay shuffle."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        cdc_orphaned_deletes,
        cdc_temporal_join,
        conversation_similarity_pairs,
        window_join_clicks_purchases,
    )

    sf = "/root/testdata/sf0.001"
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        corpus_prefix_dedup,
        orders_customer_adaptive_join,
    )

    for q, budget in (
        (cdc_temporal_join, 2),  # conv buckets + <=|roles| final groupby
        (cdc_orphaned_deletes, 1),
        (window_join_clicks_purchases, 1),
        # replay sort + element buckets + 2 conv-hash join exchanges
        (conversation_similarity_pairs, 4),
        # range exchange + O(ranges) stitch group
        (corpus_prefix_dedup, 2),
        # broadcast build -> only the <=|segments| final groupby shuffles
        (orders_customer_adaptive_join, 1),
    ):
        stats = q(sf).materialize().stats()
        assert stats.count("SortReduce") <= budget, (q.__name__, stats)


@pytest.fixture(scope="module")
def incr_index_dir(tmp_path_factory):
    """WAL crafted around the mid-split (max_lsn=2000 -> mid=1000):
    conv-20 untouched by the tail (carried forward), conv-21 fully
    deleted by the tail (must leave the index), conv-22 updated
    (fp must change), conv-23 created only in the tail."""
    root = tmp_path_factory.mktemp("incr_index")
    rows = [
        (120, 20, "view", "stable text"),
        (322, 21, "view", "doomed text"),
        (423, 22, "view", "old text"),
        (1322, 21, "error", "x"),          # deletes conv-21 turn 22
        (1423, 22, "view", "new text"),    # updates conv-22 turn 23
        (1524, 23, "view", "late text"),   # creates conv-23 turn 24
        (2000, 24, "view", "anchor"),      # sets max_lsn (turn 0)
    ]
    pq.write_table(_events(rows), str(root / "events.parquet"))
    return root


def test_incremental_index_delete_update_create(ray_session, incr_index_dir):
    got = _run("conversation_dedup_index_incremental", incr_index_dir)
    keeps = set(got["keep_conv_id"])
    # fully-deleted conversation left the index; late-created one joined
    assert "conv-21" not in keeps
    assert {"conv-20", "conv-22", "conv-23", "conv-24"} <= keeps
    assert (got["n_copies"] == 1).all()


def test_z_interleave_bijective_and_ordered():
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        _Z_BITS,
        _z_interleave,
    )

    n = 1 << _Z_BITS
    a = np.repeat(np.arange(n, dtype=np.int64), n)
    b = np.tile(np.arange(n, dtype=np.int64), n)
    z = _z_interleave(a, b)
    # bijection onto [0, n^2)
    assert sorted(z.tolist()) == list(range(n * n))
    # locality: adjacent cells in either dim differ in z by a power-of-2 pattern
    assert _z_interleave(np.array([0]), np.array([0]))[0] == 0
    assert _z_interleave(np.array([n - 1]), np.array([n - 1]))[0] == n * n - 1


def test_zorder_degenerate_dims(ray_session, tmp_path):
    """Single-user, single-instant events: bucket math must not divide
    by zero and the box (which collapses to that point) must still
    match the oracle."""
    rows = [(i, 7, "view", "x") for i in range(1, 21)]
    tbl = _events(rows)
    # force one single ts for every event
    tbl = tbl.set_column(
        1, "ts", pa.array([pd.Timestamp("2024-06-01")] * 20, pa.timestamp("us"))
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    _run("events_zorder_pruned_scan", tmp_path)
