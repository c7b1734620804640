"""Edge cases for the rate-limit / preference-pair / curriculum-ntile
operators on crafted data:

- events_rate_limit: same-day overflow drops slot>3; ts ties broken by
  event_id; day boundaries reset the budget; keys split across blocks;
- preference_pairs: 1-turn convs excluded; all-equal scores pick
  (min turn, max turn); null text scores -1; delete tombstones leave
  the conversation before pairing;
- curriculum_ntile_stages: ties on n_tokens straddling a stage
  boundary split by doc_id exactly as SQL NTILE does, for totals both
  divisible and non-divisible by 4 (uneven tile sizes).
Compared against the registered DuckDB oracles (same compare as the
driver gate).
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
    _ntile_of_rank,
)


def _cmp(got, exp, keys):
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert sorted(got.columns) == sorted(exp.columns)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _oracle(sf_dir: str, name: str, tables) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(ORACLE_SQL[name]).fetchdf()


def _write_events(tmp_path, rows):
    ev = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array([r[4] for r in rows]),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_rate_limit_overflow_ties_and_day_reset(ray_session, tmp_path):
    # user 1 day 1: five events, two sharing ts (tie -> event_id) —
    # keep 3; user 1 day 2: budget resets; user 2 independent.
    rows = [
        (10, "2024-01-01T10:00:00", 1, "click", None),
        (11, "2024-01-01T10:00:00", 1, "click", None),  # ts tie with 10
        (12, "2024-01-01T11:00:00", 1, "click", None),
        (13, "2024-01-01T12:00:00", 1, "click", None),  # slot 4 -> drop
        (14, "2024-01-01T23:59:59", 1, "click", None),  # slot 5 -> drop
        (15, "2024-01-02T00:00:00", 1, "click", None),  # new day, slot 1
        (16, "2024-01-01T05:00:00", 2, "view", None),
    ]
    sf = _write_events(tmp_path, rows)
    got = QUERIES["events_rate_limit"](sf).to_pandas()
    exp = _oracle(sf, "events_rate_limit", ["events"])
    _cmp(got, exp, ["event_id"])
    kept = set(got["event_id"])
    assert kept == {10, 11, 12, 15, 16}
    slots = got.set_index("event_id")["slot"]
    assert slots[10] == 1 and slots[11] == 2 and slots[12] == 3 and slots[15] == 1


def test_preference_pairs_singleton_ties_nulls_and_deletes(ray_session, tmp_path):
    # conv-1 (user 1): three live turns, scores 9/2/9 -> chosen is the
    #   LOWER turn of the len-9 tie, rejected is the len-2 turn;
    # conv-2 (user 2): single live turn -> excluded;
    # conv-3 (user 3): two turns with EQUAL scores -> chosen=min turn,
    #   rejected=max turn;
    # conv-4 (user 4): null text (len -1) loses to a real turn;
    # conv-5 (user 5): two inserts then a delete of one -> singleton,
    #   excluded.
    rows = [
        (101, "2024-01-01T00:00:01", 1, "signup", "x" * 9),
        (102, "2024-01-01T00:00:02", 1, "click", "yy"),
        (103, "2024-01-01T00:00:03", 1, "click", "z" * 9),
        (201, "2024-01-01T00:00:01", 2, "signup", "solo"),
        (301, "2024-01-01T00:00:01", 3, "signup", "aaaa"),
        (302, "2024-01-01T00:00:02", 3, "click", "bbbb"),
        (401, "2024-01-01T00:00:01", 4, "signup", None),
        (402, "2024-01-01T00:00:02", 4, "click", "ok"),
        (501, "2024-01-01T00:00:01", 5, "signup", "live"),
        (502, "2024-01-01T00:00:02", 5, "click", "dead"),
        # turn_idx = event_id % 100, so lsn 602 deletes conv-5 turn 2 (=502)
        (602, "2024-01-01T00:00:03", 5, "error", None),
    ]
    sf = _write_events(tmp_path, rows)
    got = QUERIES["preference_pairs"](sf).to_pandas()
    exp = _oracle(sf, "preference_pairs", ["events"])
    _cmp(got, exp, ["conv_id"])
    r = got.set_index("conv_id")
    assert set(r.index) == {"conv-1", "conv-3", "conv-4"}
    assert r.loc["conv-1", "chosen_turn_idx"] == 1  # tie -> lower turn
    assert r.loc["conv-1", "rejected_turn_idx"] == 2
    assert r.loc["conv-1", "margin"] == 7
    assert r.loc["conv-3", "chosen_turn_idx"] == 1  # all-equal: min turn
    assert r.loc["conv-3", "rejected_turn_idx"] == 2  # all-equal: max turn
    assert r.loc["conv-3", "margin"] == 0
    assert r.loc["conv-4", "rejected_len"] == -1  # null text


@pytest.mark.parametrize("n_docs", [16, 17, 18, 19])
def test_curriculum_ntile_tie_splits(ray_session, tmp_path, n_docs):
    # All docs share ONE of two token counts so the stage boundary
    # falls inside a tie run; doc_id must split it exactly like NTILE.
    rows = []
    for i in range(n_docs):
        tok = 2 if i < n_docs - 3 else 5  # big tie run + a small tail
        rows.append((1000 + i, " ".join(["w"] * tok), "en", f"src{i % 2}", 1))
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = QUERIES["curriculum_ntile_stages"](str(tmp_path))
    exp = _oracle(str(tmp_path), "curriculum_ntile_stages", ["documents"])
    _cmp(got, exp, ["stage", "source"])
    assert got["n_docs"].sum() == n_docs


def test_ntile_of_rank_matches_duckdb():
    for total in (1, 2, 3, 4, 5, 7, 8, 100, 101, 103):
        ranks = np.arange(1, total + 1, dtype=np.int64)
        got = _ntile_of_rank(ranks, total, 4)
        exp = (
            duckdb.sql(
                f"SELECT ntile(4) OVER (ORDER BY r) FROM (SELECT unnest(range(1, {total + 1})) r)"
            )
            .fetchnumpy()
        )
        exp = exp[list(exp.keys())[0]].astype(np.int64)
        assert (got == exp).all(), total


def test_new_ops_plan_shapes(ray_session):
    """Exchange budgets at sf0.001: rate limit = one bucket exchange;
    preference pairs = the replay's ONE shuffle, nothing extra.
    (Driver-folded queries returning DataFrames — curriculum,
    contamination — have no live plan to assert on and are excluded.)"""
    sf = "/root/testdata/sf0.001"
    budgets = {"events_rate_limit": 1, "preference_pairs": 1}
    for name, budget in budgets.items():
        stats = QUERIES[name](sf).materialize().stats()
        assert stats.count("SortReduce") <= budget, (name, stats)


def test_partial_updates_patch_semantics(ray_session, tmp_path):
    """Sparse-WAL merge rules, crafted per key (turn_idx = id % 100;
    updates null role when id%3==0 and text when id%2==0):

    - conv-7/51: insert(role=signup, text=v1) then a patch with role
      omitted and text=v2 -> role falls through to signup, text=v2;
    - conv-8/52: insert(w1), DELETE, then a patch with text omitted ->
      row exists with text NULL (tombstone cleared pre-delete history);
    - conv-9/53: insert then delete, nothing after -> gone;
    - conv-10/54: a single patch upsert with text omitted -> role from
      the patch, text NULL;
    - conv-11/55: three text writers -> the last non-null (lsn 555)
      wins text, while its omitted role falls back to lsn 355's.
    """
    rows = [
        (151, "2024-01-01T00:00:01", 7, "signup", "v1"),
        (351, "2024-01-01T00:00:02", 7, "click", "v2"),   # 351%3==0: role omitted
        (152, "2024-01-01T00:00:01", 8, "signup", "w1"),
        (252, "2024-01-01T00:00:02", 8, "error", None),    # delete
        (352, "2024-01-01T00:00:03", 8, "click", "w2"),    # 352%2==0: text omitted
        (153, "2024-01-01T00:00:01", 9, "signup", "x1"),
        (253, "2024-01-01T00:00:02", 9, "error", None),    # delete, final
        (554, "2024-01-01T00:00:01", 10, "click", "y1"),   # 554%2==0: text omitted
        (155, "2024-01-01T00:00:01", 11, "signup", "a"),
        (355, "2024-01-01T00:00:02", 11, "click", "b"),
        (555, "2024-01-01T00:00:03", 11, "view", "c"),     # 555%3==0: role omitted
    ]
    sf = _write_events(tmp_path, rows)
    got = QUERIES["cdc_replay_partial_updates"](sf).to_pandas()
    exp = _oracle(sf, "cdc_replay_partial_updates", ["events"])
    _cmp(got, exp, ["conv_id", "turn_idx"])
    r = got.set_index(["conv_id", "turn_idx"])
    assert ("conv-9", 53) not in r.index
    assert r.loc[("conv-7", 51), "role"] == "signup" and r.loc[("conv-7", 51), "text"] == "v2"
    assert r.loc[("conv-8", 52), "role"] == "click" and pd.isna(r.loc[("conv-8", 52), "text"])
    assert r.loc[("conv-10", 54), "role"] == "click" and pd.isna(r.loc[("conv-10", 54), "text"])
    assert r.loc[("conv-11", 55), "text"] == "c" and r.loc[("conv-11", 55), "role"] == "click"


def test_partial_updates_plan_shape(ray_session):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        cdc_replay_partial_updates,
    )

    stats = cdc_replay_partial_updates("/root/testdata/sf0.001").materialize().stats()
    assert stats.count("SortReduce") <= 1, stats


def test_value_decile_drift_edges(ray_session, tmp_path):
    """Drift bucketing edges: a type with NO baseline rows lands every
    drifted row in decile 1; an all-constant baseline puts every equal
    value in decile 1 (boundaries are never strictly below it) and
    larger values in decile 10; boundary ties use strictly-less."""
    rows = []
    eid = 1
    # type 'flat': baseline all 2.00, drifted half 2.00 / half 9.99
    for _ in range(20):
        rows.append((eid, "2024-01-05T00:00:00", 1, "flat", 2.0)); eid += 1
    for _ in range(5):
        rows.append((eid, "2024-01-20T00:00:00", 1, "flat", 2.0)); eid += 1
    for _ in range(5):
        rows.append((eid, "2024-01-20T00:00:00", 1, "flat", 9.99)); eid += 1
    # type 'new': no baseline rows at all
    for _ in range(4):
        rows.append((eid, "2024-01-25T00:00:00", 2, "new", 123.45)); eid += 1
    ev = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([float(r[4]) for r in rows]),
            "props": pa.array([None] * len(rows), pa.string()),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    got = QUERIES["events_value_decile_drift"](str(tmp_path))
    exp = _oracle(str(tmp_path), "events_value_decile_drift", ["events"])
    _cmp(got, exp, ["event_type", "decile"])
    r = got.set_index(["event_type", "decile"])
    assert r.loc[("flat", 1), "n_a"] == 20 and r.loc[("flat", 1), "n_b"] == 5
    assert r.loc[("flat", 10), "n_b"] == 5  # drifted mass lands past all bounds
    assert r.loc[("new", 1), "n_b"] == 4 and r.loc[("new", 1), "n_a"] == 0


def _write_emb(path, vecs):
    emb = pa.table(
        {
            "vec_id": pa.array(list(vecs), pa.int64()),
            "embedding": pa.array([v[0] for v in vecs.values()], pa.list_(pa.float32())),
            "label": pa.array([v[1] for v in vecs.values()], pa.int32()),
        }
    )
    pq.write_table(emb, str(path / "embeddings.parquet"))
    return str(path)


def test_hard_negatives_label_exclusion_and_ties(ray_session, tmp_path):
    """Case A: every vector shares the query's label -> empty output.
    Case B: the query's nearest same-label vector is skipped; two
    identical-embedding different-label candidates tie exactly on sim
    and break by lower nid."""
    a = tmp_path / "a"; a.mkdir()
    sf_a = _write_emb(a, {
        0: ([1.0, 0.0, 0.0, 0.0], 9),
        1: ([0.9, 0.1, 0.0, 0.0], 9),
        2: ([0.0, 1.0, 0.0, 0.0], 9),
    })
    got = QUERIES["contrastive_hard_negatives"](sf_a).to_pandas()
    exp = _oracle(sf_a, "contrastive_hard_negatives", ["embeddings"])
    assert len(got) == 0 and len(exp) == 0

    b = tmp_path / "b"; b.mkdir()
    sf_b = _write_emb(b, {
        25: ([0.0, 1.0, 0.0, 0.0], 0),
        26: ([0.0, 0.99, 0.1, 0.0], 0),  # nearest but SAME label -> skipped
        30: ([0.0, 0.8, 0.6, 0.0], 1),   # tied pair, different labels
        31: ([0.0, 0.8, 0.6, 0.0], 2),
        40: ([0.0, 0.0, 0.0, 1.0], 3),   # orthogonal, lower sim
    })
    got = QUERIES["contrastive_hard_negatives"](sf_b).to_pandas()
    exp = _oracle(sf_b, "contrastive_hard_negatives", ["embeddings"])
    _cmp(got, exp, ["qid"])
    r = got.set_index("qid")
    assert r.loc[25, "nid"] == 30  # exact tie (30 vs 31) -> lower nid


def test_hard_negatives_bounded_queries_bucketed_finalizer(ray_session, tmp_path):
    """Scale-shape contract: (a) the query set is HARD-capped at
    _HN_MAX_QUERIES — vec_ids beyond 25·512 are corpus-only, so the
    broadcast matrix and per-batch matmul stay O(cap), never O(n);
    (b) the finalizer is a coarse-bucket vectorized keep-best —
    multiple queries resolve inside ONE group call with the (sim desc,
    nid asc) tie-break; (c) a corpus with NO qualifying query vector
    yields an empty result instead of crashing (np.stack-of-empty)."""
    import pyarrow as pa

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.similarity import (
        _HN_BUCKETS,
        _HN_MAX_QUERIES,
        _HN_QUERY_MOD,
        _hn_merge_bucket,
        _hn_select_queries,
    )

    # (a) cap: 25·512 and beyond excluded, earlier multiples kept
    cap_edge = _HN_QUERY_MOD * _HN_MAX_QUERIES
    t = pa.table(
        {
            "vec_id": pa.array([0, 25, 30, cap_edge, cap_edge + 25], pa.int64()),
            "embedding": pa.array([[1.0, 0.0]] * 5, pa.list_(pa.float32())),
            "label": pa.array([0, 1, 2, 3, 4], pa.int32()),
        }
    )
    kept = _hn_select_queries(t).column("vec_id").to_pylist()
    assert kept == [0, 25]

    # (b) one bucket group carrying three queries resolves vectorized
    g = pa.table(
        {
            "bucket": pa.array([0] * 6, pa.int32()),
            "qid": pa.array([0, 0, 25, 25, 50, 50], pa.int64()),
            "nid": pa.array([7, 3, 9, 8, 2, 1], pa.int64()),
            "sim": pa.array([0.9, 0.9, 0.5, 0.7, float("-inf"), float("-inf")]),
        }
    )
    out = _hn_merge_bucket(g).to_pandas().set_index("qid")
    assert out.loc[0, "nid"] == 3      # sim tie -> lower nid
    assert out.loc[25, "nid"] == 8     # higher sim wins
    assert 50 not in out.index         # all -inf candidates dropped
    assert _HN_BUCKETS <= _HN_MAX_QUERIES

    # (c) empty query set end-to-end (no vec_id % 25 == 0)
    d = tmp_path / "noq"; d.mkdir()
    sf = _write_emb(d, {
        1: ([1.0, 0.0, 0.0, 0.0], 0),
        2: ([0.0, 1.0, 0.0, 0.0], 1),
        3: ([0.0, 0.0, 1.0, 0.0], 2),
    })
    got = QUERIES["contrastive_hard_negatives"](sf).to_pandas()
    assert len(got) == 0


def test_loss_mask_spans_contiguity_and_nulls(ray_session, tmp_path):
    """Null text counts 0 tokens (empty span); spans are contiguous
    per conversation; deleted turns drop out of the packing."""
    rows = [
        (101, "2024-01-01T00:00:01", 1, "signup", "a b c"),      # 3 tokens
        (102, "2024-01-01T00:00:02", 1, "click", None),          # 0 tokens
        (103, "2024-01-01T00:00:03", 1, "purchase", "d e"),      # masked target
        (104, "2024-01-01T00:00:04", 1, "error", None),          # deletes turn 4
        (204, "2024-01-01T00:00:05", 1, "view", "x y z w"),      # turn 4 recreated
    ]
    sf = _write_events(tmp_path, rows)
    got = QUERIES["loss_mask_spans"](sf).to_pandas()
    exp = _oracle(sf, "loss_mask_spans", ["events"])
    _cmp(got, exp, ["conv_id", "turn_idx"])
    r = got.set_index("turn_idx").sort_index()
    assert list(r["tok_start"]) == [0, 3, 3, 5]
    assert list(r["tok_end"]) == [3, 3, 5, 9]
    assert list(r["loss_mask"]) == [0, 0, 1, 0]


def test_contamination_matrix_pair_math_and_empty(ray_session, tmp_path):
    """Pair counting: same-source C(c,2), cross-source c_x*c_y, keyed
    on the 100-char opening (doc 4 shares doc 1's opening but differs
    past char 100); an all-distinct corpus returns an EMPTY frame with
    a stable schema."""
    docs = [
        (1, "shared opening " * 10, "srcA"),            # 150 chars
        (2, "shared opening " * 10, "srcA"),            # same key, same source
        (3, "shared opening " * 10, "srcB"),            # same key, cross source
        (4, ("shared opening " * 10)[:100] + " DIFFERENT TAIL", "srcB"),
        (5, "something else entirely", "srcA"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs]),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array([d[2] for d in docs]),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    a = tmp_path / "a"; a.mkdir()
    pq.write_table(t, str(a / "documents.parquet"))
    got = QUERIES["source_contamination_matrix"](str(a))
    exp = _oracle(str(a), "source_contamination_matrix", ["documents"])
    _cmp(got, exp, ["source_a", "source_b"])
    r = got.set_index(["source_a", "source_b"])["n_pairs"]
    # docs 1,2 (srcA) and 3,4 (srcB) share the 100-char key:
    # AA pairs C(2,2 choose)=1, AB = 2*2 = 4, BB = C(2,2)=1
    assert r[("srcA", "srcA")] == 1 and r[("srcA", "srcB")] == 4 and r[("srcB", "srcB")] == 1

    b = tmp_path / "b"; b.mkdir()
    t2 = t.set_column(1, "text", pa.array(["u1", "u2 uu", "u3", "u4", "u5"]))
    pq.write_table(t2, str(b / "documents.parquet"))
    got2 = QUERIES["source_contamination_matrix"](str(b))
    assert len(got2) == 0 and list(got2.columns) == ["source_a", "source_b", "n_pairs"]


def test_sft_dataset_build_filters(ray_session, tmp_path):
    """Budget boundary is inclusive (== 96 kept); a conversation with
    no masked (purchase) turn is excluded even when tiny; an
    over-budget conversation is excluded even when masked."""
    rows = [
        # conv-1: 2 turns, 3 tokens total, one purchase -> kept
        (101, "2024-01-01T00:00:01", 1, "signup", "a b"),
        (103, "2024-01-01T00:00:02", 1, "purchase", "c"),
        # conv-2: masked but 97 tokens -> dropped (over budget)
        (201, "2024-01-01T00:00:01", 2, "purchase", " ".join(["t"] * 97)),
        # conv-3: exactly 96 tokens, masked -> kept (inclusive)
        (301, "2024-01-01T00:00:01", 3, "purchase", " ".join(["t"] * 96)),
        # conv-4: tiny but never masked -> dropped
        (401, "2024-01-01T00:00:01", 4, "signup", "x"),
        (402, "2024-01-01T00:00:02", 4, "click", "y"),
    ]
    sf = _write_events(tmp_path, rows)
    got = QUERIES["sft_dataset_build"](sf).to_pandas()
    exp = _oracle(sf, "sft_dataset_build", ["events"])
    _cmp(got, exp, ["conv_id"])
    r = got.set_index("conv_id")
    assert set(r.index) == {"conv-1", "conv-3"}
    assert r.loc["conv-1", "n_masked_tokens"] == 1
    assert r.loc["conv-3", "n_tokens"] == 96


def test_session4_plan_shapes(ray_session):
    """Exchange budgets at sf0.001 for the remaining session-4 ops:
    partial updates / sft = one all-to-all each (the conv exchange);
    hard negatives = one qid merge groupby.  (Driver-folded frames —
    contamination, drift, curriculum — have no live plan to assert.)"""
    budgets = {
        "cdc_replay_partial_updates": 1,
        "contrastive_hard_negatives": 1,
        "sft_dataset_build": 1,
    }
    sf = "/root/testdata/sf0.001"
    for name, budget in budgets.items():
        stats = QUERIES[name](sf).materialize().stats()
        assert stats.count("SortReduce") <= budget, (name, stats)


def test_context_windows_short_blocks_and_null_lines(ray_session, tmp_path):
    """Review findings (session-4): (a) a replay block with exactly 2-3
    rows must not crash the shifted-slice kernel (negative-length
    slice); (b) NULL-text predecessors follow the oracle's semantics —
    a NULL immediate predecessor line DROPS the target row, a NULL at
    distance 2 is skipped by the concat_ws chain."""
    rows = [
        # conv-1: t1 normal, t2 NULL text, t3 normal ->
        #   t2 kept (p1 = "signup: a"), t3 DROPPED (p1 from t2 is NULL,
        #   its p2 "signup: a" never rescues it in the oracle)
        (101, "2024-01-01T00:00:01", 1, "signup", "a"),
        (102, "2024-01-01T00:00:02", 1, "click", None),
        (103, "2024-01-01T00:00:03", 1, "view", "c"),
        # conv-2: exactly 2 live turns (short-block crash regression)
        (201, "2024-01-01T00:00:01", 2, "signup", "x"),
        (202, "2024-01-01T00:00:02", 2, "click", "y"),
    ]
    sf = _write_events(tmp_path, rows)
    got = QUERIES["conversation_context_windows"](sf).to_pandas()
    exp = _oracle(sf, "conversation_context_windows", ["events"])
    _cmp(got, exp, ["conv_id", "turn_idx"])
    r = got.set_index(["conv_id", "turn_idx"])
    assert ("conv-1", 3) not in r.index  # NULL p1 drops the target
    assert r.loc[("conv-1", 2), "context"] == "signup: a"
    assert r.loc[("conv-1", 2), "n_context"] == 1
    assert r.loc[("conv-2", 2), "context"] == "signup: x"


def test_contamination_matrix_null_text_ignored(ray_session, tmp_path):
    """NULL-text docs never pair (the oracle equi-join drops NULL
    keys), even when several share the NULL."""
    docs = [(1, None, "srcA"), (2, None, "srcA"), (3, None, "srcB"), (4, "real", "srcB")]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array([d[2] for d in docs]),
            "n_chars": pa.array([0] * len(docs), pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = QUERIES["source_contamination_matrix"](str(tmp_path))
    exp = _oracle(str(tmp_path), "source_contamination_matrix", ["documents"])
    assert len(got) == 0 and len(exp) == 0


def test_wal_gap_audit_gaps_and_cross_batch_dups(ray_session, tmp_path):
    """Crafted WAL with real gaps AND duplicate lsns split across two
    parquet row groups (hence different Ray blocks): the distinct
    count must stay exact, not a per-batch upper bound."""
    # lsns: 1..10 minus {4, 7} (2 missing), plus dups of 2 and 9
    lsns = [1, 2, 3, 5, 6, 8, 9, 10, 2, 9]
    rows = [(l, "2024-01-05T00:00:00", 1, "click", None) for l in lsns]
    ev = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"), row_group_size=5)
    got = QUERIES["wal_gap_audit"](str(tmp_path))
    exp = _oracle(str(tmp_path), "wal_gap_audit", ["events"])
    _cmp(got, exp, ["lsn_lo"])
    r = got.iloc[0]
    assert r["n_missing"] == 2 and r["n_duplicate"] == 2
    assert r["lsn_lo"] == 1 and r["lsn_hi"] == 10


def test_corpus_length_gini_known_values(ray_session, tmp_path):
    """Hand-checkable Gini statistics: equal lengths give W = Σx(n+1)/2
    (Gini 0); a fully concentrated corpus pins the closed form."""
    def write(docs, d):
        d.mkdir()
        t = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array([len(x) for x in docs], pa.int64()),
            }
        )
        pq.write_table(t, str(d / "documents.parquet"))
        return str(d)

    # 4 docs x 3 tokens: W = 3*(1+2+3+4) = 30, gini = 2*30/(4*12) - 5/4 = 0
    sf = write(["a b c"] * 4, tmp_path / "eq")
    got = QUERIES["corpus_length_gini"](sf)
    exp = _oracle(sf, "corpus_length_gini", ["documents"])
    _cmp(got, exp, ["n_docs"])
    r = got.iloc[0]
    assert r["weighted_rank_sum"] == 30 and r["sum_tokens"] == 12
    n, sx, w = r["n_docs"], r["sum_tokens"], r["weighted_rank_sum"]
    assert abs(2 * w / (n * sx) - (n + 1) / n) < 1e-12  # gini == 0

    # 1-token docs + one 10-token doc: sorted ranks put the big doc last
    sf2 = write(["x", "x", "x", " ".join(["y"] * 10)], tmp_path / "skew")
    got2 = QUERIES["corpus_length_gini"](sf2)
    exp2 = _oracle(sf2, "corpus_length_gini", ["documents"])
    _cmp(got2, exp2, ["n_docs"])
    assert got2.iloc[0]["weighted_rank_sum"] == 1 + 2 + 3 + 4 * 10
