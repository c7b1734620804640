"""Edge-case tests for the corpus mixing / quota-sampling / sequence-
packing / dialogue-pair operators on hand-crafted tiny tables (the
sf-scale oracle equivalence lives in the driver gate and
scripts/check_oracles.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
    _MIX_MULT,
    corpus_mix_weighted,
    pack_token_budget,
    quota_sample_per_source,
)


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, source, n_chars)."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array(["x" * r[2] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_mix_weighted_gate_matches_formula(ray_session, tmp_path):
    rows = [(i, f"src{i % 3}", 10) for i in range(60)]
    sf = _write_docs(tmp_path, rows)
    df = corpus_mix_weighted(sf).to_pandas().sort_values("doc_id")
    for _, r in df.iterrows():
        srcnum = int(r["source"][3:])
        rate = 10 + (srcnum * 7) % 86
        assert r["rate_pct"] == rate
        assert (int(r["doc_id"]) * _MIX_MULT) % 100 < rate
    # complement: every excluded doc fails the gate
    kept = set(df["doc_id"])
    for i, src, _ in rows:
        if i not in kept:
            rate = 10 + (int(src[3:]) * 7) % 86
            assert (i * _MIX_MULT) % 100 >= rate


def test_quota_sample_small_stratum_keeps_all_ranked(ray_session, tmp_path):
    # src0 has 2 docs (< k=5): both kept, ranks 1..2; src1 has 8: exactly 5
    rows = [(1, "src0", 5), (2, "src0", 5)] + [(10 + i, "src1", 5) for i in range(8)]
    sf = _write_docs(tmp_path, rows)
    df = quota_sample_per_source(sf).to_pandas()
    g0 = df[df["source"] == "src0"].sort_values("sample_rank")
    assert list(g0["sample_rank"]) == [1, 2]
    g1 = df[df["source"] == "src1"]
    assert len(g1) == 5
    # rank order follows the hash order
    h = (g1["doc_id"].to_numpy(np.int64) * _MIX_MULT) % 1_000_000_007
    assert list(g1.sort_values("sample_rank")["doc_id"]) == list(
        g1.assign(h=h).sort_values(["h", "doc_id"])["doc_id"]
    )


def test_pack_budget_straddle_and_offsets(ray_session, tmp_path):
    # budget=2048: doc 1 fills [0,1500), doc 2 (1000 chars) straddles
    # the 2048 boundary (seq 0 → 1), doc 3 lands inside seq 1
    rows = [(1, "src0", 1500), (2, "src0", 1000), (3, "src0", 100)]
    sf = _write_docs(tmp_path, rows)
    df = pack_token_budget(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df["seq_start"]) == [0, 0, 1]
    assert list(df["seq_end"]) == [0, 1, 1]
    assert list(df["offset_in_seq"]) == [0, 1500, 2500 - 2048]


def test_pack_budget_crosses_prefix_buckets(ray_session, tmp_path):
    # doc_ids straddle the _PACK_RANGE=4096 bucket boundary: the
    # second bucket's offsets must continue the global running sum
    rows = [(4090 + i, "src0", 1000) for i in range(12)]  # buckets 0 and 1
    sf = _write_docs(tmp_path, rows)
    df = pack_token_budget(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    off = df["seq_start"] * 2048 + df["offset_in_seq"]
    assert list(off) == [i * 1000 for i in range(12)]


def test_dialogue_pairs_respect_conv_boundaries(ray_session, tmp_path):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import dialogue_pairs

    # events → changes: conv = conv-<user_id>, turn = event_id % 100.
    # user 1: turns 1,2,3 (two pairs); user 2: single turn (no pair);
    # 'error' rows are tombstones and must not appear in any pair.
    ev = [
        (1, 1, "click"),
        (2, 1, "view"),
        (3, 1, "purchase"),
        (4, 2, "click"),
        (5, 1, "error"),  # deletes turn 5 (never inserted → no-op)
    ]
    t = pa.table(
        {
            "event_id": pa.array([e[0] for e in ev], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=e[0]) for e in ev],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([e[1] for e in ev], pa.int64()),
            "event_type": pa.array([e[2] for e in ev], pa.string()),
            "value": pa.array([1.0] * len(ev), pa.float64()),
            "props": pa.array([f"t{e[0]}" for e in ev], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    df = dialogue_pairs(str(tmp_path)).to_pandas().sort_values("prompt_turn_idx")
    assert list(df["conv_id"]) == ["conv-1", "conv-1"]
    assert list(zip(df["prompt_turn_idx"], df["response_turn_idx"])) == [(1, 2), (2, 3)]
    assert list(df["response_text"]) == ["t2", "t3"]


def test_decontaminate_trigram_overlap(ray_session, tmp_path):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        corpus_decontaminate,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e",  # eval (src0)
                    "x y a b c z",  # train: shares trigram "a b c" → flagged (1)
                    "c d e f g h",  # train: shares "c d e" → flagged (1)
                    "z z y y x x",  # train: no shared trigram
                    "a b",  # train: < 3 tokens → no trigrams
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 5, pa.string()),
            "source": pa.array(["src0", "src1", "src1", "src1", "src1"], pa.string()),
            "n_chars": pa.array([9, 11, 11, 11, 3], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = corpus_decontaminate(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(df["doc_id"]) == [2, 3]
    assert list(df["n_matched"]) == [1, 1]


def test_role_transitions_counts(ray_session, tmp_path):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        conversation_role_transitions,
    )

    # user 1: click→view→click (transitions click→view, view→click);
    # user 2: view→view
    ev = [(1, 1, "click"), (2, 1, "view"), (3, 1, "click"), (4, 2, "view"), (5, 2, "view")]
    t = pa.table(
        {
            "event_id": pa.array([e[0] for e in ev], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=e[0]) for e in ev],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([e[1] for e in ev], pa.int64()),
            "event_type": pa.array([e[2] for e in ev], pa.string()),
            "value": pa.array([1.0] * len(ev), pa.float64()),
            "props": pa.array([f"t{e[0]}" for e in ev], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    df = (
        conversation_role_transitions(str(tmp_path))
        .to_pandas()
        .sort_values(["from_role", "to_role"])
        .reset_index(drop=True)
    )
    got = {(r["from_role"], r["to_role"]): r["n"] for _, r in df.iterrows()}
    assert got == {("click", "view"): 1, ("view", "click"): 1, ("view", "view"): 1}


def test_split_assign_deterministic_and_disjoint(ray_session):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import split_assign

    sf = "/root/testdata/sf0.001"
    a = split_assign(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = split_assign(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # stable across runs
    assert set(a["split"].unique()) <= {"train", "val", "test"}
    # every doc gets exactly one split; buckets match the formula
    assert a["doc_id"].is_unique
    expect = (a["doc_id"].to_numpy() * 2654435761) % 100
    assert (a["split_bucket"].to_numpy() == expect).all()
    # train dominates (96% nominal; tolerate hash variance on tiny sf)
    frac = (a["split"] == "train").mean()
    assert 0.9 <= frac <= 1.0


def test_mix_hash_large_ids_match_duckdb_hugeint():
    # ADVICE r2: (doc_id * M) % 100 in int64 silently wraps at
    # doc_id >~ 3.5e9 while DuckDB's HUGEINT does not; the pre-mod
    # 2^31 keeps both sides bit-exact across the full id range
    # (identity below 2^31, so small-scale splits are unchanged)
    import duckdb
    import numpy as np

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import _mix_hash

    ids = np.array([0, 7, 2**31 - 1, 2**31, 5_000_000_000, 10**10], dtype=np.int64)
    eng = _mix_hash(ids, 100)
    sql = duckdb.sql(
        "SELECT ((v % 2147483648) * 2654435761) % 100 AS h FROM (SELECT unnest("
        "[0, 7, 2147483647, 2147483648, 5000000000, 10000000000]) AS v)"
    ).fetchnumpy()["h"]
    assert (eng == np.asarray(sql, dtype=np.int64)).all()
