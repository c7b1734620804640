"""Edge cases for the round-3 snapshot-diff / checksum / segment-dedup
/ OHLC operators on crafted data:

- snapshot_diff: null-vs-value and null-vs-null payloads, keys split
  across blocks, identical snapshots (empty diff), one-sided
  snapshots (all inserts / all deletes);
- corpus_paragraph_dedup: a doc that is entirely duplicate segments
  of an earlier doc must drop; a 1-word doc survives as its own
  segment; intra-document repeated segments keep only the first;
- events_ohlc_hourly: open/close ties on ts broken by event_id;
  single-event groups give open=close=low=high.
Compared against the registered DuckDB oracles (same compare as the
driver gate) where applicable.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.diff import snapshot_diff
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    ORACLE_SQL,
    QUERIES,
)


def _cmp(got: pd.DataFrame, exp: pd.DataFrame, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert sorted(got.columns) == sorted(exp.columns)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_snapshot_diff_nulls_and_splits(ray_session):
    # key 1: value→null (update); key 2: null→null (unchanged);
    # key 3: equal (unchanged); key 4: A-only (delete); key 5: B-only
    # (insert); key 6: value change (update).  Two blocks per side so
    # pairs must meet through the exchange, not block locality.
    a = pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array([10, None, 30], pa.int64())})
    a2 = pa.table({"k": pa.array([4, 6], pa.int64()), "v": pa.array([40, 60], pa.int64())})
    b = pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([None, None], pa.int64())})
    b2 = pa.table({"k": pa.array([3, 5, 6], pa.int64()), "v": pa.array([30, 50, 61], pa.int64())})
    ds_a = ray.data.from_arrow([a, a2])
    ds_b = ray.data.from_arrow([b, b2])
    got = snapshot_diff(ds_a, ds_b, key="k", value_cols=["v"], n_buckets=4).to_pandas()
    exp = pd.DataFrame(
        {
            "k": [1, 4, 5, 6],
            "diff_kind": ["update", "delete", "insert", "update"],
            "old_v": [10.0, 40.0, np.nan, 60.0],
            "new_v": [np.nan, np.nan, 50.0, 61.0],
        }
    )
    _cmp(got, exp, ["k"])


def test_snapshot_diff_identical_and_one_sided(ray_session):
    t = pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([1, 2], pa.int64())})
    empty = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    same = snapshot_diff(
        ray.data.from_arrow(t), ray.data.from_arrow(t), key="k", value_cols=["v"], n_buckets=4
    ).to_pandas()
    assert len(same) == 0
    ins = snapshot_diff(
        ray.data.from_arrow(empty), ray.data.from_arrow(t), key="k", value_cols=["v"], n_buckets=4
    ).to_pandas()
    assert list(ins["diff_kind"]) == ["insert", "insert"]
    dele = snapshot_diff(
        ray.data.from_arrow(t), ray.data.from_arrow(empty), key="k", value_cols=["v"], n_buckets=4
    ).to_pandas()
    assert list(dele["diff_kind"]) == ["delete", "delete"]


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("diff_ops")
    words = lambda n, w: " ".join([w] * n)  # noqa: E731
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    words(10, "a") + " " + words(10, "b"),  # segs: a*10, b*10
                    words(10, "a") + " " + words(10, "b"),  # fully duplicate → drops
                    "solo",  # 1-word doc, unique segment
                    words(10, "c") + " " + words(10, "c"),  # intra-doc repeat → keep 1st
                ]
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s1", "s1", "s2", "s2"]),
            "n_chars": pa.array([39, 39, 4, 39], pa.int64()),
        }
    )
    pq.write_table(docs, str(root / "documents.parquet"))
    ts = pd.to_datetime(
        [
            "2024-01-01 10:00:05",
            "2024-01-01 10:00:05",  # same ts as above → event_id breaks tie
            "2024-01-01 10:30:00",
            "2024-01-01 11:00:00",  # single-event hour
        ]
    )
    ev = pa.table(
        {
            "event_id": pa.array([2, 1, 3, 4], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1], pa.int64()),
            "event_type": pa.array(["click"] * 4),
            "value": pa.array([2.0, 1.0, 3.0, 9.0]),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(ev, str(root / "events.parquet"))
    return str(root)


def _oracle(crafted_dir, name, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{crafted_dir}/{t}.parquet'")
    return con.execute(ORACLE_SQL[name]).fetchdf()


def test_paragraph_dedup_crafted(ray_session, crafted_dir):
    got = QUERIES["corpus_paragraph_dedup"](crafted_dir).to_pandas()
    exp = _oracle(crafted_dir, "corpus_paragraph_dedup", ["documents"])
    _cmp(got, exp, ["doc_id"])
    by_id = got.set_index("doc_id")
    assert 2 not in by_id.index  # fully-duplicate doc dropped
    assert by_id.loc[3, "text_dedup"] == "solo"
    assert by_id.loc[4, "n_segments_kept"] == 1  # intra-doc repeat


def test_ohlc_ties_and_singletons(ray_session, crafted_dir):
    got = QUERIES["events_ohlc_hourly"](crafted_dir).to_pandas()
    exp = _oracle(crafted_dir, "events_ohlc_hourly", ["events"])
    _cmp(got, exp, ["hour", "event_type"])
    got = got.set_index(got["hour"].astype(str))
    h10 = got.loc["2024-01-01 10:00:00"]
    assert h10["open_cents"] == 100  # event_id 1 wins the ts tie
    assert h10["close_cents"] == 300
    assert h10["low_cents"] == 100 and h10["high_cents"] == 300
    h11 = got.loc["2024-01-01 11:00:00"]
    assert (
        h11["open_cents"] == h11["close_cents"] == h11["low_cents"] == h11["high_cents"] == 900
    )


def test_checksum_is_order_insensitive(ray_session, crafted_dir):
    # permuting input rows must not change any checksum column
    base = QUERIES["table_checksum_by_source"](crafted_dir).to_pandas()
    t = pq.read_table(f"{crafted_dir}/documents.parquet")
    perm = t.take(pa.array([3, 1, 0, 2]))
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(perm, os.path.join(d, "documents.parquet"))
        shuffled = QUERIES["table_checksum_by_source"](d).to_pandas()
    _cmp(base, shuffled, ["source"])


def test_dedup_window_cross_block_ties(ray_session, tmp_path):
    # Same (user, type, hour) spread across parquet row groups with a
    # ts tie: event_id must break it; later-hour copy survives alone.
    ts = pd.to_datetime(
        ["2024-01-01 10:00:00", "2024-01-01 10:00:00", "2024-01-01 10:59:59",
         "2024-01-01 11:00:00"]
    )
    ev = pa.table(
        {
            "event_id": pa.array([7, 3, 9, 11], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([5, 5, 5, 5], pa.int64()),
            "event_type": pa.array(["click"] * 4),
            "value": pa.array([1.0] * 4),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"), row_group_size=1)
    got = QUERIES["events_dedup_window"](str(tmp_path)).to_pandas()
    exp = _oracle(str(tmp_path), "events_dedup_window", ["events"])
    _cmp(got, exp, ["event_id"])
    assert sorted(got["event_id"]) == [3, 11]  # id 3 wins the tie; hour 11 separate


def test_sliding_distinct_cross_block(ray_session, tmp_path):
    # One user hits the same window from two different row groups →
    # must count once; two users in one window count twice.
    ts = pd.to_datetime(
        ["2024-01-01 10:01:00", "2024-01-01 10:14:00", "2024-01-01 10:01:00"]
    )
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([5, 5, 6], pa.int64()),
            "event_type": pa.array(["click"] * 3),
            "value": pa.array([1.0] * 3),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"), row_group_size=1)
    got = QUERIES["events_sliding_distinct_users"](str(tmp_path)).to_pandas()
    exp = _oracle(str(tmp_path), "events_sliding_distinct_users", ["events"])
    _cmp(got, exp, ["window_start_s"])
    # the 10:00 window start contains both users exactly once
    w = got.set_index("window_start_s")["n_users"]
    start_10 = int(pd.Timestamp("2024-01-01 10:00:00").timestamp())
    assert w[start_10] == 2


def test_path_topk_user_boundaries(ray_session, tmp_path):
    # u1: a,b,c,d → paths a>b>c, b>c>d; u2: only 2 events → no path;
    # triples never cross users even when streams interleave in ts.
    ts = pd.to_datetime(
        ["2024-01-01 10:00", "2024-01-01 10:01", "2024-01-01 10:02",
         "2024-01-01 10:03", "2024-01-01 10:00", "2024-01-01 10:01"]
    )
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["a", "b", "c", "d", "x", "y"]),
            "value": pa.array([1.0] * 6),
            "props": pa.array(["{}"] * 6),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"), row_group_size=2)
    got = QUERIES["events_path_topk"](str(tmp_path)).to_pandas()
    exp = _oracle(str(tmp_path), "events_path_topk", ["events"])
    _cmp(got, exp, ["path"])
    assert set(got["path"]) == {"a>b>c", "b>c>d"}


def test_profile_counts_nulls_and_distinct(ray_session, tmp_path):
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                pd.to_datetime(["2024-01-01", "2024-01-01", None]), pa.timestamp("us")
            ),
            "user_id": pa.array([7, 7, None], pa.int64()),
            "event_type": pa.array(["a", "a", "b"]),
            "value": pa.array([1.5, 1.5, None]),
            "props": pa.array(["{}", None, None]),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"), row_group_size=1)
    got = QUERIES["profile_events_columns"](str(tmp_path))
    exp = _oracle(str(tmp_path), "profile_events_columns", ["events"])
    _cmp(got, exp, ["column_name"])
    r = got.set_index("column_name")
    assert r.loc["props", "n_nulls"] == 2 and r.loc["props", "n_distinct"] == 1
    assert r.loc["value", "n_distinct"] == 1


def test_new_ops_plan_shapes(ray_session):
    """Exchange budget for the late round-3 family at sf0.001:
    - snapshot diff: exactly ONE all-to-all (the key bucket);
    - windowed dedup / OHLC: one bucket exchange;
    - paragraph dedup: two (segment winners, doc reassembly);
    - sliding distinct: two reduced exchanges (pair-dedup, count sum);
    - path top-k: two (user co-location, path-bucket top-k) + the
      final global sort of <= k*n_buckets rows;
    - profile: counts + tagged distinct + final sums."""
    sf = "/root/testdata/sf0.001"
    budgets = {
        "cdc_snapshot_diff": 1,
        "events_dedup_window": 1,
        "events_ohlc_hourly": 1,
        "corpus_paragraph_dedup": 2,
        "events_sliding_distinct_users": 2,
        "events_path_topk": 3,
        # round-4 rewrite: distributed df join = term-bucket exchange
        # + doc-bucket top-k exchange, NEVER an O(vocab) driver pull
        "corpus_tfidf_top_terms": 2,
        # quantization is shuffle-free
        "embedding_quantize_int8": 0,
        # exact prefix-filtered index join: df + prefix + candidates
        # + set-attach + verify = five bounded bucket exchanges
        # (plan forced — auto-routing picks the dense twin at this
        # corpus size, which would make the budget vacuous)
        "dedup_ngram_jaccard_indexed": 5,
    }
    from functools import partial

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        dedup_ngram_jaccard_indexed,
    )

    runners = dict(QUERIES)
    runners["dedup_ngram_jaccard_indexed"] = partial(
        dedup_ngram_jaccard_indexed, plan="indexed"
    )
    for name, budget in budgets.items():
        stats = runners[name](sf).materialize().stats()
        assert stats.count("SortReduce") <= budget, (name, stats)


def test_oov_rate_vocab_ties_and_empty_docs(ray_session, tmp_path):
    # 20 distinct tokens, vocab = top-16 (count desc, token asc ties);
    # an all-empty-token doc must drop on both sides.
    rows = []
    # tokens t00..t19: token t_i appears (20 - i) times across docs
    for i in range(20):
        rows.append((100 + i, " ".join([f"t{i:02d}"] * (20 - i))))
    rows.append((200, ""))  # splits to one empty token -> drops
    rows.append((201, "t00 zz t01 zz"))  # zz is rare -> OOV
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"), row_group_size=3)
    got = QUERIES["corpus_oov_rate"](str(tmp_path)).to_pandas()
    exp = _oracle(str(tmp_path), "corpus_oov_rate", ["documents"])
    _cmp(got, exp, ["doc_id"])
    r = got.set_index("doc_id")
    assert 200 not in r.index
    assert r.loc[201, "n_oov"] == 2 and r.loc[201, "n_tokens"] == 4


def test_streaks_islands_and_ties(ray_session, tmp_path):
    # u1 stream: a a b a a a  -> longest a=3 (not 5), b=1; ts tie at
    # positions 0/1 ordered by event_id.
    ts = pd.to_datetime(
        ["2024-01-01 10:00", "2024-01-01 10:00", "2024-01-01 10:02",
         "2024-01-01 10:03", "2024-01-01 10:04", "2024-01-01 10:05"]
    )
    ev = pa.table(
        {
            "event_id": pa.array([2, 1, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 6, pa.int64()),
            "event_type": pa.array(["a", "a", "b", "a", "a", "a"]),
            "value": pa.array([1.0] * 6),
            "props": pa.array(["{}"] * 6),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"), row_group_size=2)
    got = QUERIES["events_type_streaks"](str(tmp_path)).to_pandas()
    exp = _oracle(str(tmp_path), "events_type_streaks", ["events"])
    _cmp(got, exp, ["user_id", "event_type"])
    r = got.set_index("event_type")["longest_streak"]
    assert r["a"] == 3 and r["b"] == 1


def test_monthly_growth_first_month_null(ray_session, tmp_path):
    dates = pd.to_datetime(["2024-01-05", "2024-01-20", "2024-02-10", "2024-04-01"])
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
            "o_orderstatus": pa.array(["F"] * 4),
            "o_totalprice": pa.array([100.0, 200.0, 150.0, 60.0]),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = QUERIES["orders_monthly_growth"](str(tmp_path))
    exp = _oracle(str(tmp_path), "orders_monthly_growth", ["orders"])
    _cmp(got, exp, ["month"])
    g = got.sort_values("month").reset_index(drop=True)
    assert pd.isna(g.loc[0, "growth_n"])  # no prior month
    assert g.loc[1, "growth_n"] == -0.5  # 2 -> 1 orders


def test_snapshot_diff_roundtrip_reconstructs_b(ray_session):
    # Invariant: A patched with the diff equals B exactly — delete
    # old-side keys, apply updates, add inserts.
    rng = np.random.default_rng(7)
    ka = rng.choice(2000, size=300, replace=False).astype(np.int64)
    kb = rng.choice(2000, size=300, replace=False).astype(np.int64)
    va = rng.integers(0, 50, size=300).astype(np.int64)
    vb = rng.integers(0, 50, size=300).astype(np.int64)
    a = pa.table({"k": ka, "v": va})
    b = pa.table({"k": kb, "v": vb})
    d = snapshot_diff(
        ray.data.from_arrow(a), ray.data.from_arrow(b), key="k", value_cols=["v"], n_buckets=8
    ).to_pandas()
    adf = a.to_pandas().set_index("k")["v"].to_dict()
    for _, r in d.iterrows():
        if r["diff_kind"] == "delete":
            del adf[r["k"]]
        else:
            adf[r["k"]] = int(r["new_v"])
    bdf = b.to_pandas().set_index("k")["v"].to_dict()
    assert adf == bdf


def test_paragraph_dedup_idempotent(ray_session, tmp_path):
    # Running segment dedup on an already-deduped corpus must be a
    # no-op (each surviving segment is already globally unique).
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(8)]
    shared = " ".join(["boiler"] * 10)  # a segment many docs share
    texts = [
        (shared + " " if i % 3 == 0 else "") + " ".join(rng.choice(vocab, size=25))
        for i in range(40)
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 40),
            "source": pa.array(["s"] * 40),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"), row_group_size=7)
    once = QUERIES["corpus_paragraph_dedup"](str(tmp_path)).to_pandas()
    d2 = tmp_path / "second"
    d2.mkdir()
    again_in = pa.table(
        {
            "doc_id": pa.array(once["doc_id"].to_numpy(), pa.int64()),
            "text": pa.array(once["text_dedup"].astype(str)),
            "lang": pa.array(["en"] * len(once)),
            "source": pa.array(["s"] * len(once)),
            "n_chars": pa.array([len(t) for t in once["text_dedup"]], pa.int64()),
        }
    )
    pq.write_table(again_in, str(d2 / "documents.parquet"), row_group_size=7)
    twice = QUERIES["corpus_paragraph_dedup"](str(d2)).to_pandas()
    m = once.sort_values("doc_id").reset_index(drop=True)
    t = twice.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        m["text_dedup"].astype(str), t["text_dedup"].astype(str), check_names=False
    )


def test_latest_ops_plan_shapes(ray_session):
    """Exchange budgets: streaks = one user-bucket exchange; q16 =
    pair-dedup + final sum (2); monthly growth = one tiny exchange."""
    sf = "/root/testdata/sf0.001"
    for name, budget in {
        "events_type_streaks": 1,
        "q16_supplier_variety": 2,
    }.items():
        res = QUERIES[name](sf)
        if hasattr(res, "materialize"):
            stats = res.materialize().stats()
            assert stats.count("SortReduce") <= budget, (name, stats)
