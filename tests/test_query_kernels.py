"""Unit tests for the pure (non-Ray) query kernels in
pipelines/queries.py — edge cases the sf-data oracle parity test
can't force (exact ties, k-boundary groups, tiny inputs)."""

import numpy as np
import pyarrow as pa

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    _SAMPLE_KEEP,
    _SAMPLE_MOD,
    _SAMPLE_MULT,
    _topk_per_group,
)


def _t(cust, key, cents):
    return pa.table(
        {
            "o_custkey": pa.array(cust, pa.int64()),
            "o_orderkey": pa.array(key, pa.int64()),
            "price_cents": pa.array(cents, pa.int64()),
        }
    )


def test_topk_exact_tie_breaks_on_orderkey():
    # three rows tied on price: the two lowest orderkeys must win,
    # in orderkey order (row_number() OVER (ORDER BY cents DESC, key))
    t = _t([7, 7, 7, 7], [40, 10, 30, 20], [500, 500, 500, 999])
    out = _topk_per_group(t, 2, with_rank=True)
    assert out.column("o_orderkey").to_pylist() == [20, 10]
    assert out.column("rk").to_pylist() == [1, 2]
    assert out.column("price_cents").to_pylist() == [999, 500]


def test_topk_groups_smaller_than_k_kept_whole():
    t = _t([1, 2, 2], [11, 21, 22], [5, 9, 7])
    out = _topk_per_group(t, 3, with_rank=True)
    assert out.num_rows == 3
    got = sorted(
        zip(*(out.column(c).to_pylist() for c in ("o_custkey", "o_orderkey", "rk")))
    )
    assert got == [(1, 11, 1), (2, 21, 1), (2, 22, 2)]


def test_topk_idempotent_as_combiner_then_finalizer():
    # applying the kernel per "block" then on the union must equal
    # applying it once on the whole input (combiner correctness)
    rng = np.random.default_rng(7)
    cust = rng.integers(0, 20, 400)
    key = np.arange(400, dtype=np.int64)
    cents = rng.integers(0, 50, 400)  # dense → many exact ties
    whole = _topk_per_group(_t(cust, key, cents), 3, with_rank=True)
    parts = [
        _topk_per_group(_t(cust[i : i + 100], key[i : i + 100], cents[i : i + 100]), 3, False)
        for i in range(0, 400, 100)
    ]
    merged = _topk_per_group(pa.concat_tables(parts), 3, with_rank=True)
    assert merged.sort_by(
        [("o_custkey", "ascending"), ("rk", "ascending")]
    ).to_pydict() == whole.sort_by([("o_custkey", "ascending"), ("rk", "ascending")]).to_pydict()


def test_topk_empty_input():
    out = _topk_per_group(_t([], [], []), 3, with_rank=True)
    assert out.num_rows == 0
    assert out.column_names == ["o_custkey", "o_orderkey", "price_cents", "rk"]


def test_sample_hash_matches_sql_arithmetic():
    # engine filter must equal the oracle's BIGINT expression
    eid = np.arange(0, 100_000, dtype=np.int64)
    mask = (eid * _SAMPLE_MULT) % _SAMPLE_MOD < _SAMPLE_KEEP
    rate = mask.mean()
    assert 0.03 < rate < 0.07  # ~5% Bernoulli
    # spot-check a few against pure-python (SQL-identical) arithmetic
    for e in (0, 1, 12345, 99999):
        assert mask[e] == ((e * 2654435761) % 4294967296 < 214748364)


def _docs(texts):
    return pa.table({"text": pa.array(texts, pa.string())})


def test_bigram_partial_basic_counts():
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import bigram_partial_counts

    out = bigram_partial_counts(_docs(["a b c", "a b"]))
    d = dict(zip(out.column("gram").to_pylist(), out.column("part_n").to_pylist()))
    assert d == {"a b": 2, "b c": 1}


def test_bigram_partial_short_and_empty_docs():
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import bigram_partial_counts

    # empty / whitespace-only / single-token docs yield no bigram,
    # and no bigram spans a row boundary
    out = bigram_partial_counts(_docs(["", "   ", "solo", "x y"]))
    d = dict(zip(out.column("gram").to_pylist(), out.column("part_n").to_pylist()))
    assert d == {"x y": 1}


def test_bigram_partial_consecutive_spaces_match_sql_split():
    """'a  b' splits to ['a','','b'] under string_split(' ') — the
    engine must mirror DuckDB exactly, empty tokens included."""
    import duckdb

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import bigram_partial_counts

    texts = ["a  b", "t1 t2  t3", None]
    out = bigram_partial_counts(_docs(texts))
    got = dict(zip(out.column("gram").to_pylist(), out.column("part_n").to_pylist()))
    con = duckdb.connect()
    con.execute("CREATE TABLE d(text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?)", [(t,) for t in texts])
    exp = dict(
        con.execute(
            """
WITH toks AS (SELECT CASE WHEN trim(text) = '' THEN []
                          ELSE string_split(trim(text), ' ') END AS l
              FROM d WHERE text IS NOT NULL),
grams AS (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS gram
          FROM toks)
SELECT gram, count(*) FROM grams GROUP BY gram
"""
        ).fetchall()
    )
    assert got == exp


def test_bigram_partial_empty_batch():
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import bigram_partial_counts

    out = bigram_partial_counts(_docs([]))
    assert out.num_rows == 0
    assert out.column_names == ["gram", "part_n"]


def test_range_join_boundary_and_span(ray_session):
    # interval boundaries: ts == start included, ts == end excluded;
    # an event pairs with EVERY overlapping campaign exactly once even
    # when the interval spans multiple 4h buckets
    import duckdb

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        ORACLE_SQL,
        range_join_events_campaigns,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        range_join_events_campaigns(sf)
        .to_pandas()
        .sort_values(["event_id", "campaign_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = (
        con.sql(ORACLE_SQL["range_join_events_campaigns"])
        .fetchdf()
        .sort_values(["event_id", "campaign_id"])
        .reset_index(drop=True)
    )
    assert got["event_id"].equals(exp["event_id"])
    assert got["campaign_id"].astype("int64").equals(exp["campaign_id"].astype("int64"))
    # no duplicate pairs (each pair materializes in exactly one bucket)
    assert not got.duplicated(["event_id", "campaign_id"]).any()
