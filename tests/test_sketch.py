"""HyperLogLog sketch: kernel merge property, determinism, and
end-to-end accuracy vs the exact distinct count."""

import duckdb
import numpy as np

from cityofphiladelphia_databridge_etl_tools_ray.functions.sketch import (
    HLL_M,
    hll_estimate,
    hll_partial,
)
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _merge(parts):
    reg = np.concatenate([r for r, _ in parts])
    rho = np.concatenate([r for _, r in parts])
    order = np.lexsort((rho, reg))
    reg_s, rho_s = reg[order], rho[order]
    last = np.r_[reg_s[1:] != reg_s[:-1], True]
    return reg_s[last], rho_s[last]


def test_hll_merge_equals_single_pass():
    # sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the property the
    # distributed max-groupby relies on
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 40, size=50_000, dtype=np.int64)
    whole = hll_partial(keys)
    merged = _merge([hll_partial(keys[:17_000]), hll_partial(keys[17_000:])])
    assert np.array_equal(whole[0], merged[0])
    assert np.array_equal(whole[1], merged[1])


def test_hll_deterministic_and_bounded():
    rng = np.random.default_rng(11)
    for n in (500, 50_000):
        keys = rng.choice(np.arange(n * 4, dtype=np.int64), size=n, replace=False)
        e1 = hll_estimate(*hll_partial(keys))
        e2 = hll_estimate(*hll_partial(keys[::-1].copy()))
        assert e1 == e2  # order-independent and bit-deterministic
        assert abs(e1 - n) / n < 3 * 1.04 / np.sqrt(HLL_M)


def test_sketch_distinct_users_accuracy(ray_session):
    got = QUERIES["sketch_distinct_users"](SF_DIR)
    approx = int(got["approx_distinct"].iloc[0])
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert abs(approx - exact) / exact < 3 * 1.04 / np.sqrt(HLL_M)
    assert int(got["n_registers"].iloc[0]) == HLL_M


def test_misra_gries_guarantee_and_recall(ray_session):
    """MG guarantee: est <= true <= est + max_undercount, with
    max_undercount <= n/(k+1); every key with true count above that
    bound must be present (the hot conv_ids on the skewed WAL)."""
    import duckdb

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        _MG_K,
        wal_heavy_hitters_sketch,
        wal_hot_keys,
    )

    sf = "/root/testdata/sf0.01"  # thousands of distinct convs >> _MG_K,
    # so per-batch compaction (incl. the empty-summary deduct carrier)
    # genuinely fires
    sk = wal_heavy_hitters_sketch(sf)
    exact = wal_hot_keys(sf)  # exact top-20 with true counts
    true = dict(zip(exact["conv_id"], exact["n_events"]))
    bound = int(sk["max_undercount"].iloc[0])
    n_total = int(duckdb.sql(
        f"SELECT count(*) FROM '{sf}/events.parquet'"
    ).fetchone()[0])
    assert 0 <= bound <= n_total // (_MG_K + 1) + 1
    est = dict(zip(sk["conv_id"], sk["est_events"]))
    for cid, t in true.items():
        if t > bound:  # guaranteed-present region
            assert cid in est, (cid, t, bound)
        if cid in est:
            assert est[cid] <= t <= est[cid] + bound, (cid, est[cid], t, bound)


def test_mg_compact_kernel():
    import numpy as np

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import _mg_compact

    keys = np.array(["a", "b", "c", "d"], dtype=object)
    counts = np.array([10, 7, 3, 1], dtype=np.int64)
    k2, c2, d = _mg_compact(keys, counts, 2)
    assert list(k2) == ["a", "b"] and list(c2) == [7, 4] and d == 3
    # under budget: untouched
    k3, c3, d3 = _mg_compact(keys, counts, 8)
    assert list(k3) == list(keys) and d3 == 0


# ------------------------------------------------------------------
# Int64Bloom — the semi-join prefilter sketch
# ------------------------------------------------------------------

from cityofphiladelphia_databridge_etl_tools_ray.functions.lookup import Int64Bloom


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(1 << 62), 1 << 62, size=40_000, dtype=np.int64)
    b = Int64Bloom(log2_bits=20, k=4).add(keys)
    assert b.contains(keys).all()


def test_bloom_fp_rate_bounded():
    # 40k keys in a 2^20-bit mask with k=4 → theoretical FP ≈ 0.24%;
    # pin at < 1% on disjoint probes
    rng = np.random.default_rng(8)
    keys = rng.integers(0, 1 << 40, size=40_000, dtype=np.int64)
    b = Int64Bloom(log2_bits=20, k=4).add(keys)
    probes = rng.integers(1 << 41, 1 << 42, size=100_000, dtype=np.int64)
    fp = b.contains(probes).mean()
    assert fp < 0.01, fp
    assert 0.0 < b.fill_ratio < 0.5


def test_bloom_merge_equals_single_pass():
    # OR-merge of split builds == whole build — the AggregateFn
    # tree-merge property the distributed bloom build relies on
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 1 << 50, size=30_000, dtype=np.int64)
    whole = Int64Bloom(log2_bits=18).add(keys)
    merged = Int64Bloom(log2_bits=18).add(keys[:11_000]).merge(
        Int64Bloom(log2_bits=18).add(keys[11_000:])
    )
    assert np.array_equal(whole.words, merged.words)


def test_bloom_empty_and_shape_guard():
    b = Int64Bloom(log2_bits=16)
    assert b.contains(np.array([1, 2, 3], dtype=np.int64)).sum() == 0
    assert len(b.contains(np.array([], dtype=np.int64))) == 0
    b.add(np.array([], dtype=np.int64))
    assert b.fill_ratio == 0.0
    try:
        Int64Bloom(log2_bits=16, words=np.zeros(4, np.uint64))
        assert False, "expected shape guard"
    except ValueError:
        pass


def test_bloom_semi_join_matches_exact_oracle():
    import duckdb as _dd
    import pandas as _pd

    res = QUERIES["semi_join_lineitem_bloom"](SF_DIR)
    got = (
        res.to_pandas()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    con = _dd.connect()
    exp = con.execute(
        f"""
        SELECT l_partkey, count(*) AS n_li,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM read_parquet('{SF_DIR}/lineitem.parquet')
        WHERE l_partkey IN (
            SELECT p_partkey FROM read_parquet('{SF_DIR}/part.parquet') WHERE p_size >= 40)
        GROUP BY l_partkey ORDER BY l_partkey
        """
    ).fetchdf()
    con.close()
    _pd.testing.assert_frame_equal(
        got[["l_partkey", "n_li", "sum_qty"]].astype("int64"),
        exp.astype("int64"),
    )


# ------------------------------------------------------------------
# QuantileSketch — KLL-style mergeable quantiles
# ------------------------------------------------------------------

from cityofphiladelphia_databridge_etl_tools_ray.functions.sketch import QuantileSketch


def _rank_err(sorted_data, est, phi):
    n = len(sorted_data)
    return abs(np.searchsorted(sorted_data, est) - phi * n) / n


def test_qsketch_weight_conservation_and_determinism():
    rng = np.random.default_rng(21)
    data = rng.lognormal(3, 1.5, size=200_000)
    builds = []
    for _ in range(2):
        s = QuantileSketch(k=512)
        for i in range(0, len(data), 8192):
            s.add(data[i : i + 8192])
        builds.append(s)
    s, s2 = builds
    _, w = s._weighted()
    assert w.sum() == s.n == len(data)
    assert all(np.array_equal(a, b) for a, b in zip(s.levels, s2.levels))


def test_qsketch_error_within_bound_whole_and_merged():
    rng = np.random.default_rng(22)
    data = rng.lognormal(3, 1.5, size=500_000)
    sd = np.sort(data)
    phis = [0.01, 0.1, 0.5, 0.9, 0.99]

    whole = QuantileSketch(k=512)
    for i in range(0, len(data), 8192):
        whole.add(data[i : i + 8192])
    parts = [QuantileSketch(k=512) for _ in range(4)]
    for j, p in enumerate(parts):
        p.add(data[j * 125_000 : (j + 1) * 125_000])
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)

    for s in (whole, merged):
        _, w = s._weighted()
        assert w.sum() == len(data)
        bound = s.max_rank_error() / s.n
        for phi, est in zip(phis, s.quantiles(phis)):
            assert _rank_err(sd, est, phi) <= bound, (phi, _rank_err(sd, est, phi), bound)


def test_qsketch_small_and_empty():
    s = QuantileSketch(k=64)
    assert np.isnan(s.quantiles([0.5])).all()
    assert s.max_rank_error() == 0
    s.add(np.array([5.0, np.nan, 1.0, 3.0]))
    assert s.n == 3  # NaNs dropped
    # below capacity the sketch is exact
    assert s.quantiles([0.0])[0] == 1.0
    assert s.quantiles([1.0])[0] == 5.0


def test_qsketch_pipeline_vs_exact(ray_session):
    import pyarrow.parquet as pq

    res = QUERIES["events_value_quantile_sketch"](SF_DIR)
    vals = pq.read_table(f"{SF_DIR}/events.parquet", columns=["value"]).column("value").to_numpy()
    sd = np.sort(vals[~np.isnan(vals)])
    assert (res["n"] == len(sd)).all()
    bound = res["max_rank_error"].iloc[0] / len(sd)
    for phi, est in zip(res["phi"], res["approx_value"]):
        assert _rank_err(sd, est, phi) <= bound, (phi, _rank_err(sd, est, phi), bound)


def test_qsketch_state_roundtrip():
    from cityofphiladelphia_databridge_etl_tools_ray.functions.sketch import (
        qsketch_from_state,
        qsketch_state,
    )

    rng = np.random.default_rng(23)
    s = QuantileSketch(k=128).add(rng.normal(size=10_000))
    r = qsketch_from_state(qsketch_state(s))
    assert r.k == s.k and r.n == s.n and r.parity == s.parity
    assert all(np.array_equal(a, b) for a, b in zip(r.levels, s.levels))
    # empty sketch round-trips too
    e = qsketch_from_state(qsketch_state(QuantileSketch(k=64)))
    assert e.n == 0 and np.isnan(e.quantiles([0.5])).all()


def test_qsketch_grouped_pipeline_vs_exact(ray_session):
    import pyarrow.parquet as pq

    res = QUERIES["events_type_quantile_sketch"](SF_DIR)
    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_type", "value"]).to_pandas()
    assert set(res["event_type"]) == set(t["event_type"].unique())
    for _, r in res.iterrows():
        vals = np.sort(t.loc[t["event_type"] == r["event_type"], "value"].to_numpy())
        assert r["n"] == len(vals)
        bound = r["max_rank_error"] / len(vals)
        for phi, col in [(0.5, "approx_p50"), (0.9, "approx_p90"), (0.99, "approx_p99")]:
            assert _rank_err(vals, r[col], phi) <= bound, (r["event_type"], phi)


def test_grouped_hll_accuracy(ray_session):
    import pyarrow.parquet as pq

    res = QUERIES["events_type_distinct_sketch"](SF_DIR)
    t = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"]
    ).to_pandas()
    exact = t.groupby("event_type")["user_id"].nunique()
    assert set(res["event_type"]) == set(exact.index)
    for _, r in res.iterrows():
        true = exact[r["event_type"]]
        # 3-sigma HLL bound at m=1024 (sigma = 1.04/sqrt(m) ~ 3.25%)
        assert abs(r["approx_distinct_users"] - true) <= max(0.098 * true, 3), (
            r["event_type"], r["approx_distinct_users"], true,
        )


# ------------------------------------------------------------------
# property-based: QuantileSketch under random streams and splits
# ------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=20_000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    splits=st.integers(min_value=1, max_value=7),
    dist=st.sampled_from(["uniform", "lognormal", "constant", "integers"]),
)
def test_qsketch_property_error_bound(n, seed, splits, dist):
    rng = np.random.default_rng(seed)
    if dist == "uniform":
        data = rng.uniform(-1e6, 1e6, size=n)
    elif dist == "lognormal":
        data = rng.lognormal(0, 2, size=n)
    elif dist == "constant":
        data = np.full(n, 42.0)
    else:
        data = rng.integers(0, 10, size=n).astype(np.float64)

    # random split points → merge tree must keep the bound
    cuts = np.sort(rng.choice(np.arange(1, n), size=min(splits - 1, n - 1), replace=False)) if n > 1 and splits > 1 else []
    parts = np.split(data, cuts)
    sketches = [QuantileSketch(k=256).add(p) for p in parts]
    s = sketches[0]
    for p in sketches[1:]:
        s = s.merge(p)

    _, w = s._weighted()
    assert w.sum() == s.n == n  # weight conservation under any split
    sd = np.sort(data)
    bound = s.max_rank_error() / n
    for phi in (0.0, 0.25, 0.5, 0.75, 0.99, 1.0):
        est = s.quantiles([phi])[0]
        # rank error: distance between est's position and phi*n
        lo = np.searchsorted(sd, est, side="left")
        hi = np.searchsorted(sd, est, side="right")
        # est occupies rank interval [lo, hi); error is the distance
        # from the target rank to that interval (0 when inside — ties)
        target = phi * n
        err = (0.0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))) / n
        assert err <= bound + 1e-12, (dist, n, phi, err, bound)


def test_grouped_mg_guarantee(ray_session):
    import pyarrow.parquet as pq

    res = QUERIES["events_type_top_users_sketch"](SF_DIR)
    t = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"]
    ).to_pandas()
    for et, grp in res.groupby("event_type"):
        exact = t[t["event_type"] == et].groupby("user_id").size()
        n = int(exact.sum())
        deduct = int(grp["max_undercount"].iloc[0])
        assert deduct <= n // (65)  # n/(k+1), k = 64
        for _, r in grp.iterrows():
            true = int(exact.get(r["user_id"], 0))
            # MG guarantee: est <= true <= est + deduct
            assert r["est_events"] <= true <= r["est_events"] + deduct, (et, r["user_id"])
        # every user with true count > n/(k+1) must be present
        hot = exact[exact > n / 65].index
        present = set(grp["user_id"])
        assert all(u in present for u in hot) or len(grp) == 10  # top-10 cut may trim
