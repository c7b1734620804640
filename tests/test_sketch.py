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
