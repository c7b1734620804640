"""Churn-classification kernel (cdc_effective_change_ratio) and the
weighted A-Res sample — kernel-level properties.

The churn kernel is property-tested against a sequential per-key
reference; the weighted sample's local-prune path is checked against
a single-pass numpy top-N over the whole table (prune must be
lossless), plus the weighting direction (heavier rows sampled more).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    _CHANGE_CLASSES,
    _classify_changes_kernel,
)


def _reference_classes(df: pd.DataFrame) -> dict:
    """Sequential per-key walk — the spec."""
    counts = dict.fromkeys(_CHANGE_CLASSES, 0)
    for _, grp in df.sort_values("lsn", kind="stable").groupby(
        ["conv_id", "turn_idx"], sort=False
    ):
        prev = None
        for row in grp.to_dict("records"):
            if row["op"] == "delete":
                cls = "delete"
            elif prev is None:
                cls = "first"
            elif prev["op"] == "delete":
                cls = "reinsert"
            elif (pd.isna(row["text"]) and pd.isna(prev["text"])) or (
                not pd.isna(row["text"])
                and not pd.isna(prev["text"])
                and row["text"] == prev["text"]
            ):
                cls = "noop_update"
            else:
                cls = "effective_update"
            counts[cls] += 1
            prev = row
    return counts


def _random_changes(rng, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "op": rng.choice(["insert", "update", "delete"], n, p=[0.3, 0.5, 0.2]),
            "lsn": rng.permutation(n).astype(np.int64),
            "conv_id": [f"c{rng.integers(0, 6)}" for _ in range(n)],
            "turn_idx": rng.integers(0, 4, n).astype(np.int32),
            # tiny alphabet so noop collisions actually occur, plus nulls
            "text": [
                None if rng.random() < 0.15 else f"t{rng.integers(0, 3)}"
                for _ in range(n)
            ],
        }
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_classify_kernel_matches_sequential_reference(seed):
    rng = np.random.default_rng(seed)
    df = _random_changes(rng, 300)
    out = _classify_changes_kernel(pa.Table.from_pandas(df)).to_pandas()
    got = dict(zip([_CHANGE_CLASSES[i] for i in out["cls"]], out["n"]))
    exp = _reference_classes(df)
    assert got == exp
    assert sum(got.values()) == len(df)


def test_classify_kernel_empty_and_single_row():
    empty = pa.table(
        {
            "op": pa.array([], pa.string()),
            "lsn": pa.array([], pa.int64()),
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "text": pa.array([], pa.string()),
        }
    )
    assert _classify_changes_kernel(empty).to_pandas()["n"].sum() == 0
    one = pa.table(
        {
            "op": ["update"],
            "lsn": pa.array([5], pa.int64()),
            "conv_id": ["c1"],
            "turn_idx": pa.array([0], pa.int32()),
            "text": ["x"],
        }
    )
    out = _classify_changes_kernel(one).to_pandas()
    assert out.loc[out["cls"] == 1, "n"].iloc[0] == 1  # 'first'


def test_weighted_sample_local_prune_is_lossless(ray_session):
    """The per-batch top-N prune must select exactly the global top-N
    the brute-force single-pass computes (regardless of batching)."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        _RES_A,
        _RES_M,
        weighted_sample_orders,
    )

    sf = "/root/testdata/sf0.001"
    got = weighted_sample_orders(sf)
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{sf}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    ids = orders.column("o_orderkey").to_numpy()
    w = np.round(orders.column("o_totalprice").to_numpy() * 100).astype(np.int64)
    u = (((ids * _RES_A) % _RES_M) + 1.0) / 2147483648.0
    key = np.log(u) / w
    order = np.lexsort((ids, -key))[:100]
    assert got["o_orderkey"].tolist() == ids[order].tolist()
    # weighting direction: the sampled orders skew expensive
    assert got["weight_cents"].mean() > w.mean()
