"""The adaptive join operator: every (how × strategy) combination must
produce identical results (pandas-merge reference), the strategy pick
must respond to the broadcast budget, and the broadcast inner/left
path must REJECT duplicate build keys (the PK-lookup contract) instead
of silently multiplying probe rows."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from cityofphiladelphia_databridge_etl_tools_ray.functions.join import (
    adaptive_join,
    broadcast_hash_join,
)

_L = pd.DataFrame({"k": [1, 2, 2, 3, 5], "v": [10, 20, 21, 30, 50]})
_R = pd.DataFrame({"k": [1, 2, 4], "w": ["a", "b", "d"]})


def _expected(how):
    if how in ("inner", "left"):
        return _L.merge(_R, on="k", how=how)
    if how == "semi":
        return _L[_L.k.isin(_R.k)]
    return _L[~_L.k.isin(_R.k)]


def _canon(df):
    cols = sorted(df.columns)
    out = df[cols].sort_values(cols).reset_index(drop=True)
    # one null representation: Arrow→pandas yields None for missing
    # strings, a pure-pandas merge yields nan — future pandas makes
    # assert_frame_equal treat those as NOT equal, so fold both to nan
    return out.where(out.notna(), float("nan"))


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
@pytest.mark.parametrize("limit", [1 << 30, 0])
def test_all_hows_both_strategies(ray_session, how, limit):
    out, strategy = adaptive_join(
        ray.data.from_pandas(_L),
        ray.data.from_pandas(_R),
        ["k"],
        how,
        broadcast_limit_bytes=limit,
    )
    if limit == 0:
        assert strategy.startswith("shuffle")
    else:
        assert strategy.startswith("broadcast")
    pd.testing.assert_frame_equal(
        _canon(out.to_pandas()), _canon(_expected(how)), check_dtype=False
    )


def test_broadcast_rejects_duplicate_build_keys(ray_session):
    dup = pa.table({"k": [1, 1], "w": ["a", "b"]})
    with pytest.raises(ValueError, match="duplicate join keys"):
        broadcast_hash_join(ray.data.from_pandas(_L), dup, ["k"], "inner")
    # semi/anti accept duplicates (membership semantics)
    out = broadcast_hash_join(ray.data.from_pandas(_L), dup, ["k"], "semi")
    assert sorted(out.to_pandas()["k"]) == [1]


def test_semi_key_reduction_broadcasts_wide_build(ray_session):
    """A build side whose PAYLOAD is over budget but whose key set is
    tiny must still take the broadcast-keys path for semi/anti."""
    wide = pd.DataFrame({"k": [1, 2, 4] * 200, "pad": ["x" * 1000] * 600})
    out, strategy = adaptive_join(
        ray.data.from_pandas(_L),
        ray.data.from_pandas(wide),
        ["k"],
        "semi",
        broadcast_limit_bytes=10_000,  # < payload, > distinct keys
    )
    assert strategy == "broadcast-keys"
    assert sorted(out.to_pandas()["k"]) == [1, 2, 2]
