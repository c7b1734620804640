"""Property-based tests (hypothesis) for the windowed-join and as-of
join kernels against O(n²) brute-force references on randomized
streams — duplicate timestamps, window-boundary ties, dim-less
conversations, empty click/dim sides, and single-user buckets all
emerge from the generator.  Pure-Arrow kernels, no Ray session."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    _asof_join_partial,
    _window_join_probe,
)


@st.composite
def click_purchase_streams(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    col = lambda s: draw(st.lists(s, min_size=n, max_size=n))  # noqa: E731
    uid = np.array(col(st.integers(0, 4)), np.int64)  # few users → collisions
    is_click = np.array(col(st.booleans()), bool)
    ts = np.array(col(st.integers(0, 50)), np.int64)  # duplicate ts likely
    return pa.table(
        {
            "user_id": pa.array(uid),
            "is_click": pa.array(is_click),
            "ts_i": pa.array(ts),
        }
    ), draw(st.integers(1, 20))


@given(click_purchase_streams())
@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_window_join_probe_matches_bruteforce(case):
    g, win = case
    got = _window_join_probe(g, win).to_pandas().set_index("user_id").sort_index()
    uid = g.column("user_id").to_numpy()
    is_click = g.column("is_click").to_numpy(zero_copy_only=False)
    ts = g.column("ts_i").to_numpy()
    rows = {}
    for i in np.flatnonzero(~is_click):
        cnt = int(
            np.sum(is_click & (uid == uid[i]) & (ts >= ts[i] - win) & (ts < ts[i]))
        )
        n, s, m = rows.get(uid[i], (0, 0, 0))
        rows[uid[i]] = (n + 1, s + cnt, max(m, cnt))
    if not rows:
        assert len(got) == 0
        return
    exp = (
        pd.DataFrame(
            [
                {"user_id": u, "n_purchases": n, "clicks_1h_sum": s, "clicks_1h_max": m}
                for u, (n, s, m) in rows.items()
            ]
        )
        .set_index("user_id")
        .sort_index()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@st.composite
def asof_streams(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    col = lambda s: draw(st.lists(s, min_size=n, max_size=n))  # noqa: E731
    conv = [f"conv-{c}" for c in col(st.integers(0, 4))]
    # unique lsns (the WAL invariant the kernel documents)
    lsn = np.array(
        draw(
            st.lists(
                st.integers(0, 10_000), min_size=n, max_size=n, unique=True
            )
        ),
        np.int64,
    )
    is_dim = np.array(col(st.booleans()), bool)
    role = [f"r{r}" for r in col(st.integers(0, 2))]
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "lsn": pa.array(lsn),
            "is_dim": pa.array(is_dim),
            "role": pa.array(role, pa.string()),
        }
    )


@given(asof_streams())
@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_asof_partial_matches_bruteforce(g):
    got = (
        _asof_join_partial(g).to_pandas().set_index("dim_role").sort_index()
    )
    conv = np.asarray(g.column("conv_id").to_pandas(), dtype=object)
    lsn = g.column("lsn").to_numpy()
    is_dim = g.column("is_dim").to_numpy(zero_copy_only=False)
    role = np.asarray(g.column("role").to_pandas(), dtype=object)
    rows = {}
    for i in np.flatnonzero(~is_dim):
        cand = np.flatnonzero(is_dim & (conv == conv[i]) & (lsn <= lsn[i]))
        if len(cand):
            j = cand[np.argmax(lsn[cand])]
            r, lag = role[j], int(lsn[i] - lsn[j])
        else:
            r, lag = "none", 0
        n, s, m = rows.get(r, (0, 0, 0))
        rows[r] = (n + 1, s + lag, max(m, lag))
    if not rows:
        assert len(got) == 0
        return
    exp = (
        pd.DataFrame(
            [
                {"dim_role": r, "n_events": n, "sum_lag": s, "max_lag": m}
                for r, (n, s, m) in rows.items()
            ]
        )
        .set_index("dim_role")
        .sort_index()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@st.composite
def sorted_string_lists(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    texts = draw(
        st.lists(
            st.text(alphabet="abé ", max_size=6), min_size=n, max_size=n
        )
    )
    return sorted(texts)


@given(sorted_string_lists())
@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_prefix_flags_matches_startswith(texts):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        _prefix_flags,
    )

    got = _prefix_flags(pa.array(texts, pa.string())).tolist()
    exp = [texts[i + 1].startswith(texts[i]) for i in range(len(texts) - 1)]
    if texts:
        exp.append(False)
    assert got == exp
