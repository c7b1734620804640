"""Property-based tests (hypothesis): the LWW merge kernel against the
sequential dict-apply reference on randomized change streams —
duplicate LSNs (tie-break), deletes of absent keys, null/empty text,
hot keys, and split-replay associativity all emerge from the
generator rather than being hand-enumerated.  Pure-Arrow kernels, no
Ray session needed."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cityofphiladelphia_databridge_etl_tools_ray.datagen import apply_changes_reference
from cityofphiladelphia_databridge_etl_tools_ray.stages.merge import (
    dedup_last_writer,
    merge_partition,
)

_BASE_TS = pd.Timestamp("2024-01-01")


@st.composite
def change_tables(draw):
    n = draw(st.integers(min_value=1, max_value=150))
    col = lambda s: draw(st.lists(s, min_size=n, max_size=n))  # noqa: E731
    ops = col(st.sampled_from(["insert", "update", "delete"]))
    convs = col(st.integers(0, 5))  # few convs → heavy key collisions
    turns = col(st.integers(0, 3))
    lsns = col(st.integers(0, 40))  # duplicates likely → lsn tie-break
    texts = col(st.one_of(st.none(), st.text(alphabet="ab ", max_size=4)))
    return pa.table(
        {
            "op": pa.array(ops, pa.string()),
            "lsn": pa.array(lsns, pa.int64()),
            "conv_id": pa.array([f"conv-{c}" for c in convs], pa.string()),
            "turn_idx": pa.array(turns, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.nulls(n, pa.string()),
            "ts": pa.array([_BASE_TS + pd.Timedelta(seconds=x) for x in lsns], pa.timestamp("us")),
        }
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype).startswith("int"):
            df[c] = df[c].astype("int64")
    cols = sorted(df.columns)
    return df[cols].sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _assert_matches_reference(merged: pa.Table, changes: pa.Table):
    got = _canon(merged.to_pandas())
    ref = _canon(apply_changes_reference(None, changes))
    common = [c for c in got.columns if c in ref.columns]
    pd.testing.assert_frame_equal(got[common], ref[common], check_dtype=False)


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(change_tables())
def test_merge_matches_sequential_reference(changes):
    _assert_matches_reference(merge_partition(None, changes, keep_lsn=True), changes)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(change_tables(), st.integers(0, 39))
def test_split_replay_associativity(changes, split_lsn):
    """Replaying [min..s] then (s..max] into the intermediate state
    equals the one-shot merge — the watermark-resume invariant, for
    every split point that separates distinct lsn values."""
    first = changes.filter(pa.compute.less_equal(changes.column("lsn"), split_lsn))
    second = changes.filter(pa.compute.greater(changes.column("lsn"), split_lsn))
    state1 = merge_partition(None, first)
    if len(first) and len(second):
        two_step = merge_partition(state1 if len(state1) else None, second)
    elif len(second):
        two_step = merge_partition(None, second)
    else:
        two_step = state1
    one_shot = merge_partition(None, changes)
    a, b = _canon(two_step.to_pandas()), _canon(one_shot.to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(change_tables(), st.integers(1, 149))
def test_combiner_associativity(changes, cut):
    """dedup(dedup(a) ++ dedup(b)) == dedup(a ++ b) — what makes the
    pre-shuffle combiner safe (later-input-wins ties preserved
    because part order is preserved)."""
    cut = min(cut, len(changes))
    a, b = changes.slice(0, cut), changes.slice(cut)
    parts = pa.concat_tables([dedup_last_writer(a), dedup_last_writer(b)])
    got = _canon(dedup_last_writer(parts).to_pandas())
    want = _canon(dedup_last_writer(changes).to_pandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------- connected-components properties ----------------


def _bfs_reference(edges):
    """Plain BFS components reference: doc -> (min-id label, size)."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    label, size = {}, {}
    seen = set()
    for start in adj:
        if start in seen:
            continue
        comp, queue = [], [start]
        seen.add(start)
        while queue:
            x = queue.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    queue.append(y)
        m = min(comp)
        for x in comp:
            label[x], size[x] = m, len(comp)
    return label, size


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=60,
    )
)
@settings(deadline=None, max_examples=200)
def test_unionfind_matches_bfs_reference(edges):
    """Union-find labels/sizes equal BFS components for arbitrary
    edge lists — self-loops, duplicate edges, any order."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        _unionfind_cluster_table,
    )

    a = np.array([u for u, _ in edges], dtype=np.int64)
    b = np.array([v for _, v in edges], dtype=np.int64)
    t = _unionfind_cluster_table(a, b)
    lab, size = _bfs_reference(edges)
    got = {
        d: (c, n)
        for d, c, n in zip(
            t.column("doc_id").to_pylist(),
            t.column("cluster_id").to_pylist(),
            t.column("n_members").to_pylist(),
        )
    }
    assert got == {d: (lab[d], size[d]) for d in lab}
