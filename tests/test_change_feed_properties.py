"""Property-based tests (hypothesis): the two-sided LWW feed kernel
(pipelines/diff._feed_diff_kernel) against a sequential dict-apply
reference on randomized change streams — duplicate LSNs, deletes of
absent keys, delete+reinsert collapses, null texts and window
boundaries all emerge from the generator.  Pure-Arrow kernel, no Ray
session needed."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.diff import _feed_diff_kernel


@st.composite
def feed_cases(draw):
    n = draw(st.integers(min_value=0, max_value=120))
    col = lambda s: draw(st.lists(s, min_size=n, max_size=n))  # noqa: E731
    ops = col(st.sampled_from(["insert", "update", "delete"]))
    convs = col(st.integers(0, 4))  # few keys → heavy collisions
    turns = col(st.integers(0, 2))
    lsns = col(st.integers(0, 30))
    texts = col(st.one_of(st.none(), st.sampled_from(["a", "b", ""])))
    roles = col(st.sampled_from(["user", "assistant"]))
    lsn_a = draw(st.integers(-1, 31))
    tbl = pa.table(
        {
            "op": pa.array(ops, pa.string()),
            "lsn": pa.array(lsns, pa.int64()),
            "conv_id": pa.array([f"c{c}" for c in convs], pa.string()),
            "turn_idx": pa.array(turns, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "ts": pa.array(np.array(lsns, "datetime64[us]"), pa.timestamp("us")),
        }
    )
    return tbl, lsn_a


def reference_feed(tbl: pa.Table, lsn_a: int) -> set:
    """Sequential reference: LWW state per side by (lsn, input order),
    null-safe payload compare, unchanged keys dropped."""
    rows = tbl.to_pylist()

    def state(upto):
        best = {}
        for i, r in enumerate(rows):
            if r["lsn"] > upto:
                continue
            k = (r["conv_id"], r["turn_idx"])
            if k not in best or (r["lsn"], i) >= best[k][:2]:
                best[k] = (r["lsn"], i, r)
        return {
            k: (v[2]["role"], v[2]["text"], v[2]["ts"])
            for k, v in best.items()
            if v[2]["op"] != "delete"
        }

    sa, sb = state(lsn_a), state(max(r["lsn"] for r in rows) if rows else lsn_a)
    out = set()
    for k in sa.keys() | sb.keys():
        in_a, in_b = k in sa, k in sb
        if in_a and in_b and sa[k] == sb[k]:
            continue
        op = "insert" if not in_a else ("delete" if not in_b else "update")
        out.add((k[0], k[1], op, sa[k][1] if in_a else None, sb[k][1] if in_b else None))
    return out


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(feed_cases())
def test_feed_kernel_matches_sequential_reference(case):
    tbl, lsn_a = case
    got = _feed_diff_kernel(tbl, lsn_a=lsn_a)
    got_set = {
        (r["conv_id"], r["turn_idx"], r["change_op"], r["before_text"], r["after_text"])
        for r in got.to_pylist()
    }
    assert got_set == reference_feed(tbl, lsn_a)
    # and key uniqueness: one net change per key
    keys = [(r["conv_id"], r["turn_idx"]) for r in got.to_pylist()]
    assert len(keys) == len(set(keys))
