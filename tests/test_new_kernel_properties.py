"""Property-based tests (hypothesis) for the session-4 kernels —
`_partial_merge_kernel`, `_preference_pairs_kernel`,
`_rate_limit_kernel`, `_loss_mask_kernel` — each against a sequential
pure-Python reference on randomized inputs: key collisions, deletes of
absent keys, all-null patch chains, score ties, day boundaries and
empty blocks all emerge from the generators.  Pure-Arrow kernels, no
Ray session needed."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    _loss_mask_kernel,
    _partial_merge_kernel,
    _preference_pairs_kernel,
    _rate_limit_kernel,
)


def _canon(df: pd.DataFrame, keys) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(keys, kind="stable").reset_index(drop=True)


# ---------------------------------------------------------------------------
# partial-update merge
# ---------------------------------------------------------------------------


@st.composite
def patch_streams(draw):
    n = draw(st.integers(min_value=0, max_value=100))
    col = lambda s: draw(st.lists(s, min_size=n, max_size=n))  # noqa: E731
    ops = col(st.sampled_from(["insert", "update", "update", "delete"]))
    convs = col(st.integers(0, 3))
    turns = col(st.integers(0, 2))
    lsns = draw(st.permutations(range(n))) if n else []
    roles = col(st.one_of(st.none(), st.sampled_from(["user", "assistant"])))
    texts = col(st.one_of(st.none(), st.sampled_from(["a", "bb", ""])))
    ts = col(st.one_of(st.none(), st.integers(0, 5)))
    return pa.table(
        {
            "op": pa.array(ops, pa.string()),
            "lsn": pa.array(list(lsns), pa.int64()),
            "conv_id": pa.array([f"c{c}" for c in convs], pa.string()),
            "turn_idx": pa.array(turns, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "ts": pa.array(
                [None if t is None else np.datetime64(t, "us") for t in ts],
                pa.timestamp("us"),
            ),
        }
    )


def _ref_partial(tbl: pa.Table) -> pd.DataFrame:
    rows = tbl.to_pylist()
    state: dict = {}
    for r in sorted(rows, key=lambda r: r["lsn"]):
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(k, None)  # tombstone clears all prior patches
            continue
        cur = state.setdefault(k, {"role": None, "text": None, "ts": None})
        for c in ("role", "text", "ts"):
            if r[c] is not None:
                cur[c] = r[c]
    out = [
        {"conv_id": k[0], "turn_idx": k[1], **v} for k, v in sorted(state.items())
    ]
    return pd.DataFrame(
        out, columns=["conv_id", "turn_idx", "role", "text", "ts"]
    ).astype({"turn_idx": "int32"}) if out else pd.DataFrame(
        {
            "conv_id": pd.Series(dtype=object),
            "turn_idx": pd.Series(dtype="int32"),
            "role": pd.Series(dtype=object),
            "text": pd.Series(dtype=object),
            "ts": pd.Series(dtype="datetime64[us]"),
        }
    )


@settings(max_examples=200, deadline=None)
@given(patch_streams())
def test_partial_merge_matches_sequential_reference(tbl):
    got = _partial_merge_kernel(tbl).to_pandas()
    exp = _ref_partial(tbl)
    if "ts" in exp.columns and len(exp):
        exp["ts"] = pd.to_datetime(exp["ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        _canon(got, ["conv_id", "turn_idx"]),
        _canon(exp, ["conv_id", "turn_idx"]),
        check_dtype=False,
    )


# ---------------------------------------------------------------------------
# preference pairs
# ---------------------------------------------------------------------------


@st.composite
def pref_states(draw):
    n = draw(st.integers(min_value=0, max_value=80))
    pairs = draw(
        st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 9)),
            min_size=n, max_size=n, unique=True,
        )
    )
    texts = draw(
        st.lists(
            st.one_of(st.none(), st.text(alphabet="xy", max_size=5)),
            min_size=n, max_size=n,
        )
    )
    return pa.table(
        {
            "conv_id": pa.array([f"c{c}" for c, _ in pairs], pa.string()),
            "turn_idx": pa.array([t for _, t in pairs], pa.int32()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _ref_prefs(tbl: pa.Table) -> pd.DataFrame:
    rows = tbl.to_pylist()
    by_conv: dict = {}
    for r in rows:
        score = -1 if r["text"] is None else len(r["text"])
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], score))
    out = []
    for conv, turns in sorted(by_conv.items()):
        if len(turns) < 2:
            continue
        chosen = min(turns, key=lambda t: (-t[1], t[0]))
        rejected = min(turns, key=lambda t: (t[1], -t[0]))
        out.append(
            {
                "conv_id": conv,
                "chosen_turn_idx": chosen[0],
                "chosen_len": chosen[1],
                "rejected_turn_idx": rejected[0],
                "rejected_len": rejected[1],
                "margin": chosen[1] - rejected[1],
            }
        )
    cols = [
        "conv_id", "chosen_turn_idx", "chosen_len",
        "rejected_turn_idx", "rejected_len", "margin",
    ]
    return pd.DataFrame(out, columns=cols)


@settings(max_examples=200, deadline=None)
@given(pref_states())
def test_preference_pairs_matches_reference(tbl):
    got = _preference_pairs_kernel(tbl).to_pandas()
    exp = _ref_prefs(tbl)
    pd.testing.assert_frame_equal(
        _canon(got, ["conv_id"]), _canon(exp, ["conv_id"]), check_dtype=False
    )


# ---------------------------------------------------------------------------
# rate limit
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@st.composite
def event_streams(draw):
    n = draw(st.integers(min_value=0, max_value=100))
    eids = draw(st.permutations(range(n))) if n else []
    users = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    # microsecond offsets spanning ~3 days, with heavy ts collisions
    ts = draw(
        st.lists(
            st.integers(0, 3 * 86_400) ,
            min_size=n, max_size=n,
        )
    )
    return pa.table(
        {
            "event_id": pa.array(list(eids), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(
                [np.datetime64(t * 7_000_000, "us") for t in ts], pa.timestamp("us")
            ),
        }
    )


def _ref_rate_limit(tbl: pa.Table) -> pd.DataFrame:
    rows = tbl.to_pylist()
    for r in rows:
        r["_us"] = np.datetime64(r["ts"], "us").astype("datetime64[us]").astype(np.int64)
    rows.sort(key=lambda r: (r["user_id"], r["_us"] // _DAY_US, r["_us"], r["event_id"]))
    out, seen = [], {}
    for r in rows:
        k = (r["user_id"], r["_us"] // _DAY_US)
        slot = seen.get(k, 0) + 1
        seen[k] = slot
        if slot <= 3:
            out.append(
                {
                    "event_id": r["event_id"],
                    "user_id": r["user_id"],
                    "ts": r["ts"],
                    "slot": slot,
                }
            )
    return pd.DataFrame(out, columns=["event_id", "user_id", "ts", "slot"])


@settings(max_examples=200, deadline=None)
@given(event_streams())
def test_rate_limit_matches_reference(tbl):
    got = _rate_limit_kernel(tbl).to_pandas()
    exp = _ref_rate_limit(tbl)
    if len(exp):
        exp["ts"] = pd.to_datetime(exp["ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        _canon(got, ["event_id"]), _canon(exp, ["event_id"]), check_dtype=False
    )


# ---------------------------------------------------------------------------
# loss-mask spans
# ---------------------------------------------------------------------------


@st.composite
def span_states(draw):
    n = draw(st.integers(min_value=0, max_value=80))
    pairs = draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 9)),
            min_size=n, max_size=n, unique=True,
        )
    )
    texts = draw(
        st.lists(
            st.one_of(st.none(), st.sampled_from(["", "a", "a b", "  ", "a  b c"])),
            min_size=n, max_size=n,
        )
    )
    roles = draw(
        st.lists(st.sampled_from(["purchase", "click"]), min_size=n, max_size=n)
    )
    return pa.table(
        {
            "conv_id": pa.array([f"c{c}" for c, _ in pairs], pa.string()),
            "turn_idx": pa.array([t for _, t in pairs], pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _ref_spans(tbl: pa.Table) -> pd.DataFrame:
    rows = sorted(tbl.to_pylist(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    out, cursor = [], {}
    for r in rows:
        n_tok = 0 if r["text"] is None else len(re.split(r"\s+", r["text"]))
        start = cursor.get(r["conv_id"], 0)
        out.append(
            {
                "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"],
                "role": r["role"],
                "n_tokens": n_tok,
                "tok_start": start,
                "tok_end": start + n_tok,
                "loss_mask": int(r["role"] == "purchase"),
            }
        )
        cursor[r["conv_id"]] = start + n_tok
    cols = [
        "conv_id", "turn_idx", "role", "n_tokens",
        "tok_start", "tok_end", "loss_mask",
    ]
    return pd.DataFrame(out, columns=cols)


@settings(max_examples=200, deadline=None)
@given(span_states())
def test_loss_mask_spans_match_reference(tbl):
    got = _loss_mask_kernel(tbl).to_pandas()
    exp = _ref_spans(tbl)
    pd.testing.assert_frame_equal(
        _canon(got, ["conv_id", "turn_idx"]),
        _canon(exp, ["conv_id", "turn_idx"]),
        check_dtype=False,
    )


# ---------------------------------------------------------------------------
# partial-update pre-reduce + resolve (the distributed two-stage path)
# ---------------------------------------------------------------------------


@st.composite
def patch_streams_with_splits(draw):
    tbl = draw(patch_streams())
    n = len(tbl)
    n_cuts = draw(st.integers(0, 4))
    cuts = sorted(draw(st.lists(st.integers(0, n), min_size=n_cuts, max_size=n_cuts)))
    bounds = [0] + cuts + [n]
    return tbl, bounds


@settings(max_examples=200, deadline=None)
@given(patch_streams_with_splits())
def test_partial_prereduce_resolve_matches_reference(case):
    """The associative two-stage path (per-batch `_partial_prereduce`
    states over ARBITRARY stream splits, concatenated, then one
    `_partial_resolve`) must equal the sequential one-pass semantics —
    deletes, resets and per-column winners crossing batch boundaries
    in every direction."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
        _partial_prereduce,
        _partial_resolve,
    )

    tbl, bounds = case
    parts = [
        _partial_prereduce(tbl.slice(lo, hi - lo))
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]
    parts = [p for p in parts if len(p)]
    if parts:
        got = _partial_resolve(pa.concat_tables(parts)).to_pandas()
    else:
        got = pd.DataFrame(columns=["conv_id", "turn_idx", "role", "text", "ts"])
    exp = _ref_partial(tbl)
    if "ts" in exp.columns and len(exp):
        exp["ts"] = pd.to_datetime(exp["ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        _canon(got, ["conv_id", "turn_idx"]),
        _canon(exp, ["conv_id", "turn_idx"]),
        check_dtype=False,
    )


# ---------------------------------------------------------------------------
# generic lake patch kernels: base-split equivalence law
# ---------------------------------------------------------------------------


@st.composite
def patch_streams_with_base_split(draw):
    tbl = draw(patch_streams())
    n = len(tbl)
    k = draw(st.integers(0, n))  # first k lsns become the committed base
    n_cuts = draw(st.integers(0, 3))
    cuts = sorted(draw(st.lists(st.integers(0, n - k), min_size=n_cuts, max_size=n_cuts)))
    return tbl, k, [0] + cuts + [n - k]


@settings(max_examples=200, deadline=None)
@given(patch_streams_with_base_split())
def test_patch_lake_kernels_base_split_law(case):
    """For ANY split of the stream into a committed prefix (the base at
    watermark = max prefix lsn) and a suffix folded through arbitrary
    `patch_prereduce` batches, `merge_partition_patch` must equal the
    sequential one-pass reference over the WHOLE stream — the
    exactly-once + associativity contract of the lake's patch mode."""
    from cityofphiladelphia_databridge_etl_tools_ray.stages.merge import (
        merge_partition_patch,
        patch_prereduce,
    )

    tbl, k, bounds = case
    keys = ["conv_id", "turn_idx"]
    order = np.argsort(np.asarray(tbl.column("lsn")))
    sorted_tbl = tbl.take(pa.array(order))
    prefix, suffix = sorted_tbl.slice(0, k), sorted_tbl.slice(k)

    base_df = _ref_partial(prefix)
    if len(base_df):
        base = pa.table(
            {
                "conv_id": pa.array(base_df["conv_id"], pa.string()),
                "turn_idx": pa.array(base_df["turn_idx"], pa.int32()),
                "role": pa.array(base_df["role"], pa.string()),
                "text": pa.array(base_df["text"], pa.string()),
                "ts": pa.array(
                    [None if pd.isna(t) else np.datetime64(t, "us") for t in base_df["ts"]],
                    pa.timestamp("us"),
                ),
            }
        )
        wm = int(prefix.column("lsn")[k - 1].as_py())
    else:
        base = None
        wm = int(prefix.column("lsn")[k - 1].as_py()) if k else -1

    parts = [
        patch_prereduce(suffix.slice(lo, hi - lo), keys=keys)
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]
    parts = [p for p in parts if len(p)]
    states = (
        pa.concat_tables(parts) if parts else patch_prereduce(suffix.slice(0, 0), keys=keys)
    )
    got = merge_partition_patch(base, states, keys=keys, watermark=wm).to_pandas()
    exp = _ref_partial(tbl)
    if "ts" in exp.columns and len(exp):
        exp["ts"] = pd.to_datetime(exp["ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        _canon(got, ["conv_id", "turn_idx"]),
        _canon(exp, ["conv_id", "turn_idx"]),
        check_dtype=False,
    )


# ---------------------------------------------------------------------------
# patch-mode exactly-once under NON-contiguous redelivery
# ---------------------------------------------------------------------------


def _patch_base_from_prefix(prefix: pa.Table, k: int):
    base_df = _ref_partial(prefix)
    wm = int(prefix.column("lsn")[k - 1].as_py()) if k else -1
    if not len(base_df):
        return None, wm
    base = pa.table(
        {
            "conv_id": pa.array(base_df["conv_id"], pa.string()),
            "turn_idx": pa.array(base_df["turn_idx"], pa.int32()),
            "role": pa.array(base_df["role"], pa.string()),
            "text": pa.array(base_df["text"], pa.string()),
            "ts": pa.array(
                [None if pd.isna(t) else np.datetime64(t, "us") for t in base_df["ts"]],
                pa.timestamp("us"),
            ),
        }
    )
    return base, wm


def test_patch_stale_write_without_tombstone_is_not_resurrected():
    """The concrete failure the masking exists for: key deleted before
    the watermark; a later NON-contiguous redelivery re-ships the old
    write (lsn 1) WITHOUT its tombstone (lsn 2), alongside a fresh
    event.  The stale write has no base row to lose against — without
    masking it would resurrect the deleted key."""
    from cityofphiladelphia_databridge_etl_tools_ray.stages.merge import (
        merge_partition_patch,
        patch_prereduce,
    )

    keys = ["conv_id", "turn_idx"]

    def ev(op, lsn, conv, text=None, role=None):
        return {
            "op": op, "lsn": lsn, "conv_id": conv, "turn_idx": np.int32(0),
            "role": role, "text": text, "ts": None,
        }

    schema = pa.schema(
        [
            ("op", pa.string()), ("lsn", pa.int64()), ("conv_id", pa.string()),
            ("turn_idx", pa.int32()), ("role", pa.string()), ("text", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    applied = pa.Table.from_pylist(
        [ev("insert", 1, "k1", text="a", role="user"), ev("delete", 2, "k1")],
        schema=schema,
    )
    base = merge_partition_patch(
        None, patch_prereduce(applied, keys=keys), keys=keys, watermark=-1
    )
    assert len(base) == 0  # k1 deleted; watermark now 2

    # redelivery: stale write k1@1 (its tombstone @2 NOT redelivered)
    # + fresh insert k2@5, folded into ONE prereduced batch
    redelivered = pa.Table.from_pylist(
        [ev("update", 1, "k1", text="a"), ev("insert", 5, "k2", text="b", role="user")],
        schema=schema,
    )
    got = merge_partition_patch(
        base, patch_prereduce(redelivered, keys=keys), keys=keys, watermark=2
    ).to_pandas()
    assert got["conv_id"].tolist() == ["k2"]

    # mixed single state: stale column write @1 folded WITH a fresh
    # role-only update @6 for the deleted key — the key revives (the
    # genuine new write) but the stale text must NOT come back
    mixed = pa.Table.from_pylist(
        [ev("update", 1, "k1", text="a"), ev("update", 6, "k1", role="assistant")],
        schema=schema,
    )
    got = merge_partition_patch(
        base, patch_prereduce(mixed, keys=keys), keys=keys, watermark=2
    ).to_pandas()
    assert got["conv_id"].tolist() == ["k1"]
    assert got["role"].tolist() == ["assistant"]
    assert got["text"].isna().all()


@st.composite
def patch_streams_with_stale_redelivery(draw):
    tbl = draw(patch_streams())
    n = len(tbl)
    k = draw(st.integers(0, n))  # committed prefix
    redeliver = draw(st.lists(st.booleans(), min_size=k, max_size=k))
    n_cuts = draw(st.integers(0, 3))
    cuts = draw(st.lists(st.integers(0, n), min_size=n_cuts, max_size=n_cuts))
    return tbl, k, redeliver, sorted(cuts)


@settings(max_examples=200, deadline=None)
@given(patch_streams_with_stale_redelivery())
def test_patch_arbitrary_redelivery_subsets_are_idempotent(case):
    """LWW-grade exactly-once for patch mode: with a base committed at
    watermark = max prefix lsn, delivering the suffix PLUS any
    arbitrary SUBSET of already-applied prefix events (old WAL
    segments redelivered out of order, tombstones possibly missing),
    folded through arbitrary prereduce batches, must equal the
    sequential reference over the whole stream."""
    from cityofphiladelphia_databridge_etl_tools_ray.stages.merge import (
        merge_partition_patch,
        patch_prereduce,
    )

    tbl, k, redeliver, cuts = case
    keys = ["conv_id", "turn_idx"]
    order = np.argsort(np.asarray(tbl.column("lsn")))
    sorted_tbl = tbl.take(pa.array(order))
    prefix = sorted_tbl.slice(0, k)
    base, wm = _patch_base_from_prefix(prefix, k)

    mask = np.zeros(len(tbl), dtype=bool)
    mask[:k] = np.asarray(redeliver, dtype=bool) if k else False
    mask[k:] = True
    delivered = sorted_tbl.filter(pa.array(mask))
    nd = len(delivered)
    bounds = [0] + [min(c, nd) for c in cuts] + [nd]
    parts = [
        patch_prereduce(delivered.slice(lo, hi - lo), keys=keys)
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]
    parts = [p for p in parts if len(p)]
    states = (
        pa.concat_tables(parts) if parts else patch_prereduce(delivered.slice(0, 0), keys=keys)
    )
    got = merge_partition_patch(base, states, keys=keys, watermark=wm).to_pandas()
    exp = _ref_partial(tbl)
    if "ts" in exp.columns and len(exp):
        exp["ts"] = pd.to_datetime(exp["ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        _canon(got, ["conv_id", "turn_idx"]),
        _canon(exp, ["conv_id", "turn_idx"]),
        check_dtype=False,
    )
