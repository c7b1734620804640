"""Unit tests of the pure merge kernel against the sequential oracle.

Mirrors the reference's round-trip ``recorddiff`` oracle
(reference tests/test_postgres.py:69-92) with a dict-replay oracle.
No Ray needed.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    apply_changes_reference,
    generate_base,
    generate_changes,
)
from cityofphiladelphia_databridge_etl_tools_ray.schema import (
    TRANSCRIPT_SCHEMA,
    promote_schemas,
    promote_types,
    conform,
)
from cityofphiladelphia_databridge_etl_tools_ray.stages.merge import (
    dedup_last_writer,
    merge_partition,
)


def assert_matches_oracle(result: pa.Table, expected: pd.DataFrame):
    got = result.to_pandas().sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    exp = expected.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    assert len(got) == len(exp), f"{len(got)} != {len(exp)}"
    # per-turn text equality under stable (conv_id, turn_idx) order —
    # the BASELINE.json invariant.
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "role", "tool"]],
        exp[["conv_id", "turn_idx", "role", "tool"]],
        check_dtype=False,
    )


def scenario(name, **kw):
    return pytest.param(kw, id=name)


@pytest.mark.parametrize(
    "cfg",
    [
        scenario("insert_only", update_frac=0.0, delete_frac=0.0),
        scenario("update_heavy", update_frac=0.9, delete_frac=0.0),
        scenario("delete_reinsert", update_frac=0.4, delete_frac=0.3),
        scenario("duplicates", update_frac=0.5, delete_frac=0.1, dup_frac=0.2),
        scenario("hot_key", update_frac=0.5, delete_frac=0.1, hot_frac=0.3),
        scenario("out_of_order", update_frac=0.5, delete_frac=0.1, shuffle=True),
    ],
)
def test_merge_matches_sequential_oracle(cfg):
    base = generate_base(n_convs=40, max_turns=10)
    changes = generate_changes(3000, n_convs=60, max_turns=12, **cfg)
    got = merge_partition(base, changes)
    exp = apply_changes_reference(base, changes)
    assert_matches_oracle(got, exp)


def test_merge_no_base():
    changes = generate_changes(2000, n_convs=30, delete_frac=0.2)
    got = merge_partition(None, changes)
    exp = apply_changes_reference(None, changes)
    assert_matches_oracle(got, exp)


def test_merge_idempotent_replay():
    """Replaying the same events twice ≡ once (reference round-trip
    idempotence, tests/test_postgres.py:83-86)."""
    base = generate_base(n_convs=20)
    changes = generate_changes(1000, n_convs=25)
    once = merge_partition(base, changes)
    twice = merge_partition(once, changes)
    assert once.equals(twice)


def test_merge_batch_boundary_insensitive():
    """Splitting changes into arbitrary batches, pre-deduping each
    (the shuffle combiner) then merging gives the same answer."""
    base = generate_base(n_convs=20)
    changes = generate_changes(1500, n_convs=25, dup_frac=0.1)
    whole = merge_partition(base, changes)
    parts = [changes.slice(0, 400), changes.slice(400, 700), changes.slice(1100)]
    pre = pa.concat_tables([dedup_last_writer(p) for p in parts])
    assert merge_partition(base, pre).equals(whole)


def test_dedup_last_writer_keeps_max_lsn():
    t = pa.table(
        {
            "op": ["insert", "update", "delete", "update"],
            "lsn": pa.array([1, 5, 3, 2], pa.int64()),
            "conv_id": ["a", "a", "a", "b"],
            "turn_idx": pa.array([0, 0, 0, 0], pa.int32()),
        }
    )
    out = dedup_last_writer(t)
    assert out.num_rows == 2
    d = {r["conv_id"]: r["lsn"] for r in out.to_pylist()}
    assert d == {"a": 5, "b": 2}


def test_delete_then_reinsert():
    base = pa.table(
        {
            "conv_id": ["c"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["old"],
            "tool": [None],
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    ch = pa.table(
        {
            "op": ["delete", "insert"],
            "lsn": pa.array([10, 20], pa.int64()),
            "conv_id": ["c", "c"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": [None, "user"],
            "text": [None, "new"],
            "tool": [None, None],
            "ts": pa.array([None, 99], pa.timestamp("us")),
        }
    )
    out = merge_partition(base, ch)
    assert out.to_pylist()[0]["text"] == "new"
    # delete at the max lsn → row gone
    out2 = merge_partition(base, ch.slice(0, 1))
    assert out2.num_rows == 0


def test_schema_evolution_column_add_and_widen():
    base = generate_base(n_convs=5)
    ch = generate_changes(100, n_convs=5)
    # late files: turn_idx arrives int64 + an extra nullable meta col
    ch = ch.set_column(
        ch.column_names.index("turn_idx"),
        pa.field("turn_idx", pa.int64()),
        ch.column("turn_idx").cast(pa.int64()),
    )
    ch = ch.append_column("meta", pa.array(["m"] * len(ch), pa.string()))
    out = merge_partition(base, ch)
    assert out.schema.field("turn_idx").type == pa.int64()
    assert out.schema.field("meta").type == pa.string()
    # base rows read back with null meta
    base_rows = out.filter(pc.is_null(out.column("meta")))
    assert base_rows.num_rows > 0


def test_promote_types():
    assert promote_types(pa.int32(), pa.int64()) == pa.int64()
    assert promote_types(pa.float32(), pa.float64()) == pa.float64()
    assert promote_types(pa.int64(), pa.float32()) == pa.float64()
    assert promote_types(pa.null(), pa.string()) == pa.string()
    assert promote_types(pa.timestamp("s"), pa.timestamp("us")) == pa.timestamp("us")
    with pytest.raises(TypeError):
        promote_types(pa.string(), pa.int64())


def test_conform_adds_missing_nullable():
    t = pa.table({"a": [1, 2]})
    s = promote_schemas(t.schema, pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.string())]))
    out = conform(t, s)
    assert out.column("b").null_count == 2


def test_lsn_tie_later_row_wins():
    ch = pa.table(
        {
            "op": ["insert", "insert"],
            "lsn": pa.array([7, 7], pa.int64()),
            "conv_id": ["a", "a"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user", "user"],
            "text": ["first", "second"],
            "tool": [None, None],
            "ts": pa.array([1, 2], pa.timestamp("us")),
        }
    )
    out = merge_partition(None, ch)
    assert out.to_pylist()[0]["text"] == "second"


def test_skew_aware_combiner_gate():
    """The skew-aware pre-shuffle combiner gathers when duplication is
    concentrated in one hash partition (the hot-conversation
    signature) even though batch-global duplication is low; stays
    zero-gather on evenly-spread low duplication."""
    import numpy as np
    from cityofphiladelphia_databridge_etl_tools_ray.functions.hashing import partition_ids
    from cityofphiladelphia_databridge_etl_tools_ray.stages.merge import (
        dedup_last_writer_skew_aware,
    )

    P = 16

    def mk(convs, turns, lsns):
        n = len(convs)
        return pa.table(
            {
                "op": pa.array(["update"] * n),
                "lsn": pa.array(lsns, pa.int64()),
                "conv_id": pa.array(convs),
                "turn_idx": pa.array(turns, pa.int32()),
                "role": pa.array(["user"] * n),
                "text": pa.array([f"t{i}" for i in range(n)]),
                "tool": pa.array([None] * n, pa.string()),
                "ts": pa.array([None] * n, pa.timestamp("us")),
            }
        )

    # hot case: 900 unique cold keys + 100 events on ONE hot key
    convs = [f"c{i}" for i in range(900)] + ["hot"] * 100
    turns = list(range(900)) + [0] * 100
    t = mk(convs, turns, list(range(1000)))
    pids = partition_ids(t.column("conv_id"), P)
    out, out_pids = dedup_last_writer_skew_aware(t, pids, P)
    assert len(out) == 901  # hot key collapsed to its max-lsn row
    assert len(out_pids) == 901
    hot_rows = out.filter(pc.equal(out.column("conv_id"), "hot"))
    assert hot_rows.column("lsn").to_pylist() == [999]  # LWW winner
    # routing ids follow the gathered rows
    assert (out_pids == partition_ids(out.column("conv_id"), P)).all()

    # cold case: 2% duplication spread across many keys → no gather
    convs2 = [f"c{i}" for i in range(1000)] + [f"c{i}" for i in range(20)]
    turns2 = list(range(1000)) + list(range(20))
    t2 = mk(convs2, turns2, list(range(1020)))
    pids2 = partition_ids(t2.column("conv_id"), P)
    out2, _ = dedup_last_writer_skew_aware(t2, pids2, P)
    assert len(out2) == 1020  # untouched (gate not cleared)

    # heavy global duplication → gather via the global gate
    convs3 = ["a", "b"] * 500
    turns3 = [0, 0] * 500
    t3 = mk(convs3, turns3, list(range(1000)))
    out3, _ = dedup_last_writer_skew_aware(t3, partition_ids(t3.column("conv_id"), P), P)
    assert len(out3) == 2
