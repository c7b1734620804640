"""Unit tests for the packed shuffle exchange (replay.pack_exchange /
unpack_exchange): round-trip fidelity, partition grouping, per-blob
schema evolution, and the empty edge — the end-to-end equivalence
under the real shuffle lives in test_replay_pipeline.py (the packed
path is the default there)."""

import numpy as np
import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
    BLOB_COL,
    PART_COL,
    pack_exchange,
    unpack_exchange,
)


def _batch(n, text="t"):
    return pa.table(
        {
            "op": pa.array(["insert"] * n),
            "lsn": pa.array(np.arange(n, dtype=np.int64)),
            "conv_id": pa.array([f"conv-{i % 5}" for i in range(n)]),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
            "text": pa.array([f"{text}{i}" for i in range(n)]),
        }
    )


def test_pack_unpack_round_trip_per_partition():
    b = _batch(100)
    pids = (np.arange(100) % 7).astype(np.int32)
    packed = pack_exchange(b, pids)
    assert packed.column_names == [PART_COL, BLOB_COL]
    assert len(packed) == 7  # one blob per partition present
    # each blob holds exactly its partition's rows, content preserved
    total = 0
    for row in range(len(packed)):
        pid = packed.column(PART_COL)[row].as_py()
        t = unpack_exchange(packed.slice(row, 1))
        expect = b.filter(pa.array(pids == pid))
        assert t.sort_by("lsn").equals(expect.sort_by("lsn"))
        total += len(t)
    assert total == 100


def test_unpack_concat_multiple_blobs():
    b1, b2 = _batch(10, "a"), _batch(10, "b")
    p1 = pack_exchange(b1, np.zeros(10, np.int32))
    p2 = pack_exchange(b2, np.zeros(10, np.int32))
    group = pa.concat_tables([p1, p2])
    t = unpack_exchange(group)
    assert len(t) == 20
    assert set(t.column("text").to_pylist()) == set(
        b1.column("text").to_pylist() + b2.column("text").to_pylist()
    )


def test_unpack_unifies_evolved_schemas():
    # producer v2 adds a `tool` column; unpack must unify permissively
    # (v1 rows get nulls) — the merge stage's schema-evolution rule
    b1 = _batch(5, "v1")
    b2 = _batch(5, "v2").append_column("tool", pa.array(["t"] * 5))
    group = pa.concat_tables(
        [
            pack_exchange(b1, np.zeros(5, np.int32)),
            pack_exchange(b2, np.zeros(5, np.int32)),
        ]
    )
    t = unpack_exchange(group)
    assert "tool" in t.column_names
    tools = t.to_pandas().set_index("text")["tool"]
    assert tools[[f"v2{i}" for i in range(5)]].notna().all()
    assert tools[[f"v1{i}" for i in range(5)]].isna().all()


def test_pack_empty_batch_yields_empty_packed_table():
    b = _batch(0)
    packed = pack_exchange(b, np.array([], np.int32))
    assert len(packed) == 0
    assert packed.column_names == [PART_COL, BLOB_COL]


def test_compression_actually_shrinks_payload():
    # repetitive text must compress well through the lz4 IPC codec
    n = 2000
    b = pa.table(
        {
            "op": pa.array(["insert"] * n),
            "lsn": pa.array(np.arange(n, dtype=np.int64)),
            "conv_id": pa.array(["conv-0"] * n),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
            "text": pa.array(["lorem ipsum dolor sit amet " * 20] * n),
        }
    )
    packed = pack_exchange(b, np.zeros(n, np.int32))
    blob_bytes = len(packed.column(BLOB_COL)[0].as_py())
    raw_bytes = b.nbytes
    assert blob_bytes < raw_bytes / 3

def test_pack_salted_round_trip():
    # the salted phase-1 exchange: blobs keyed on (part, lsn % salt),
    # every row recoverable, part/salt decomposition exact
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import SALT_COL

    b = _batch(120)
    pids = (np.arange(120) % 4).astype(np.int32)
    salts = (np.arange(120, dtype=np.int64) % 3).astype(np.int32)
    packed = pack_exchange(b, pids, salts=salts)
    assert packed.column_names == [PART_COL, SALT_COL, BLOB_COL]
    assert len(packed) == 12  # 4 parts x 3 salts
    total = 0
    for row in range(len(packed)):
        pid = packed.column(PART_COL)[row].as_py()
        s = packed.column(SALT_COL)[row].as_py()
        t = unpack_exchange(packed.slice(row, 1))
        expect = b.filter(pa.array((pids == pid) & (salts == s)))
        assert t.sort_by("lsn").equals(expect.sort_by("lsn"))
        total += len(t)
    assert total == 120


def test_pack_salted_empty():
    packed = pack_exchange(_batch(0), np.array([], np.int32), salts=np.array([], np.int32))
    assert len(packed) == 0
    assert packed.column_names[1] == "_salt"


def test_pack_blob_size_cap_splits_hot_partition(monkeypatch):
    # a partition slice above GRAFT_PACK_MAX_BLOB must split into
    # multiple blob rows (unpack concatenates them transparently)
    monkeypatch.setenv("GRAFT_PACK_MAX_BLOB", str(4096))
    b = _batch(500, "some moderately long text payload ")
    pids = np.zeros(500, np.int32)
    packed = pack_exchange(b, pids)
    assert len(packed) > 1  # split
    assert set(packed.column(PART_COL).to_pylist()) == {0}
    t = unpack_exchange(packed)
    assert t.sort_by("lsn").equals(b.sort_by("lsn"))
    # every blob respects the cap within one chunk's tolerance
    for blob in packed.column(BLOB_COL).to_pylist():
        assert len(blob) <= 4096 * 4  # compressed, loose bound


def test_salted_replay_packs_both_exchanges(ray_session):
    # end-to-end: salt>1 with packing ON must give byte-identical lake
    # state to the unsalted path (associativity + packed phase-1)
    import ray

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_to_table

    b = _batch(400)
    ds = ray.data.from_arrow(b)
    plain = replay_to_table(ds, num_partitions=4).to_pandas()
    salted = replay_to_table(ray.data.from_arrow(b), num_partitions=4, salt=4).to_pandas()
    key = ["conv_id", "turn_idx"]
    assert plain.sort_values(key).reset_index(drop=True).equals(
        salted.sort_values(key).reset_index(drop=True)
    )
