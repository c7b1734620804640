"""Configurable primary-key / payload-schema lake (round-2 verdict
item 2): a table whose PK and columns share nothing with the
transcripts shape must replay end-to-end, idempotently, through the
same lake path (reference --primary_key, ago/ago_commands.py:41)."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_into_lake
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake

SCHEMA = pa.schema(
    [
        pa.field("item_id", pa.int64(), nullable=False),
        pa.field("qty", pa.int64()),
        pa.field("note", pa.string()),
    ]
)


def _changes(n=400, seed=3):
    rng = np.random.default_rng(seed)
    item = rng.integers(0, 60, n)
    op = np.where(
        rng.random(n) < 0.15, "delete", np.where(rng.random(n) < 0.3, "insert", "update")
    )
    return pa.table(
        {
            "op": pa.array(op.tolist()),
            "lsn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "item_id": pa.array(item, pa.int64()),
            "qty": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "note": pa.array([f"n{i}" for i in range(n)]),
        }
    )


def _reference_state(t: pa.Table) -> dict:
    state = {}
    for row in t.to_pylist():  # sequential replay oracle
        if row["op"] == "delete":
            state.pop(row["item_id"], None)
        else:
            state[row["item_id"]] = (row["qty"], row["note"])
    return state


@pytest.fixture
def lake_root(tmp_path):
    root = str(tmp_path / "genpk")
    TranscriptLake.create(root, num_partitions=8, schema=SCHEMA, primary_key=["item_id"])
    return root


def _lake_state(root) -> dict:
    t = TranscriptLake(root).read_all()
    return {
        r["item_id"]: (r["qty"], r["note"]) for r in t.to_pylist()
    }


def test_generic_pk_replay_matches_sequential_reference(ray_session, lake_root):
    import ray.data

    t = _changes()
    replay_into_lake(lake_root, ray.data.from_arrow(t))
    assert _lake_state(lake_root) == _reference_state(t)


def test_generic_pk_replay_idempotent(ray_session, lake_root):
    import ray.data

    t = _changes()
    replay_into_lake(lake_root, ray.data.from_arrow(t))
    before = _lake_state(lake_root)
    m2 = replay_into_lake(lake_root, ray.data.from_arrow(t))  # exact re-replay
    assert _lake_state(lake_root) == before
    assert int(m2["events_applied"].sum()) == 0  # watermark no-op


def test_generic_pk_delta_mode_and_compaction(ray_session, lake_root):
    import ray.data

    t = _changes()
    half = len(t) // 2
    replay_into_lake(lake_root, ray.data.from_arrow(t.slice(0, half)))
    replay_into_lake(lake_root, ray.data.from_arrow(t.slice(half)), mode="delta")
    assert _lake_state(lake_root) == _reference_state(t)
    lake = TranscriptLake(lake_root)
    for pid in range(lake.num_partitions):
        lake.compact_partition(pid)
    assert _lake_state(lake_root) == _reference_state(t)


def test_export_schema_reports_custom_pk(lake_root):
    js = TranscriptLake(lake_root).export_json_schema()
    assert js["primaryKey"] == ["item_id"]
    assert [f["name"] for f in js["fields"]] == ["item_id", "qty", "note"]


def test_cli_create_lake_primary_key_and_schema_from(tmp_path):
    wal = str(tmp_path / "wal.parquet")
    pq.write_table(_changes(50), wal)
    root = str(tmp_path / "clilake")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "cityofphiladelphia_databridge_etl_tools_ray",
            "create-lake",
            root,
            "--partitions",
            "4",
            "--primary-key",
            "item_id",
            "--schema-from",
            wal,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["primary_key"] == ["item_id"]
    assert info["columns"] == ["item_id", "qty", "note"]
    lake = TranscriptLake(root)
    assert lake.primary_key == ["item_id"]


def test_create_lake_rejects_pk_not_in_schema(tmp_path):
    with pytest.raises(ValueError, match="primary_key"):
        TranscriptLake.create(
            str(tmp_path / "bad"), schema=SCHEMA, primary_key=["nope"]
        )


def test_legacy_lake_json_defaults_to_transcript_pk(tmp_path):
    root = str(tmp_path / "legacy")
    TranscriptLake.create(root, num_partitions=4)
    # simulate a pre-round-3 lake.json without the primary_key field
    meta = json.load(open(os.path.join(root, "lake.json")))
    meta.pop("primary_key")
    json.dump(meta, open(os.path.join(root, "lake.json"), "w"))
    assert TranscriptLake(root).primary_key == ["conv_id", "turn_idx"]


def test_generic_pk_rescale_mid_replay(ray_session, lake_root):
    """Online rescale on an int64-PK lake: the split hashes
    primary_key[0] (item_id), so rescaling mid-replay must preserve
    routing, state and exactly-once just like the transcripts lake."""
    import ray.data

    from cityofphiladelphia_databridge_etl_tools_ray.functions.hashing import (
        partition_ids,
    )

    t = _changes(n=600)
    lsn = t.column("lsn").to_numpy(zero_copy_only=False)
    replay_into_lake(lake_root, ray.data.from_arrow(t.filter(pa.array(lsn <= 300))))
    lake = TranscriptLake(lake_root)
    lake.split_partitions(2)  # 8 -> 16
    replay_into_lake(lake_root, ray.data.from_arrow(t.filter(pa.array(lsn > 300))))
    assert _lake_state(lake_root) == _reference_state(t)
    fresh = TranscriptLake(lake_root)
    for p in range(16):
        part = fresh.read_partition(p)
        if len(part):
            assert (partition_ids(part.column("item_id"), 16) == p).all()
    fresh.coalesce_partitions(4)  # 16 -> 4
    assert _lake_state(lake_root) == _reference_state(t)
    assert fresh.fsck(verify_hashes=False)["ok"]
