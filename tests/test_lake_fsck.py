"""Lake integrity audit (state/lake.py fsck): detects bit rot,
truncated/missing files, row-count drift and watermark regression
without raising — the engine's analog of the reference's post-load
count asserts."""

import os

import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    generate_base,
    generate_changes,
    write_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.functions.hashing import partition_ids
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_into_lake
from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import read_change_log
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake


@pytest.fixture
def healthy_lake(tmp_path):
    base = generate_base(n_convs=30, max_turns=8)
    root = str(tmp_path / "lake")
    lake = TranscriptLake.create(root, num_partitions=4)
    pids = partition_ids(base.column("conv_id"), 4)
    for p in range(4):
        lake.commit_partition(p, base.filter(pa.array(pids == p)), high_lsn=-1)
    changes = generate_changes(1500, n_convs=30, delete_frac=0.1)
    write_change_log(changes, str(tmp_path / "wal"), n_files=2)
    replay_into_lake(root, read_change_log(str(tmp_path / "wal")), mode="delta", compact_after=0)
    return lake


def test_fsck_clean_lake_ok(ray_session, healthy_lake):
    res = healthy_lake.fsck()
    assert res["ok"] and res["errors"] == []
    assert res["files_checked"] >= 8  # 4 bases + 4 delta runs
    # fast mode skips hashing but still checks counts/existence
    assert healthy_lake.fsck(verify_hashes=False)["ok"]


def _first_data_file(lake, pid=0):
    m = lake.manifest(pid)
    return os.path.join(lake.part_dir(pid), m.files[0]["path"])


def test_fsck_detects_bit_rot(ray_session, healthy_lake):
    path = _first_data_file(healthy_lake)
    data = bytearray(open(path, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(path, "wb").write(bytes(data))
    res = healthy_lake.fsck()
    assert not res["ok"]
    assert any("sha mismatch" in e or "unreadable" in e for e in res["errors"])


def test_fsck_detects_missing_file(ray_session, healthy_lake):
    os.unlink(_first_data_file(healthy_lake))
    res = healthy_lake.fsck(verify_hashes=False)
    assert not res["ok"] and any("missing data file" in e for e in res["errors"])


def test_fsck_detects_rowcount_drift_and_regression(ray_session, healthy_lake):
    m = healthy_lake.manifest(1)
    m.row_count += 5
    m.lineage = [{"lsn_hi": 100}, {"lsn_hi": 50}]  # regressed watermark
    m.high_lsn = 10  # below last lineage entry
    m.save(healthy_lake._manifest_path(1))
    res = healthy_lake.fsck(verify_hashes=False)
    assert not res["ok"]
    msgs = "\n".join(res["errors"])
    assert "row_count" in msgs
    assert "watermark regressed" in msgs
    assert "below last lineage" in msgs
