"""Size-tiered delta compaction (state/lake.py fold_delta_runs /
compact_partition_adaptive): folding delta runs must never change the
resolved state, must preserve tombstones, and must leave the base file
untouched until deltas amortize a full rewrite."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    apply_changes_reference,
    generate_base,
    generate_changes,
    write_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.functions.hashing import partition_ids
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_into_lake
from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import read_change_log
from cityofphiladelphia_databridge_etl_tools_ray.stages.merge import dedup_last_writer
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake


def _state(lake: TranscriptLake) -> pd.DataFrame:
    df = lake.read_all().to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _delta_run(changes: pa.Table, lo: int, hi: int, pid: int, n_parts: int) -> pa.Table:
    lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
    sl = changes.filter(pa.array((lsn > lo) & (lsn <= hi)))
    pids = partition_ids(sl.column("conv_id"), n_parts)
    return dedup_last_writer(sl.filter(pa.array(pids == pid)))


@pytest.fixture
def delta_lake(tmp_path):
    """One partition seeded with a base run and three delta runs
    (tombstones included in the deltas)."""
    base = generate_base(n_convs=40, max_turns=12)
    changes = generate_changes(3000, n_convs=40, delete_frac=0.2, dup_frac=0.05)
    lake = TranscriptLake.create(str(tmp_path / "lake"), num_partitions=2)
    pids = partition_ids(base.column("conv_id"), 2)
    for pid in range(2):
        lake.commit_partition(pid, base.filter(pa.array(pids == pid)), high_lsn=-1)
    for pid in range(2):
        for lo, hi in [(-1, 1000), (1000, 2000), (2000, 2999)]:
            lake.commit_partition(
                pid, _delta_run(changes, lo, hi, pid, 2), high_lsn=hi, mode="delta"
            )
    return lake, base, changes


def test_fold_preserves_state_and_base(ray_session, delta_lake):
    lake, base, changes = delta_lake
    before = _state(lake)
    base_files = {
        pid: [f["path"] for f in lake.manifest(pid).files if f.get("kind") != "delta"]
        for pid in range(2)
    }
    assert all(lake.run_count(p) == 4 for p in range(2))

    for pid in range(2):
        m = lake.fold_delta_runs(pid)
        assert m.high_lsn == 2999
        assert len(m.files) == 2  # base + one folded delta
        # the base data file was not rewritten
        assert [f["path"] for f in m.files if f.get("kind") != "delta"] == base_files[pid]
        # the folded run still carries tombstones (op column intact)
        folded = lake.read_partition(pid, resolve=False)
        assert "op" in folded.schema.names
        assert (folded.column("op").to_pandas() == "delete").any()

    pd.testing.assert_frame_equal(_state(lake), before)
    # matches the sequential oracle too
    exp = apply_changes_reference(base, changes)
    exp = exp.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    got = _state(lake)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)
    # replaced delta runs are vacuum orphans; fold is idempotent
    assert lake.vacuum()
    assert lake.fold_delta_runs(0).files == lake.manifest(0).files


def test_adaptive_folds_small_and_rewrites_big(ray_session, delta_lake):
    lake, base, changes = delta_lake
    before = _state(lake)

    # deltas here are comparable to the base → adaptive goes full
    m = lake.compact_partition_adaptive(0, full_ratio=0.05)
    assert len(m.files) == 1 and m.files[0].get("kind") != "delta"

    # partition 1: force the fold path with a generous ratio
    base_file = [f["path"] for f in lake.manifest(1).files if f.get("kind") != "delta"]
    m = lake.compact_partition_adaptive(1, full_ratio=100.0)
    assert len(m.files) == 2
    assert [f["path"] for f in m.files if f.get("kind") != "delta"] == base_file

    pd.testing.assert_frame_equal(_state(lake), before)


def test_delta_replay_tiered_equals_full_policy(ray_session, tmp_path):
    """End-to-end: delta-mode replay with the tiered trigger converges
    to the same state as the full-compaction trigger and the
    sequential oracle, with bounded run counts."""
    base = generate_base(n_convs=50, max_turns=12)
    changes = generate_changes(4000, n_convs=60, delete_frac=0.15)
    lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
    states = {}
    for policy in ("tiered", "full"):
        root = str(tmp_path / f"lake_{policy}")
        lake = TranscriptLake.create(root, num_partitions=4)
        pids = partition_ids(base.column("conv_id"), 4)
        for pid in range(4):
            lake.commit_partition(pid, base.filter(pa.array(pids == pid)), high_lsn=-1)
        for i, (lo, hi) in enumerate([(-1, 1000), (1000, 2000), (2000, 3000), (3000, 3999)]):
            wal = str(tmp_path / f"wal_{policy}_{i}")
            write_change_log(changes.filter(pa.array((lsn > lo) & (lsn <= hi))), wal, n_files=2)
            replay_into_lake(
                root,
                read_change_log(wal),
                mode="delta",
                compact_after=3,
                compact_policy=policy,
            )
        assert all(lake.run_count(p) <= 3 for p in range(4))
        states[policy] = _state(lake)

    pd.testing.assert_frame_equal(states["tiered"], states["full"])
    exp = apply_changes_reference(base, changes)
    exp = exp.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    got = states["tiered"]
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)
