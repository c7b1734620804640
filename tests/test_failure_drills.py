"""Multi-node-shaped failure drills on the flagship replay.

The manifest/txn crash tests cover every driver-side crash point;
these drills cover the WORKER-side ones a real cluster adds:

- a merge task's worker process killed mid-wave (SIGKILL — the OOM /
  node-loss signature), at both crash points: before its partition
  commit (retry re-merges) and after it (retry hits the advanced
  watermark and no-ops).  Ray's task retry must converge the lake to
  byte-equality with an undisturbed one-shot replay.
- a follow-mode producer interleaved with an online partition rescale
  between tail cycles: the generation flip must preserve watermarks so
  the following cycles stay exactly-once at the new layout, and the
  writer guard must reject a cycle racing an IN-FLIGHT rescale.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

import cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay as replay_mod
from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    generate_changes,
    write_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
    follow_wal,
    replay_into_lake,
)
from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import (
    read_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake


class CrashOnceMergeCommit(replay_mod._MergeCommit):
    """_MergeCommit that SIGKILLs its worker process the FIRST time it
    handles the target partition — before or after the commit,
    depending on ``crash_point``.  The sentinel file makes the crash
    one-shot so Ray's task retry converges."""

    def __init__(self, *args, sentinel: str, target_pid: int = 0,
                 crash_point: str = "before_commit", **kwargs):
        super().__init__(*args, **kwargs)
        self.sentinel = sentinel
        self.target_pid = target_pid
        self.crash_point = crash_point

    def __getstate__(self):
        st = super().__getstate__()
        st.update(
            sentinel=self.sentinel,
            target_pid=self.target_pid,
            crash_point=self.crash_point,
        )
        return st

    def _maybe_crash(self, pid: int) -> None:
        if pid != self.target_pid or os.path.exists(self.sentinel):
            return
        with open(self.sentinel, "w") as f:
            f.write("crashed")
        os.kill(os.getpid(), 9)  # hard worker death, no cleanup

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = int(group.column(replay_mod.PART_COL)[0].as_py())
        if self.crash_point == "before_commit":
            self._maybe_crash(pid)
        out = super().__call__(group)
        if self.crash_point == "after_commit":
            self._maybe_crash(pid)
        return out


# the crash wrapper must travel INTO Ray worker processes, which
# cannot import pytest's test modules — ship this module by value
import sys as _sys

from ray import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


def _state(root):
    df = TranscriptLake(root).read_all().to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("crash_point", ["before_commit", "after_commit"])
def test_merge_worker_killed_mid_wave_converges(
    ray_session, tmp_path, monkeypatch, crash_point
):
    changes = generate_changes(1500, n_convs=50, delete_frac=0.1, seed=31)

    # undisturbed one-shot replay = the byte-equality oracle
    ref_root = str(tmp_path / "ref")
    TranscriptLake.create(ref_root, num_partitions=4)
    replay_into_lake(ref_root, ray.data.from_arrow(changes), validate_sample=None)
    expected = _state(ref_root)

    root = str(tmp_path / "lake")
    TranscriptLake.create(root, num_partitions=4)
    sentinel = str(tmp_path / f"crash-{crash_point}.marker")

    def crashing_merge(*args, **kwargs):
        return CrashOnceMergeCommit(
            *args, sentinel=sentinel, target_pid=0, crash_point=crash_point, **kwargs
        )

    monkeypatch.setattr(replay_mod, "_MergeCommit", crashing_merge)
    m = replay_into_lake(root, ray.data.from_arrow(changes), validate_sample=None)
    monkeypatch.undo()

    assert os.path.exists(sentinel), "fault was never injected"
    # the retried wave produced a complete metrics set
    assert set(m["partition_id"]) == {0, 1, 2, 3}
    got = _state(root)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], expected[sorted(expected.columns)], check_dtype=False
    )
    assert TranscriptLake(root).watermarks() == TranscriptLake(ref_root).watermarks()
    # and the lake is internally consistent after the crash-retry
    audit = TranscriptLake(root).fsck()
    assert audit["ok"], audit["errors"]


def test_follow_producer_interleaved_with_rescale(ray_session, tmp_path):
    changes = generate_changes(2400, n_convs=60, delete_frac=0.1, seed=32)
    lsn = np.asarray(changes.column("lsn"))
    w1 = changes.filter(pa.array(lsn < 800))
    w2 = changes.filter(pa.array((lsn >= 800) & (lsn < 1600)))
    w3 = changes.filter(pa.array(lsn >= 1600))

    # one-shot oracle
    ref_root = str(tmp_path / "ref")
    TranscriptLake.create(ref_root, num_partitions=4)
    replay_into_lake(ref_root, ray.data.from_arrow(changes), validate_sample=None)
    expected = _state(ref_root)

    root = str(tmp_path / "lake")
    TranscriptLake.create(root, num_partitions=4)
    wal = str(tmp_path / "wal")
    write_change_log(w1, wal, n_files=2)

    stage = {"n": 0}

    def producer(_interval):
        # the "cluster operator" acting between tail cycles
        stage["n"] += 1
        if stage["n"] == 1:
            # deliver window 2 AND split the lake 4 -> 8 online
            write_change_log(w2, wal, n_files=2)
            res = TranscriptLake(root).split_partitions(2)
            assert res["num_partitions"] == 8
        elif stage["n"] == 2:
            # deliver window 3 AND coalesce 8 -> 4
            write_change_log(w3, wal, n_files=2)
            res = TranscriptLake(root).coalesce_partitions(2)
            assert res["num_partitions"] == 4

    follow_wal(
        root,
        wal,
        sleep=producer,
        idle_stop=2,
        max_cycles=10,
        mode="merge",
        validate_sample=None,
    )
    got = _state(root)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], expected[sorted(expected.columns)], check_dtype=False
    )
    audit = TranscriptLake(root).fsck()
    assert audit["ok"], audit["errors"]


def test_follow_cycle_racing_inflight_rescale_is_rejected(ray_session, tmp_path):
    """A tail cycle that starts while a rescale is IN FLIGHT (intent
    present, flip not published) must fail loudly, not write stale
    children — and proceed cleanly once the rescale completes."""
    changes = generate_changes(600, n_convs=30, seed=33)
    root = str(tmp_path / "lake")
    TranscriptLake.create(root, num_partitions=4)
    wal = str(tmp_path / "wal")
    write_change_log(changes, wal, n_files=2)

    from cityofphiladelphia_databridge_etl_tools_ray.state.fs import storage_for

    st, phys = storage_for(root)
    st.put_json(
        st.join(phys, "rescale-g2.json"), {"from": 4, "to": 8, "generation": 2}
    )
    with pytest.raises(RuntimeError, match="rescale to generation 2 in progress"):
        replay_into_lake(root, read_change_log(wal))
    TranscriptLake(root).split_partitions(2)  # finish the rescale
    m = replay_into_lake(root, read_change_log(wal))
    assert (m["events_applied"] > 0).any()


@pytest.mark.parametrize("scheme", ["", "norename://"], ids=["posix", "objectstore"])
def test_follow_interleaved_with_compaction_and_vacuum(ray_session, tmp_path, scheme):
    """Tiered compaction and snapshot-aware vacuum racing a LIVE
    follow tail, on both storage backends.  Between tail cycles the
    "cluster operator" snapshots the lake, compacts every partition,
    and vacuums — twice, with new WAL windows landing each time.  The
    tail must stay exactly-once (final state byte-equal to an
    undisturbed one-shot replay), the mid-stream snapshot must keep
    time-traveling to the exact pre-compaction state after BOTH
    vacuums, and dropping it must let the next vacuum reclaim its
    files without touching the live tree (fsck-clean)."""
    changes = generate_changes(2400, n_convs=60, delete_frac=0.1, seed=34)
    lsn = np.asarray(changes.column("lsn"))
    w1 = changes.filter(pa.array(lsn < 800))
    w2 = changes.filter(pa.array((lsn >= 800) & (lsn < 1600)))
    w3 = changes.filter(pa.array(lsn >= 1600))

    # undisturbed one-shot oracle
    ref_root = str(tmp_path / "ref")
    TranscriptLake.create(ref_root, num_partitions=4)
    replay_into_lake(ref_root, ray.data.from_arrow(changes), validate_sample=None)
    expected = _state(ref_root)
    # oracle for the snapshot point (w1 only applied)
    ref1 = str(tmp_path / "ref1")
    TranscriptLake.create(ref1, num_partitions=4)
    replay_into_lake(ref1, ray.data.from_arrow(w1), validate_sample=None)
    expected_w1 = _state(ref1)

    root = scheme + str(tmp_path / "lake")
    TranscriptLake.create(root, num_partitions=4)
    wal = str(tmp_path / "wal")
    write_change_log(w1, wal, n_files=2)

    stage = {"n": 0, "sid": None}

    def operator(_interval):
        lake = TranscriptLake(root)
        stage["n"] += 1
        if stage["n"] == 1:
            # w1 is applied: snapshot it, then compact + vacuum UNDER
            # the snapshot while delivering window 2
            stage["sid"] = lake.snapshot(note="pre-compaction")
            write_change_log(w2, wal, n_files=2)
            for pid in range(lake.num_partitions):
                lake.compact_partition(pid)
            lake.vacuum()
        elif stage["n"] == 2:
            # w1+w2 applied: compact + vacuum again with the snapshot
            # still live, deliver window 3
            write_change_log(w3, wal, n_files=2)
            for pid in range(lake.num_partitions):
                lake.compact_partition(pid)
            lake.vacuum()

    follow_wal(
        root, wal, sleep=operator, idle_stop=2, max_cycles=10,
        mode="merge", validate_sample=None,
    )

    got = _state(root)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], expected[sorted(expected.columns)],
        check_dtype=False,
    )
    lake = TranscriptLake(root)
    # the snapshot survived two compaction+vacuum passes byte-exactly
    sid = stage["sid"]
    assert sid is not None
    snap = (
        lake.dataset(snapshot=sid)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(
        snap["text"], expected_w1["text"], check_names=False
    )
    # drop it; the next vacuum reclaims its superseded files and the
    # live tree stays intact
    lake.drop_snapshot(sid)
    removed = lake.vacuum()
    assert removed  # the pre-compaction files were only snapshot-pinned
    pd.testing.assert_frame_equal(
        _state(root)[sorted(got.columns)], expected[sorted(expected.columns)],
        check_dtype=False,
    )
    audit = TranscriptLake(root).fsck()
    assert audit["ok"], audit["errors"]
