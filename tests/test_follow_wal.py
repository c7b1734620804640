"""Continuous WAL tail (pipelines/replay.py follow_wal): a producer
keeps appending segments while the loop runs; the tail must converge
to the sequential oracle exactly-once, report per-cycle lag, skip
fully-applied segments by filename, and stop when idle."""

import numpy as np
import pandas as pd
import pyarrow as pa

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    apply_changes_reference,
    generate_base,
    generate_changes,
    write_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.functions.hashing import partition_ids
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import follow_wal
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake


import pytest


@pytest.fixture(params=["", "norename://"], ids=["posix", "objectstore"])
def lake_scheme(request):
    """Run every follow-mode test on the POSIX backend AND the
    rename-free object-store backend (state/fs.py)."""
    return request.param


def _seed(tmp_path, n_convs=50, scheme=""):
    base = generate_base(n_convs=n_convs, max_turns=10)
    root = scheme + str(tmp_path / "lake")
    lake = TranscriptLake.create(root, num_partitions=8)
    pids = partition_ids(base.column("conv_id"), 8)
    for p in range(8):
        lake.commit_partition(p, base.filter(pa.array(pids == p)), high_lsn=-1)
    return root, base


def test_follow_converges_with_live_producer(ray_session, tmp_path, lake_scheme):
    root, base = _seed(tmp_path, scheme=lake_scheme)
    changes = generate_changes(3000, n_convs=60, delete_frac=0.15, dup_frac=0.05)
    lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
    wal = str(tmp_path / "wal")
    # chunk 0 is on disk before the loop starts; the producer appends
    # one chunk per poll from the sleep seam
    bounds = [(-1, 1000), (1000, 2000), (2000, 2999)]
    write_change_log(
        changes.filter(pa.array((lsn > bounds[0][0]) & (lsn <= bounds[0][1]))),
        wal, n_files=2,
    )
    pending = list(bounds[1:])

    def producer(_interval):
        if pending:
            lo, hi = pending.pop(0)
            write_change_log(
                changes.filter(pa.array((lsn > lo) & (lsn <= hi))),
                wal, n_files=2,
            )

    m = follow_wal(root, wal, sleep=producer, idle_stop=2, poll_interval=0)
    # all three chunks applied, then two idle cycles
    assert m["events_applied"].sum() > 0
    assert list(m["idle"])[-2:] == [True, True]
    assert m["max_watermark"].iloc[-1] == 2999
    # the watermark heartbeat stamps untouched partitions forward to
    # the cycle's consumed high-lsn, so the tail converges to lag 0 and
    # later cycles prune every applied segment by filename
    assert m["watermark_lag"].iloc[-1] == 0
    assert m["min_watermark"].iloc[-1] == 2999

    exp = apply_changes_reference(base, changes)
    got = (
        TranscriptLake(root)
        .read_all()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    exp = exp.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)


def test_follow_idle_cycles_are_cheap_and_exactly_once(ray_session, tmp_path, lake_scheme):
    root, base = _seed(tmp_path, scheme=lake_scheme)
    changes = generate_changes(1500, n_convs=50, delete_frac=0.1)
    wal = str(tmp_path / "wal")
    write_change_log(changes, wal, n_files=3)

    m1 = follow_wal(root, wal, sleep=lambda _: None, idle_stop=1, poll_interval=0)
    state1 = TranscriptLake(root).read_all().sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    # a second follow over the same WAL applies nothing (watermark
    # no-op) and leaves the state byte-identical
    m2 = follow_wal(root, wal, sleep=lambda _: None, idle_stop=1, poll_interval=0)
    assert m2["events_applied"].sum() == 0
    assert bool(m2["idle"].all())
    state2 = TranscriptLake(root).read_all().sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert state1.equals(state2)


def test_follow_max_cycles_bound(ray_session, tmp_path, lake_scheme):
    root, _ = _seed(tmp_path, scheme=lake_scheme)
    wal = str(tmp_path / "wal_empty")
    import os

    os.makedirs(wal, exist_ok=True)
    m = follow_wal(root, wal, sleep=lambda _: None, idle_stop=None, max_cycles=4, poll_interval=0)
    assert len(m) == 4 and bool(m["idle"].all())


def test_watermark_heartbeat_semantics(ray_session, tmp_path):
    """stamp_watermark advances metadata only (no data files change),
    never regresses, creates an empty manifest for never-written
    partitions, and a stamped partition still applies FUTURE events
    while skipping everything at or below the stamp."""
    root, base = _seed(tmp_path)
    lake = TranscriptLake(root)
    files_before = {p: [f["path"] for f in lake.manifest(p).files] for p in range(8)}

    m = lake.stamp_watermark(0, 500)
    assert m.high_lsn == 500
    assert [f["path"] for f in m.files] == files_before[0]
    assert lake.stamp_watermark(0, 100).high_lsn == 500  # no regression
    assert lake.fsck(verify_hashes=False)["ok"]

    # replaying a range at/below the stamp is a no-op for partition 0,
    # a range above it still applies
    changes = generate_changes(1200, n_convs=50, delete_frac=0.1)
    wal = str(tmp_path / "wal")
    write_change_log(changes, wal, n_files=2)
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
        replay_into_lake,
    )
    from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import (
        read_change_log,
    )

    metrics = replay_into_lake(root, read_change_log(wal))
    row = metrics[metrics["partition_id"] == 0]
    assert int(row["watermark_before"].iloc[0]) == 500
    # exactly the > 500 events routed to partition 0 were applied
    # (duplicate-lsn events collapse before the count, hence dedup)
    lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
    routed = changes.filter(pa.array(lsn > 500))
    routed = routed.filter(
        pa.array(partition_ids(routed.column("conv_id"), 8) == 0)
    )
    assert int(row["events_applied"].iloc[0]) == len(routed)
    assert int(row["watermark_after"].iloc[0]) == int(
        routed.column("lsn").to_numpy(zero_copy_only=False).max()
    )
