"""Zone-map pruned scans, hash-routed point lookups, and snapshot
time travel (state/lake.py).

Contracts under test:
- commit records per-file [min, max] stats for numeric/temporal
  columns; ``scan_plan`` prunes partitions whose runs all miss the
  window (and only those), staying conservative when stats are absent;
- ``scan`` equals a full-read filter; ``lookup`` reads only the owning
  partitions and equals a key-membership filter;
- a snapshot is an immutable metadata copy: later replays, compaction
  and rescale never disturb it, vacuum retains every file it
  references, and dropping it makes those files reclaimable.
"""

import datetime
import os

import pandas as pd
import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    generate_base,
    generate_changes,
)
from cityofphiladelphia_databridge_etl_tools_ray.functions.hashing import partition_ids
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import (
    PartitionManifest,
    TranscriptLake,
    _column_stats,
)

N_PARTS = 4
HOUR_US = 3_600_000_000


def _routed_lake(tmp_path, *, ts_shift_per_pid: int = 0) -> tuple[str, pa.Table]:
    """Lake seeded with hash-routed base rows; optionally shift each
    partition's ts by ``pid · shift`` hours so ts correlates with the
    partition layout (the case zone maps prune)."""
    base = generate_base(n_convs=50, max_turns=10)
    root = str(tmp_path / "lake")
    lake = TranscriptLake.create(root, num_partitions=N_PARTS)
    pids = partition_ids(base.column("conv_id"), N_PARTS)
    parts = []
    for pid in range(N_PARTS):
        part = base.filter(pa.array(pids == pid))
        if ts_shift_per_pid:
            import pyarrow.compute as pc

            shifted = pc.cast(
                pc.add(
                    pc.cast(part.column("ts"), pa.int64()),
                    pa.scalar(pid * ts_shift_per_pid * HOUR_US),
                ),
                pa.timestamp("us"),
            )
            part = part.set_column(
                part.schema.get_field_index("ts"), "ts", shifted
            )
        lake.commit_partition(pid, part, high_lsn=0)
        parts.append(part)
    return root, pa.concat_tables(parts)


def test_commit_records_zone_map_stats(ray_session, tmp_path):
    root, base = _routed_lake(tmp_path)
    lake = TranscriptLake(root)
    entry = lake.manifest(0).files[0]
    stats = entry["stats"]
    assert "turn_idx" in stats and "ts" in stats
    assert "conv_id" not in stats  # strings never prune under hash routing
    part0 = lake.read_partition(0)
    assert stats["turn_idx"] == [0, int(pd.Series(part0.column("turn_idx").to_pylist()).max())]
    lo, hi = stats["ts"]
    got = pd.Series(part0.column("ts").to_pandas()).astype("datetime64[us]")
    assert lo == got.min().value // 1000 and hi == got.max().value // 1000


def test_all_null_and_empty_columns_skip_stats():
    t = pa.table(
        {
            "a": pa.array([None, None], pa.int64()),
            "b": pa.array([1, 2], pa.int64()),
        }
    )
    assert _column_stats(t) == {"b": [1, 2]}
    assert _column_stats(t.slice(0, 0)) == {}


def test_scan_plan_prunes_correlated_layout(ray_session, tmp_path):
    # each partition's ts block is disjoint (shift 10^4 hours apart)
    root, base = _routed_lake(tmp_path, ts_shift_per_pid=10_000)
    lake = TranscriptLake(root)
    s2 = lake.manifest(2).files[0]["stats"]["ts"]
    kept = lake.scan_plan("ts", s2[0], s2[1])
    assert kept == [2]
    got = lake.scan(
        "ts",
        s2[0],
        s2[1],
        columns=["conv_id", "turn_idx", "text"],
    ).to_pandas()
    exp = lake.read_partition(2).to_pandas()[["conv_id", "turn_idx", "text"]]
    pd.testing.assert_frame_equal(
        got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )


def test_scan_residual_filter_matches_full_read(ray_session, tmp_path):
    root, base = _routed_lake(tmp_path)
    lake = TranscriptLake(root)
    ts = pd.Series(base.column("ts").to_pandas()).astype("datetime64[us]")
    lo = ts.quantile(0.3).to_pydatetime()
    hi = ts.quantile(0.7).to_pydatetime()
    got = lake.scan("ts", lo, hi, columns=["conv_id", "turn_idx", "ts"]).to_pandas()
    full = lake.read_all().to_pandas()
    full["ts"] = full["ts"].astype("datetime64[us]")
    exp = full[(full.ts >= lo) & (full.ts <= hi)][["conv_id", "turn_idx", "ts"]]
    got["ts"] = got["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )
    assert len(got) > 0


def test_scan_conservative_without_stats(ray_session, tmp_path):
    root, _ = _routed_lake(tmp_path, ts_shift_per_pid=10_000)
    lake = TranscriptLake(root)
    # simulate an old-writer manifest entry with no stats on pid 3
    m = lake.manifest(3)
    m.files[0].pop("stats")
    m.save(lake._manifest_path(3))
    s2 = lake.manifest(2).files[0]["stats"]["ts"]
    assert lake.scan_plan("ts", s2[0], s2[1]) == [2, 3]


def test_lookup_reads_only_owning_partitions(ray_session, tmp_path):
    root, base = _routed_lake(tmp_path)
    lake = TranscriptLake(root)
    keys = ["conv-000003", "conv-000017", "conv-000042"]
    plan = lake.lookup_plan(keys)
    want = sorted(set(partition_ids(pa.array(keys), N_PARTS).tolist()))
    assert plan == want and len(plan) <= len(keys) < N_PARTS * 2
    got = lake.lookup(keys, columns=["conv_id", "turn_idx", "text"]).to_pandas()
    full = lake.read_all().to_pandas()
    exp = full[full.conv_id.isin(keys)][["conv_id", "turn_idx", "text"]]
    pd.testing.assert_frame_equal(
        got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )


def _sorted_state(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _replay(root: str, changes: pa.Table, **kw):
    import ray.data

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
        replay_into_lake,
    )

    replay_into_lake(root, ray.data.from_arrow(changes), validate_sample=None, **kw)


def test_snapshot_time_travel_and_vacuum_retention(ray_session, tmp_path):
    root, base = _routed_lake(tmp_path)
    c1 = generate_changes(800, n_convs=60, start_lsn=1, delete_frac=0.15, seed=7)
    _replay(root, c1)
    lake = TranscriptLake(root)
    expected_snap = _sorted_state(lake.read_all().to_pandas())
    sid = lake.snapshot(note="after-c1")
    assert lake.snapshots()[-1]["id"] == sid

    c2 = generate_changes(800, n_convs=60, start_lsn=2_000, delete_frac=0.15, seed=8)
    _replay(root, c2)  # copy-on-write rewrites every touched partition
    removed = lake.vacuum()
    # nothing the snapshot references may be reclaimed
    snap_df = _sorted_state(
        lake.dataset(snapshot=sid).to_pandas()
    )
    pd.testing.assert_frame_equal(snap_df, expected_snap)
    # current state moved on
    cur = _sorted_state(lake.read_all().to_pandas())
    assert not cur.equals(expected_snap)

    # dropping the snapshot releases its files to vacuum
    lake.drop_snapshot(sid)
    removed2 = lake.vacuum()
    assert removed2, "stale pre-c2 files should be reclaimed after drop"
    with pytest.raises(FileNotFoundError):
        lake.dataset(snapshot=sid)


def test_snapshot_survives_compaction_of_delta_runs(ray_session, tmp_path):
    root, base = _routed_lake(tmp_path)
    c1 = generate_changes(500, n_convs=60, start_lsn=1, seed=3)
    _replay(root, c1, mode="delta", compact_after=0)
    lake = TranscriptLake(root)
    assert any(lake.run_count(p) > 1 for p in range(N_PARTS))
    expected = _sorted_state(lake.read_all().to_pandas())
    sid = lake.snapshot(note="with-delta-runs")
    for p in range(N_PARTS):
        lake.compact_partition(p)
    lake.vacuum()
    got = _sorted_state(lake.dataset(snapshot=sid).to_pandas())
    pd.testing.assert_frame_equal(got, expected)


def test_snapshot_survives_rescale(ray_session, tmp_path):
    root, base = _routed_lake(tmp_path)
    lake = TranscriptLake(root)
    expected = _sorted_state(lake.read_all().to_pandas())
    sid = lake.snapshot(note="pre-rescale")
    lake.split_partitions(2, parallel=False)  # 4 → 8, generation 2
    lake.vacuum()
    lake = TranscriptLake(root)
    assert lake.num_partitions == 2 * N_PARTS
    got = _sorted_state(lake.dataset(snapshot=sid).to_pandas())
    pd.testing.assert_frame_equal(got, expected)
    # current layout reads the same rows through the new partitions
    cur = _sorted_state(lake.read_all().to_pandas())
    pd.testing.assert_frame_equal(cur, expected)


# -- per-run primary-key Bloom filters (LSM read path) ----------------


def test_lookup_plan_prunes_absent_keys_via_bloom(ray_session, tmp_path):
    root, base = _routed_lake(tmp_path)
    lake = TranscriptLake(root)
    assert all(
        "pk_bloom" in f for p in range(N_PARTS) for f in lake.manifest(p).files
    )
    # absent keys: every routed partition's blooms reject -> nothing read
    absent = [f"conv-nope-{i}" for i in range(40)]
    assert lake.lookup_plan(absent) == []
    assert lake.lookup(absent).count() == 0
    # no false negatives: every present conv's owner stays in the plan
    present = sorted(set(base.column("conv_id").to_pylist()))
    plan = lake.lookup_plan(present)
    owners = sorted(set(partition_ids(pa.array(present), N_PARTS).tolist()))
    assert plan == owners


def test_lookup_plan_conservative_without_bloom(ray_session, tmp_path):
    root, base = _routed_lake(tmp_path)
    lake = TranscriptLake(root)
    # simulate an old-writer run with no bloom on one partition
    m = lake.manifest(1)
    m.files[0].pop("pk_bloom")
    m.save(lake._manifest_path(1))
    absent = [f"conv-nope-{i}" for i in range(40)]
    plan = lake.lookup_plan(absent)
    routed = set(partition_ids(pa.array(absent), N_PARTS).tolist())
    assert plan == ([1] if 1 in routed else [])


def test_bloom_survives_delta_runs_and_compaction(ray_session, tmp_path):
    root, base = _routed_lake(tmp_path)
    c1 = generate_changes(400, n_convs=60, start_lsn=1, seed=5)
    _replay(root, c1, mode="delta", compact_after=0)
    lake = TranscriptLake(root)
    # delta runs carry blooms too
    assert all(
        "pk_bloom" in f
        for p in range(N_PARTS)
        for f in lake.manifest(p).files
    )
    for p in range(N_PARTS):
        lake.compact_partition(p)
    lake = TranscriptLake(root)
    assert lake.lookup_plan([f"conv-nope-{i}" for i in range(40)]) == []
    some = lake.read_partition(0).column("conv_id")[0].as_py()
    assert lake.lookup_plan([some]) != []
