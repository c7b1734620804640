"""End-to-end replay pipeline tests (Ray session from conftest).

Covers the north_rule contract: full-replay equality vs the
sequential oracle, exactly-once resume, crash recovery, schema
evolution through the pipeline, lineage metrics.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    apply_changes_reference,
    generate_base,
    generate_changes,
    write_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
    replay_into_lake,
    replay_to_table,
)
from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import (
    prune_files_by_lsn,
    read_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake


def lake_state(lake: TranscriptLake) -> pd.DataFrame:
    df = lake.read_all().to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def assert_text_equal(got: pd.DataFrame, exp: pd.DataFrame):
    exp = exp.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)


@pytest.fixture
def lake_with_base(tmp_path):
    base = generate_base(n_convs=60, max_turns=15)
    lake = TranscriptLake.create(str(tmp_path / "lake"), num_partitions=8)
    # seed the lake via the commit path (full load = truncate-and-swap)
    from cityofphiladelphia_databridge_etl_tools_ray.functions.hashing import partition_ids

    pids = partition_ids(base.column("conv_id"), 8)
    for pid in range(8):
        part = base.filter(pa.array(pids == pid))
        lake.commit_partition(pid, part, high_lsn=-1)
    return lake, base


def test_replay_into_lake_matches_oracle(ray_session, lake_with_base, tmp_path):
    lake, base = lake_with_base
    changes = generate_changes(8000, n_convs=80, delete_frac=0.15, dup_frac=0.05, hot_frac=0.2)
    log_dir = str(tmp_path / "wal")
    write_change_log(changes, log_dir, n_files=6)

    metrics = replay_into_lake(lake.root, read_change_log(log_dir))
    assert metrics["events_applied"].sum() > 0

    exp = apply_changes_reference(base, changes)
    assert_text_equal(lake_state(lake), exp)

    # lineage/metrics exposed per partition
    m = lake.metrics()
    assert m["row_count"] == len(exp)
    assert m["max_watermark"] == 7999


def test_replay_mixed_format_wal(ray_session, lake_with_base, tmp_path):
    """One WAL directory carrying parquet + Arrow-IPC + gzip-CSV +
    gzip-JSONL segments (disjoint lsn quarters) replays to the same
    state as the sequential oracle — the four decode paths union into
    one stream with identical Arrow types (schema-driven CSV parse,
    explicit-schema JSON parse)."""
    lake, base = lake_with_base
    changes = generate_changes(6000, n_convs=80, delete_frac=0.1, dup_frac=0.05)
    log_dir = str(tmp_path / "wal")
    lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
    quarters = [
        changes.filter(pa.array(lsn % 4 == r)) for r in range(4)
    ]
    write_change_log(quarters[0], log_dir, n_files=2, format="parquet")
    write_change_log(quarters[1], log_dir, n_files=2, format="ipc")
    write_change_log(quarters[2], log_dir, n_files=2, format="csv")
    write_change_log(quarters[3], log_dir, n_files=2, format="jsonl")

    replay_into_lake(lake.root, read_change_log(log_dir))
    exp = apply_changes_reference(base, changes)
    assert_text_equal(lake_state(lake), exp)


def test_replay_exactly_once_resume(ray_session, lake_with_base, tmp_path):
    """Replaying the same WAL range twice is a no-op (SCN-watermark
    semantics, reference db2/db2.py:596-655)."""
    lake, base = lake_with_base
    changes = generate_changes(3000, n_convs=70, delete_frac=0.1)
    log_dir = str(tmp_path / "wal")
    write_change_log(changes, log_dir, n_files=4)

    replay_into_lake(lake.root, read_change_log(log_dir))
    state1 = lake_state(lake)
    wm1 = lake.watermarks()

    # second replay of the identical range: all events ≤ watermark
    metrics2 = replay_into_lake(
        lake.root, read_change_log(log_dir, min_lsn_exclusive=lake.min_watermark())
    )
    assert metrics2.empty or metrics2["events_applied"].sum() == 0
    pd.testing.assert_frame_equal(lake_state(lake), state1)
    assert lake.watermarks() == wm1


def test_replay_incremental_batches(ray_session, lake_with_base, tmp_path):
    """Tail the log in two increments; final state == one-shot."""
    lake, base = lake_with_base
    ch1 = generate_changes(2000, n_convs=70, seed=1)
    ch2 = generate_changes(2000, n_convs=70, start_lsn=2000, seed=2)
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    write_change_log(ch1, d1, n_files=3)
    write_change_log(ch2, d2, n_files=3)

    replay_into_lake(lake.root, read_change_log(d1))
    replay_into_lake(lake.root, read_change_log(d2))

    exp = apply_changes_reference(base, pa.concat_tables([ch1, ch2]))
    assert_text_equal(lake_state(lake), exp)


def test_crash_between_data_and_manifest_recovers(ray_session, lake_with_base, tmp_path):
    """Orphan data files (crash before manifest replace) are invisible
    and a rerun converges (FIXTURES.md §4)."""
    lake, base = lake_with_base
    changes = generate_changes(1000, n_convs=50)
    log_dir = str(tmp_path / "wal")
    write_change_log(changes, log_dir, n_files=2)

    # simulate a crashed task: orphan data file, no manifest update
    pdir = lake.part_dir(3)
    os.makedirs(pdir, exist_ok=True)
    with open(os.path.join(pdir, "data-999999-deadbeef.parquet"), "wb") as f:
        f.write(b"partial garbage")

    replay_into_lake(lake.root, read_change_log(log_dir))
    exp = apply_changes_reference(base, changes)
    assert_text_equal(lake_state(lake), exp)

    removed = lake.vacuum()
    assert any("deadbeef" in r for r in removed)
    assert_text_equal(lake_state(lake), exp)  # vacuum touches only orphans


def test_replay_to_table_no_base(ray_session):
    changes = generate_changes(4000, n_convs=50, delete_frac=0.2, dup_frac=0.1)
    import ray.data

    out = replay_to_table(ray.data.from_arrow(changes), num_partitions=6)
    got = out.to_pandas().sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    exp = apply_changes_reference(None, changes)
    assert_text_equal(got, exp)


def test_schema_evolution_through_pipeline(ray_session, lake_with_base, tmp_path):
    """Late WAL files carry an extra column + widened turn_idx and a
    renamed column handled by the rename map
    (reference --column_mappings, postgres/postgres.py:203-228)."""
    lake, base = lake_with_base
    ch = generate_changes(500, n_convs=40)
    ch = ch.set_column(
        ch.column_names.index("turn_idx"),
        pa.field("turn_idx", pa.int64()),
        ch.column("turn_idx").cast(pa.int64()),
    )
    ch = ch.append_column("meta", pa.array(["m"] * len(ch), pa.string()))
    ch = ch.rename_columns([{"text": "message"}.get(c, c) for c in ch.column_names])
    log_dir = str(tmp_path / "wal")
    write_change_log(ch, log_dir, n_files=2)

    replay_into_lake(lake.root, read_change_log(log_dir), rename_map={"message": "text"})
    df = lake_state(lake)
    assert "meta" in df.columns
    exp = apply_changes_reference(
        base, ch.rename_columns([{"message": "text"}.get(c, c) for c in ch.column_names])
    )
    assert len(df) == len(exp)
    pd.testing.assert_series_equal(df["text"], exp["text"], check_names=False)


def test_prune_files_by_lsn():
    paths = [
        "wal/changes-00000-lsn-0-100.parquet",
        "wal/changes-00001-lsn-100-200.parquet",
        "wal/other.parquet",
    ]
    assert prune_files_by_lsn(paths, 99) == paths[1:]
    assert prune_files_by_lsn(paths, 98) == paths
    assert prune_files_by_lsn(paths, 500) == ["wal/other.parquet"]
    # IPC segments prune by the same filename convention
    ipc = ["wal/changes-00000-lsn-0-100.arrow", "wal/changes-00001-lsn-100-200.arrow"]
    assert prune_files_by_lsn(ipc, 99) == ipc[1:]


def test_ipc_wal_roundtrip(ray_session, tmp_path):
    """Arrow-IPC WAL segments (the tail-optimized format) round-trip
    through write_change_log/read_change_log identically to parquet:
    same rows, same schema, same watermark pruning, same replay
    result."""
    changes = generate_changes(3000, n_convs=60, delete_frac=0.1, seed=9)
    d_pq, d_ipc = str(tmp_path / "pq"), str(tmp_path / "ipc")
    p1 = write_change_log(changes, d_pq, n_files=4)
    p2 = write_change_log(changes, d_ipc, n_files=4, format="ipc")
    assert [os.path.basename(p).replace(".arrow", ".parquet") for p in p2] == [
        os.path.basename(p) for p in p1
    ]

    a = read_change_log(d_pq).to_pandas().sort_values(["lsn"]).reset_index(drop=True)
    b = read_change_log(d_ipc).to_pandas().sort_values(["lsn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # watermark filter: file-level pruning + post-decode row filter
    half = read_change_log(d_ipc, min_lsn_exclusive=1500).to_pandas()
    assert half["lsn"].min() == 1501 and len(half) == 1498 + 1

    # replay from IPC segments == replay from parquet segments
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_to_table

    ra = replay_to_table(read_change_log(d_pq), num_partitions=4).to_pandas()
    rb = replay_to_table(read_change_log(d_ipc), num_partitions=4).to_pandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        ra.sort_values(key).reset_index(drop=True),
        rb.sort_values(key).reset_index(drop=True),
    )


def test_invalid_op_raises(ray_session, tmp_path):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import ChangeNormalizer

    ch = generate_changes(10, n_convs=5)
    bad = ch.set_column(0, "op", pa.array(["bogus"] * len(ch)))
    with pytest.raises(ValueError, match="invalid op"):
        ChangeNormalizer(4)(bad)
    # drop mode routes them out instead
    out = ChangeNormalizer(4, invalid_ops="drop")(bad)
    assert len(out) == 0


# -- delta commits / merge-on-read / compaction ----------------------


def test_delta_incremental_matches_oracle(ray_session, lake_with_base, tmp_path):
    """Three incremental delta tails == sequential replay of all
    events (merge-on-read resolution)."""
    lake, base = lake_with_base
    all_changes = []
    for i in range(3):
        changes = generate_changes(
            2000, n_convs=80, delete_frac=0.15, dup_frac=0.05,
            start_lsn=i * 2000, seed=100 + i,
        )
        all_changes.append(changes)
        wal = tmp_path / f"wal{i}"
        write_change_log(changes, str(wal), n_files=2)
        replay_into_lake(lake.root, read_change_log(str(wal)), mode="delta", compact_after=0)
    assert any(lake.run_count(p) > 1 for p in range(lake.num_partitions))
    expected = apply_changes_reference(base, pa.concat_tables(all_changes))
    assert_text_equal(lake_state(lake), expected)


def test_delta_compaction_preserves_state_and_vacuum(ray_session, lake_with_base, tmp_path):
    lake, base = lake_with_base
    changes = generate_changes(3000, n_convs=80, delete_frac=0.2, seed=31)
    wal = tmp_path / "wal"
    write_change_log(changes, str(wal), n_files=2)
    replay_into_lake(lake.root, read_change_log(str(wal)), mode="delta", compact_after=0)
    before = lake_state(lake)
    for p in range(lake.num_partitions):
        lake.compact_partition(p)
    assert all(lake.run_count(p) <= 1 for p in range(lake.num_partitions))
    removed = lake.vacuum()
    assert removed  # old run files became orphans
    pd.testing.assert_frame_equal(before, lake_state(lake))
    expected = apply_changes_reference(base, changes)
    assert_text_equal(lake_state(lake), expected)


def test_delta_mode_exactly_once_resume(ray_session, lake_with_base, tmp_path):
    """Replaying the same WAL twice in delta mode is a no-op the
    second time (watermark skip) — no duplicate runs."""
    lake, base = lake_with_base
    changes = generate_changes(2000, n_convs=80, seed=41)
    wal = tmp_path / "wal"
    write_change_log(changes, str(wal), n_files=2)
    replay_into_lake(lake.root, read_change_log(str(wal)), mode="delta")
    runs = [lake.run_count(p) for p in range(lake.num_partitions)]
    state1 = lake_state(lake)
    m = replay_into_lake(lake.root, read_change_log(str(wal)), mode="delta")
    assert m["events_applied"].sum() == 0
    assert [lake.run_count(p) for p in range(lake.num_partitions)] == runs
    pd.testing.assert_frame_equal(state1, lake_state(lake))


def test_delta_auto_compaction_triggers(ray_session, tmp_path):
    lake = TranscriptLake.create(str(tmp_path / "lake"), num_partitions=2)
    for i in range(4):
        changes = generate_changes(400, n_convs=10, start_lsn=i * 400, seed=50 + i)
        wal = tmp_path / f"w{i}"
        write_change_log(changes, str(wal), n_files=1)
        replay_into_lake(lake.root, read_change_log(str(wal)), mode="delta", compact_after=3)
    # compaction folded runs back under the threshold
    assert all(lake.run_count(p) <= 3 for p in range(lake.num_partitions))
    all_changes = pa.concat_tables(
        [generate_changes(400, n_convs=10, start_lsn=i * 400, seed=50 + i) for i in range(4)]
    )
    expected = apply_changes_reference(None, all_changes)
    assert_text_equal(lake_state(lake), expected)


def test_delta_dataset_resolves_merge_on_read(ray_session, lake_with_base, tmp_path):
    lake, base = lake_with_base
    changes = generate_changes(1500, n_convs=80, delete_frac=0.2, seed=61)
    wal = tmp_path / "wal"
    write_change_log(changes, str(wal), n_files=2)
    replay_into_lake(lake.root, read_change_log(str(wal)), mode="delta", compact_after=0)
    got = (
        lake.dataset()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    expected = apply_changes_reference(base, changes)
    assert_text_equal(got, expected)


# -- salted two-phase hot-key merge ----------------------------------


def test_salted_replay_equals_unsalted_and_oracle(ray_session, tmp_path):
    """80% of events on one conv_id: the salted two-phase merge must
    produce byte-identical state to the direct merge and the oracle."""
    changes = generate_changes(6000, n_convs=40, hot_frac=0.8, dup_frac=0.05,
                               delete_frac=0.15, seed=71)
    wal = tmp_path / "wal"
    write_change_log(changes, str(wal), n_files=3)
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_to_table

    def state(salt):
        df = replay_to_table(read_change_log(str(wal)), num_partitions=8, salt=salt).to_pandas()
        return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)

    unsalted, salted = state(None), state(4)
    pd.testing.assert_frame_equal(unsalted, salted)
    assert_text_equal(salted, apply_changes_reference(None, changes))


def test_salted_replay_into_lake(ray_session, lake_with_base, tmp_path):
    lake, base = lake_with_base
    changes = generate_changes(4000, n_convs=80, hot_frac=0.6, delete_frac=0.1, seed=72)
    wal = tmp_path / "wal"
    write_change_log(changes, str(wal), n_files=2)
    replay_into_lake(lake.root, read_change_log(str(wal)), salt=4)
    expected = apply_changes_reference(base, changes)
    assert_text_equal(lake_state(lake), expected)


def test_merge_task_retry_is_idempotent(ray_session, lake_with_base, tmp_path):
    """A retried merge task (same group delivered twice — Ray task
    retry after a successful commit) must leave the partition
    unchanged: the watermark filter turns the second call into a
    no-op and the content-named data file is identical."""
    import pyarrow.compute as pc

    from cityofphiladelphia_databridge_etl_tools_ray.functions.hashing import partition_ids
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import PART_COL, _MergeCommit

    lake, base = lake_with_base
    changes = generate_changes(2000, n_convs=80, seed=91)
    pids = partition_ids(changes.column("conv_id"), 8)
    group = changes.filter(pa.array(pids == 3)).append_column(
        PART_COL, pa.array(np.full(int((pids == 3).sum()), 3, np.int32))
    )
    mc = _MergeCommit(lake.root)
    first = mc(group)
    state1 = lake_state(lake)
    files1 = sorted(os.listdir(lake.part_dir(3)))
    again = _MergeCommit(lake.root)(group)  # fresh instance = retried task
    assert again.column("events_applied")[0].as_py() == 0
    assert sorted(os.listdir(lake.part_dir(3))) == files1
    pd.testing.assert_frame_equal(state1, lake_state(lake))


def test_delta_schema_evolution_column_add(ray_session, lake_with_base, tmp_path):
    """A delta run carrying a new nullable column resolves against the
    old base (old rows null) and survives compaction."""
    lake, base = lake_with_base
    changes = generate_changes(1000, n_convs=80, seed=92)
    changes = changes.append_column(
        "meta", pa.array([f"m{i}" for i in range(len(changes))], pa.string())
    )
    wal = tmp_path / "wal"
    write_change_log(changes, str(wal), n_files=2)
    replay_into_lake(lake.root, read_change_log(str(wal)), mode="delta", compact_after=0)
    resolved = lake.read_all()
    assert "meta" in resolved.column_names
    df = resolved.to_pandas()
    assert df["meta"].notna().sum() > 0 and df["meta"].isna().sum() > 0
    for p in range(lake.num_partitions):
        lake.compact_partition(p)
    after = lake.read_all().to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )


def test_localize_naive_timestamps_mixed_inputs():
    """Naive cols are interpreted as US/Eastern wall time; aware cols
    convert to the same naive-UTC representation; DST-ambiguous times
    resolve 'earliest' (EDT); non-timestamp columns untouched.
    Reference behavior: oracle/oracle.py:197-221."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
        localize_naive_timestamps,
    )

    naive = pa.array(
        [
            pd.Timestamp("2024-01-15 12:00:00"),  # EST: UTC+5
            pd.Timestamp("2024-07-15 12:00:00"),  # EDT: UTC+4
            pd.Timestamp("2024-11-03 01:30:00"),  # ambiguous (fall back) → earliest=EDT
        ],
        pa.timestamp("us"),
    )
    aware = pa.Array.from_pandas(
        pd.Series([pd.Timestamp("2024-01-15 12:00:00", tz="US/Eastern")] * 3)
    ).cast(pa.timestamp("us", tz="US/Eastern"))
    t = pa.table({"ts": naive, "ts2": aware, "x": pa.array([1, 2, 3], pa.int64())})
    out = localize_naive_timestamps(t, "US/Eastern")
    assert out.schema.field("ts").type == pa.timestamp("us")
    assert out.schema.field("ts2").type == pa.timestamp("us")
    got = out.column("ts").to_pylist()
    assert got[0] == pd.Timestamp("2024-01-15 17:00:00")
    assert got[1] == pd.Timestamp("2024-07-15 16:00:00")
    assert got[2] == pd.Timestamp("2024-11-03 05:30:00")  # EDT (earliest)
    assert out.column("ts2").to_pylist() == [pd.Timestamp("2024-01-15 17:00:00")] * 3
    assert out.column("x").to_pylist() == [1, 2, 3]


def test_replay_with_assume_tz(ray_session):
    """End-to-end: replay_to_table(assume_tz=...) shifts the naive ts
    payload to UTC instants while leaving the merge result otherwise
    identical."""
    import ray.data
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_to_table

    changes = generate_changes(2000, n_convs=50, seed=17)
    plain = (
        replay_to_table(ray.data.from_arrow(changes), num_partitions=4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    tz = (
        replay_to_table(ray.data.from_arrow(changes), num_partitions=4, assume_tz="US/Eastern")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain.drop(columns=["ts"]), tz.drop(columns=["ts"]))
    # every shifted ts is the localized equivalent of the plain one
    shifted = plain["ts"].dt.tz_localize(
        "US/Eastern", ambiguous=True, nonexistent="shift_backward"
    ).dt.tz_convert("UTC").dt.tz_localize(None)
    pd.testing.assert_series_equal(tz["ts"], shifted, check_names=False)


def test_snapshot_mode_delete_stale(ray_session, lake_with_base):
    """mode='snapshot' mirrors the reference upsert's optional
    delete-stale (postgres/postgres.py:450-495): after the LWW upsert,
    base rows whose PK is absent from the snapshot are deleted.
    Replaying the same snapshot again is a watermark no-op
    (reference round-trip idempotence, tests/test_postgres.py:69-92)."""
    import ray.data

    lake, base = lake_with_base
    df = base.to_pandas()
    # snapshot: drop every turn_idx % 3 == 0 row, rewrite text on the rest
    snap = df[df["turn_idx"] % 3 != 0].copy()
    snap["text"] = "snap:" + snap["conv_id"] + ":" + snap["turn_idx"].astype(str)
    changes = pa.table(
        {
            "op": pa.array(["update"] * len(snap), pa.string()),
            "lsn": pa.array(np.arange(1000, 1000 + len(snap)), pa.int64()),
            "conv_id": pa.array(snap["conv_id"]),
            "turn_idx": pa.array(snap["turn_idx"].to_numpy(), pa.int32()),
            "role": pa.array(snap["role"]),
            "text": pa.array(snap["text"]),
            "tool": pa.array(snap["tool"]),
            "ts": pa.array(snap["ts"], pa.timestamp("us")),
        }
    )

    m = replay_into_lake(lake.root, ray.data.from_arrow(changes), mode="snapshot")
    assert m["events_applied"].sum() == len(snap)
    got = lake_state(lake)
    exp = snap.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    assert len(got) == len(exp)  # stale rows (turn_idx % 3 == 0) deleted
    pd.testing.assert_series_equal(got["text"], exp["text"].reset_index(drop=True), check_names=False)
    # lineage records the anti-join deletions
    deleted = sum(
        r.get("deleted_stale", 0)
        for p in range(lake.num_partitions)
        if (mp := lake.manifest(p))
        for r in mp.lineage
    )
    assert deleted == (df["turn_idx"] % 3 == 0).sum()

    # idempotence: replaying the identical snapshot is a no-op
    m2 = replay_into_lake(lake.root, ray.data.from_arrow(changes), mode="snapshot")
    assert m2["events_applied"].sum() == 0
    pd.testing.assert_frame_equal(got, lake_state(lake))


def test_snapshot_mode_truncates_unseen_partitions(ray_session, lake_with_base):
    """A full snapshot that carries ZERO rows for some hash partition
    means every key of that partition vanished upstream — the sweep
    after the per-group merge must truncate it (the table-wide reach
    of the reference's DELETE .. USING EXCEPT,
    postgres/postgres.py:450-495), and re-running must be a no-op."""
    import ray.data
    from cityofphiladelphia_databridge_etl_tools_ray.functions.hashing import partition_ids

    lake, base = lake_with_base
    pids = partition_ids(base.column("conv_id"), lake.num_partitions)
    dead = {0, 3}  # partitions whose every conversation was deleted upstream
    keep_mask = ~np.isin(pids, list(dead))
    snap = base.filter(pa.array(keep_mask))
    changes = pa.table(
        {
            "op": pa.array(["update"] * len(snap), pa.string()),
            "lsn": pa.array(np.arange(1000, 1000 + len(snap)), pa.int64()),
            "conv_id": snap.column("conv_id"),
            "turn_idx": snap.column("turn_idx"),
            "role": snap.column("role"),
            "text": snap.column("text"),
            "tool": snap.column("tool"),
            "ts": snap.column("ts").cast(pa.timestamp("us")),
        }
    )
    n_dead_rows = int((~keep_mask).sum())
    assert n_dead_rows > 0  # fixture must exercise the sweep

    m = replay_into_lake(lake.root, ray.data.from_arrow(changes), mode="snapshot")
    # sweep rows present in the metrics frame, one per truncated partition
    swept = m[m["events_applied"] == 0]
    assert set(swept["partition_id"]) == dead
    assert swept["row_count"].sum() == 0
    for pid in dead:
        assert len(lake.read_partition(pid)) == 0
        assert lake.watermark(pid) == m["watermark_after"].max()
    got = lake_state(lake)
    assert len(got) == len(snap)
    assert_text_equal(got, snap.to_pandas())

    # idempotence: same snapshot again → no events, no further sweeps
    m2 = replay_into_lake(lake.root, ray.data.from_arrow(changes), mode="snapshot")
    assert m2["events_applied"].sum() == 0
    assert not (m2[m2["partition_id"].isin(dead)]["row_count"] != 0).any()
    pd.testing.assert_frame_equal(got, lake_state(lake))


def test_sanity_gate_poisoned_wal_fails_fast(ray_session, lake_with_base):
    """The head-N pre-merge gate (reference ago/ago.py:516-551) kills a
    poisoned WAL before the shuffle: null PKs and bad op enums raise;
    a geometry-kind mismatch raises in the standalone validator."""
    import ray.data
    import pytest as _pytest
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
        validate_replay_sample,
    )

    lake, _ = lake_with_base
    good = generate_changes(200, n_convs=10, seed=5)

    # null conv_id in the head sample
    poisoned = good.set_column(
        good.column_names.index("conv_id"),
        "conv_id",
        pa.array([None] + good.column("conv_id").to_pylist()[1:], pa.string()),
    )
    with _pytest.raises(ValueError, match="null 'conv_id'"):
        replay_into_lake(lake.root, ray.data.from_arrow(poisoned))

    # bad op enum caught by the gate when invalid_ops='error'
    bad_op = good.set_column(
        good.column_names.index("op"),
        "op",
        pa.array(["upsert"] + good.column("op").to_pylist()[1:], pa.string()),
    )
    with _pytest.raises(ValueError, match="invalid op"):
        replay_into_lake(lake.root, ray.data.from_arrow(bad_op))

    # geometry-kind check (standalone): POINT declared, LINESTRING found
    geo = good.append_column(
        "shape", pa.array(["SRID=4326;LINESTRING(0 0, 1 1)"] * len(good))
    )
    with _pytest.raises(ValueError, match="geometry kind"):
        validate_replay_sample(
            ray.data.from_arrow(geo), geom_col="shape", expected_geom_kind="point"
        )
    # matching kind (incl. MULTI promotion) passes
    geo_ok = good.append_column("shape", pa.array(["MULTIPOINT((0 0))"] * len(good)))
    validate_replay_sample(
        ray.data.from_arrow(geo_ok), geom_col="shape", expected_geom_kind="point"
    )


def test_stream_change_log_matches_replay_semantics(ray_session, lake_with_base, tmp_path):
    """The bounded-memory streamed WAL writer replays to the same LWW
    semantics as the sequential oracle applied to the concatenated
    segment contents (each bucket is a valid change stream over its
    own lsn range)."""
    import pyarrow.parquet as pq
    from pyarrow import feather

    from cityofphiladelphia_databridge_etl_tools_ray.datagen import stream_change_log

    lake, base = lake_with_base
    log_dir = str(tmp_path / "wal")
    paths = stream_change_log(
        5000, log_dir, n_files=4, format="ipc", n_convs=80,
        delete_frac=0.1, dup_frac=0.05,
    )
    assert len(paths) == 4
    changes = pa.concat_tables([feather.read_table(p) for p in paths])
    assert len(changes) > 5000  # dup_frac must actually add rows (expect 5248)
    assert changes.column("lsn").to_pandas().nunique() == 5000
    replay_into_lake(lake.root, read_change_log(log_dir))
    exp = apply_changes_reference(base, changes)
    assert_text_equal(lake_state(lake), exp)
