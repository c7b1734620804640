"""Online partition rescale (split / coalesce) — the generation-flip
protocol in state/lake.py.

Contract under test: a rescale never changes the visible row set,
never regresses a watermark, stays exactly-once for replays resumed
at the new layout, is crash-safe (readers mid-rescale see the old
generation, a re-run resumes), and vacuum reclaims every stale
generation's file.
"""

import json
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
from cityofphiladelphia_databridge_etl_tools_ray.state.fs import storage_for
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import (
    TranscriptLake,
    _split_parent,
)


def _put_intent(root: str, obj: dict) -> None:
    """Write a rescale intent through the root's storage backend."""
    st, phys = storage_for(root)
    st.put_json(st.join(phys, f"rescale-g{obj['generation']}.json"), obj)


def state_df(root: str) -> pd.DataFrame:
    df = TranscriptLake(root).read_all().to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def assert_text_equal(got: pd.DataFrame, exp: pd.DataFrame):
    exp = exp.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)


@pytest.fixture(params=["", "norename://"], ids=["posix", "objectstore"])
def seeded_lake(request, tmp_path):
    base = generate_base(n_convs=60, max_turns=15)
    root = request.param + str(tmp_path / "lake")
    lake = TranscriptLake.create(root, num_partitions=8)
    pids = partition_ids(base.column("conv_id"), 8)
    for pid in range(8):
        lake.commit_partition(pid, base.filter(pa.array(pids == pid)), high_lsn=-1)
    return root, base


def test_split_round_trip_preserves_state(ray_session, seeded_lake, tmp_path):
    root, base = seeded_lake
    changes = generate_changes(4000, n_convs=70, delete_frac=0.1, dup_frac=0.05)
    write_change_log(changes, str(tmp_path / "wal"), n_files=4)
    replay_into_lake(root, read_change_log(str(tmp_path / "wal")))
    before = state_df(root)
    wm_before = TranscriptLake(root).watermarks()

    lake = TranscriptLake(root)
    res = lake.split_partitions(2)
    assert res == {"num_partitions": 16, "generation": 2, "rows": len(before)}

    fresh = TranscriptLake(root)
    assert fresh.num_partitions == 16 and fresh.generation == 2
    assert_text_equal(state_df(root), before)
    # children inherit the parent watermark exactly
    wm = fresh.watermarks()
    for p in range(8):
        assert wm[p] == wm_before[p] and wm[p + 8] == wm_before[p]
    # routing invariant: every child holds only rows that hash to it
    for p in range(16):
        t = fresh.read_partition(p)
        if len(t):
            assert np.all(partition_ids(t.column("conv_id"), 16) == p)

    # coalesce back restores the original layout and state
    fresh.coalesce_partitions(2)
    again = TranscriptLake(root)
    assert again.num_partitions == 8 and again.generation == 3
    assert_text_equal(state_df(root), before)
    assert again.watermarks() == wm_before


def test_reader_mid_split_sees_old_generation(ray_session, seeded_lake):
    """A crash between child commits and the lake.json flip leaves
    every reader on the old generation, fully consistent; re-running
    the split resumes (already-split parents are skipped) and
    converges."""
    root, base = seeded_lake
    before = state_df(root)

    # simulate: half the parents split, then crash (no metadata flip)
    for p in range(4):
        _split_parent(root, p, 2, next_gen=2)
    mid = TranscriptLake(root)
    assert mid.num_partitions == 8 and mid.generation == 1
    assert_text_equal(state_df(root), before)  # old-gen view intact

    done = TranscriptLake(root).split_partitions(2)
    assert done["num_partitions"] == 16
    assert_text_equal(state_df(root), before)
    # resumed parents were not re-written: each child has exactly one
    # data file and one split lineage record
    fresh = TranscriptLake(root)
    for c in range(16):
        m = fresh.manifest(c)
        assert len(m.files) == 1
        assert m.lineage[-1]["op"] == "split"


def test_replay_across_split_exactly_once(ray_session, seeded_lake, tmp_path):
    """Replay half the WAL, split 8→16 online, then replay the WHOLE
    WAL (overlapping range) at the new layout: the below-watermark
    half must be a no-op and the final state must equal the sequential
    oracle — exactly-once across a rescale."""
    root, base = seeded_lake
    changes = generate_changes(5000, n_convs=70, delete_frac=0.12, hot_frac=0.2)
    lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
    first = changes.filter(pa.array(lsn <= 2500))
    write_change_log(first, str(tmp_path / "wal1"), n_files=3)
    write_change_log(changes, str(tmp_path / "wal_all"), n_files=5)

    replay_into_lake(root, read_change_log(str(tmp_path / "wal1")))
    TranscriptLake(root).split_partitions(2)
    replay_into_lake(root, read_change_log(str(tmp_path / "wal_all")))

    exp = apply_changes_reference(base, changes)
    assert_text_equal(state_df(root), exp)
    assert TranscriptLake(root).metrics()["max_watermark"] == 4999


def test_coalesce_unequal_watermarks_converges(ray_session, seeded_lake, tmp_path):
    """Coalescing parents whose watermarks differ takes the MIN, so
    the (min, max] window is re-delivered on the next replay; LWW
    idempotence makes that re-application converge to the oracle."""
    root, base = seeded_lake
    changes = generate_changes(4000, n_convs=70, delete_frac=0.1)
    lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
    write_change_log(changes.filter(pa.array(lsn <= 3000)), str(tmp_path / "w1"), n_files=3)
    write_change_log(changes.filter(pa.array(lsn > 3000)), str(tmp_path / "w2"), n_files=2)

    replay_into_lake(root, read_change_log(str(tmp_path / "w1")))
    # lag partition 0 behind: rewind its manifest to the pre-replay
    # base state (watermark -1) — a partition that missed the replay
    lake = TranscriptLake(root)
    pids = partition_ids(base.column("conv_id"), 8)
    lake.commit_partition(0, base.filter(pa.array(pids == 0)), high_lsn=-1)

    lake.coalesce_partitions(2)  # children take min(parent watermarks)
    merged = TranscriptLake(root)
    assert merged.num_partitions == 4
    assert merged.watermark(0) == -1  # min(-1, 3000)

    # the follow-up replay re-delivers everything the lagging parent
    # missed (and re-applies the half partition 4 already had)
    write_change_log(changes, str(tmp_path / "w_all"), n_files=4)
    replay_into_lake(root, read_change_log(str(tmp_path / "w_all")))
    exp = apply_changes_reference(base, changes)
    assert_text_equal(state_df(root), exp)


def test_split_factor4_equals_double_split(ray_session, tmp_path):
    base = generate_base(n_convs=50, max_turns=10)

    def build(root):
        lake = TranscriptLake.create(root, num_partitions=4)
        pids = partition_ids(base.column("conv_id"), 4)
        for pid in range(4):
            lake.commit_partition(pid, base.filter(pa.array(pids == pid)), high_lsn=7)
        return lake

    a = build(str(tmp_path / "a"))
    a.split_partitions(4)
    b = build(str(tmp_path / "b"))
    b.split_partitions(2)
    TranscriptLake(b.root).split_partitions(2)

    fa, fb = TranscriptLake(a.root), TranscriptLake(b.root)
    assert fa.num_partitions == fb.num_partitions == 16
    assert fa.generation == 2 and fb.generation == 3
    for p in range(16):
        ta = fa.read_partition(p).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        tb = fb.read_partition(p).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        assert ta.equals(tb)
        assert fa.watermark(p) == fb.watermark(p) == 7


def test_vacuum_reclaims_stale_generations(ray_session, seeded_lake):
    root, _ = seeded_lake
    before = state_df(root)
    TranscriptLake(root).split_partitions(2)
    TranscriptLake(root).coalesce_partitions(4)  # 16 → 4
    lake = TranscriptLake(root)
    removed = lake.vacuum()
    assert removed  # stale gen-1/2 manifests + their data files
    # beyond-range dirs (part-00004..15) are gone
    dirs = sorted(d for d in lake.store.list_subdirs(lake.phys) if d.startswith("part-"))
    assert dirs == [f"part-{p:05d}" for p in range(4)]
    # only the current generation's manifest pointer remains per dir
    for d in dirs:
        pdir = lake.store.join(lake.phys, d)
        manifests = [
            n for n in lake.store.list_pointers(pdir) if n.startswith("manifest")
        ]
        assert manifests == ["manifest-g3.json"]
    assert_text_equal(state_df(root), before)
    # vacuum is idempotent and the lake still reads clean
    assert lake.vacuum() == []


def test_split_preserves_empty_and_fully_deleted_parents(ray_session, tmp_path):
    """A parent whose rows were all deleted still has a watermark;
    its children must carry it (else a replay at the new layout would
    resurrect deleted keys by re-reading below the watermark)."""
    base = generate_base(n_convs=20, max_turns=5)
    root = str(tmp_path / "lake")
    lake = TranscriptLake.create(root, num_partitions=4)
    pids = partition_ids(base.column("conv_id"), 4)
    lake.commit_partition(0, base.filter(pa.array(pids == 0)), high_lsn=50)
    # partition 1: fully deleted state (empty table, real watermark)
    lake.commit_partition(1, base.schema.empty_table(), high_lsn=60)
    # partitions 2, 3: never written

    lake.split_partitions(2)
    fresh = TranscriptLake(root)
    assert fresh.watermark(1) == 60 and fresh.watermark(5) == 60
    assert len(fresh.read_partition(1)) == 0 and len(fresh.read_partition(5)) == 0
    assert fresh.watermark(0) == 50 and fresh.watermark(4) == 50
    # never-written parents produce never-written children
    assert fresh.manifest(2) is None and fresh.manifest(6) is None


def test_conflicting_inflight_rescale_rejected(ray_session, seeded_lake):
    root, _ = seeded_lake
    # leave a conflicting intent for generation 2
    _put_intent(root, {"from": 8, "to": 32, "generation": 2})
    with pytest.raises(RuntimeError, match="conflicting in-progress rescale"):
        TranscriptLake(root).split_partitions(2)


def test_vacuum_preserves_inflight_rescale_progress(ray_session, seeded_lake):
    """Vacuuming between a crashed split and its resume must NOT
    destroy the next-generation manifests or their data files — the
    resume still skips already-split parents."""
    root, _ = seeded_lake
    before = state_df(root)
    lake = TranscriptLake(root)
    # intent on disk + half the parents split = a crashed split
    _put_intent(root, {"from": 8, "to": 16, "generation": 2})
    for p in range(4):
        _split_parent(root, p, 2, next_gen=2)
    child_files = {
        c: TranscriptLake(root)._manifest_path(c, 2) for c in [0, 8, 1, 9]
    }
    removed = lake.vacuum()
    for path in child_files.values():
        assert lake.store.pointer_exists(path), (
            f"vacuum deleted in-flight manifest {path}"
        )
    assert not any("manifest-g2" in r for r in removed)
    # resume completes and the already-split parents were not redone
    res = TranscriptLake(root).split_partitions(2)
    assert res["num_partitions"] == 16
    assert_text_equal(state_df(root), before)


def test_abort_rescale_discards_progress(ray_session, seeded_lake):
    root, _ = seeded_lake
    before = state_df(root)
    _put_intent(root, {"from": 8, "to": 16, "generation": 2})
    for p in range(3):
        _split_parent(root, p, 2, next_gen=2)
    lake = TranscriptLake(root)
    # a DIFFERENT rescale is rejected while the intent exists
    with pytest.raises(RuntimeError, match="abort_rescale"):
        lake.coalesce_partitions(2)
    removed = lake.abort_rescale()
    assert any("manifest-g2" in r for r in removed) and any(
        "rescale-g2" in r for r in removed
    )
    lake.vacuum()  # orphaned child data files reclaimed
    assert_text_equal(state_df(root), before)
    # and the other rescale can now proceed
    res = TranscriptLake(root).coalesce_partitions(2)
    assert res["num_partitions"] == 4
    assert_text_equal(state_df(root), before)
    # no-op when nothing is in flight
    assert TranscriptLake(root).abort_rescale() == []


def test_replay_rejected_during_inflight_rescale(ray_session, seeded_lake, tmp_path):
    """Writers must not race a rescale (a commit landing after a
    parent was split would be dropped by the flip): replay raises a
    clear error while the intent exists and works after abort."""
    root, _ = seeded_lake
    _put_intent(root, {"from": 8, "to": 16, "generation": 2})
    changes = generate_changes(500, n_convs=30)
    write_change_log(changes, str(tmp_path / "wal"), n_files=2)
    with pytest.raises(RuntimeError, match="rescale to generation 2 in progress"):
        replay_into_lake(root, read_change_log(str(tmp_path / "wal")))
    TranscriptLake(root).abort_rescale()
    replay_into_lake(root, read_change_log(str(tmp_path / "wal")))  # now fine


def test_split_reverifies_stale_children_before_flip(ray_session, seeded_lake):
    """Children written from an older parent snapshot (watermark
    mismatch) are re-split before the metadata flip — the pre-flip
    verification pass."""
    root, base = seeded_lake
    # stale children of parent 0 at watermark -1
    for p in range(8):
        _split_parent(root, p, 2, next_gen=2)
    # parent 0 advances afterwards (simulating a writer that raced)
    lake = TranscriptLake(root)
    pids = partition_ids(base.column("conv_id"), 8)
    part0 = base.filter(pa.array(pids == 0))
    new_row = part0.slice(0, 1).set_column(
        part0.schema.get_field_index("text"), "text", pa.array(["RACED"])
    )
    lake.commit_partition(0, pa.concat_tables([part0.slice(1), new_row]), high_lsn=99)

    TranscriptLake(root).split_partitions(2)
    fresh = TranscriptLake(root)
    # children of parent 0 carry the advanced watermark and the new row
    assert fresh.watermark(0) == 99 and fresh.watermark(8) == 99
    texts = pa.concat_tables(
        [fresh.read_partition(0), fresh.read_partition(8)]
    ).column("text").to_pylist()
    assert "RACED" in texts
