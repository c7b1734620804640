"""Object-store lake backend (state/fs.py): the full commit protocol
driven exclusively through the pyarrow FileSystem API with rename
HARD-DISABLED (`norename://` — any ``move`` raises), proving the
versioned-pointer commit log can run the engine on storage where
``os.replace`` does not exist (S3/GCS-class).

The rescale / txn / follow suites are parameterized over this backend
too (test_lake_rescale / test_txn_replay / test_follow_wal); this
module covers the remaining protocol surface: replay-vs-reference,
delta mode + tiered compaction, exactly-once re-replay, snapshots +
time travel + vacuum retention, pruned point lookups / scans, fsck,
and commit-log version GC.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    apply_changes_reference,
    generate_changes,
)
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
    replay_into_lake,
)
from cityofphiladelphia_databridge_etl_tools_ray.state.fs import (
    NORENAME_SCHEME,
    storage_for,
)
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake


def _root(tmp_path, name="lake"):
    return NORENAME_SCHEME + str(tmp_path / name)


def _state(root):
    df = TranscriptLake(root).read_all().to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _expected(changes):
    df = apply_changes_reference(None, changes)
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def test_rename_is_actually_disabled(tmp_path):
    st, phys = storage_for(_root(tmp_path))
    with pytest.raises(NotImplementedError, match="rename/move is not available"):
        st.fs.move(str(tmp_path / "a"), str(tmp_path / "b"))


def test_replay_matches_reference_and_is_exactly_once(ray_session, tmp_path):
    root = _root(tmp_path)
    TranscriptLake.create(root, num_partitions=8)
    changes = generate_changes(2500, n_convs=60, delete_frac=0.1, seed=21)
    m1 = replay_into_lake(root, ray.data.from_arrow(changes), validate_sample=None)
    # events_applied counts post-combiner survivors (the pre-shuffle
    # LWW dedup collapses same-key churn) — positive on every partition
    assert (m1["events_applied"] > 0).all()
    got, exp = _state(root), _expected(changes)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)
    # re-replay of the same window is a watermark no-op
    m2 = replay_into_lake(root, ray.data.from_arrow(changes), validate_sample=None)
    assert int(m2["events_applied"].sum()) == 0
    # the streaming dataset() read agrees with read_all
    n = TranscriptLake(root).dataset(columns=["conv_id", "turn_idx"]).count()
    assert n == len(exp)


def test_delta_mode_fold_and_tiered_compaction(ray_session, tmp_path):
    root = _root(tmp_path)
    TranscriptLake.create(root, num_partitions=4)
    changes = generate_changes(2000, n_convs=40, delete_frac=0.15, seed=22)
    lsn = np.asarray(changes.column("lsn"))
    cuts = [0, 500, 1000, 1500, 2000]
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        part = changes.filter(pa.array((lsn >= lo) & (lsn < hi)))
        replay_into_lake(
            root,
            ray.data.from_arrow(part),
            mode="delta",
            compact_after=3,
            validate_sample=None,
        )
    got, exp = _state(root), _expected(changes)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)
    # explicit full compaction on the object backend
    lake = TranscriptLake(root)
    for p in range(lake.num_partitions):
        lake.compact_partition(p)
        assert lake.run_count(p) <= 1
    pd.testing.assert_series_equal(
        _state(root)["text"], exp["text"], check_names=False
    )


def test_snapshots_time_travel_and_vacuum_retention(ray_session, tmp_path):
    root = _root(tmp_path)
    TranscriptLake.create(root, num_partitions=4)
    changes = generate_changes(1500, n_convs=40, delete_frac=0.1, seed=23)
    lsn = np.asarray(changes.column("lsn"))
    first = changes.filter(pa.array(lsn < 700))
    replay_into_lake(root, ray.data.from_arrow(first), validate_sample=None)
    lake = TranscriptLake(root)
    sid = lake.snapshot(note="after-first")
    before = _state(root)

    replay_into_lake(root, ray.data.from_arrow(changes), validate_sample=None)
    after = _state(root)
    assert not after["text"].equals(before["text"])

    # vacuum keeps snapshot-referenced files; time travel still exact
    lake = TranscriptLake(root)
    lake.vacuum()
    snap_df = (
        lake.dataset(snapshot=sid)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(
        snap_df["text"], before["text"], check_names=False
    )
    # dropping the snapshot releases its files to the next vacuum
    lake.drop_snapshot(sid)
    removed = lake.vacuum()
    assert any("data-" in r for r in removed)
    pd.testing.assert_series_equal(_state(root)["text"], after["text"], check_names=False)


def test_lookup_scan_and_fsck(ray_session, tmp_path):
    root = _root(tmp_path)
    TranscriptLake.create(root, num_partitions=8)
    changes = generate_changes(1200, n_convs=50, delete_frac=0.0, seed=24)
    replay_into_lake(root, ray.data.from_arrow(changes), validate_sample=None)
    lake = TranscriptLake(root)
    exp = _expected(changes)

    conv = exp["conv_id"].iloc[0]
    pids = lake.lookup_plan([conv])
    assert len(pids) <= 2  # hash routing + blooms prune to the owners
    got = lake.lookup([conv]).to_pandas()
    assert set(got["conv_id"]) == {conv}
    assert len(got) == (exp["conv_id"] == conv).sum()
    # absent key: the blooms short-circuit to zero partitions (fp-rare)
    assert lake.lookup(["conv-zzzzzz"]).count() == 0

    scanned = lake.scan("turn_idx", 0, 1).to_pandas()
    assert len(scanned) == (exp["turn_idx"] <= 1).sum()

    audit = lake.fsck()
    assert audit["ok"], audit["errors"]
    assert audit["files_checked"] > 0


def test_pointer_commit_log_gc(ray_session, tmp_path):
    """Each commit appends a manifest version; vacuum keeps only the
    newest and the resolved state is unchanged."""
    root = _root(tmp_path)
    TranscriptLake.create(root, num_partitions=2)
    changes = generate_changes(600, n_convs=20, seed=25)
    lsn = np.asarray(changes.column("lsn"))
    for cut in (200, 400, 600):
        part = changes.filter(pa.array((lsn >= cut - 200) & (lsn < cut)))
        replay_into_lake(root, ray.data.from_arrow(part), validate_sample=None)
    lake = TranscriptLake(root)
    st = lake.store
    mp = lake._manifest_path(0)
    assert len(st._versions(mp)) >= 2  # one version per commit
    before = _state(root)
    lake.vacuum()
    assert len(st._versions(mp)) == 1  # GC'd to the newest
    pd.testing.assert_series_equal(
        _state(root)["text"], before["text"], check_names=False
    )


def test_wal_source_on_object_store_backend(ray_session, tmp_path):
    """The changelog source lists, prunes and decodes WAL segments
    through the storage backend: a norename:// WAL dir (mixed
    parquet + IPC segments) replays into a norename:// lake —
    the full multi-node path with no POSIX dependency."""
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import write_change_log
    from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import (
        read_change_log,
    )

    changes = generate_changes(1000, n_convs=30, delete_frac=0.1, seed=41)
    wal = tmp_path / "wal"
    lsn = np.asarray(changes.column("lsn"))
    write_change_log(changes.filter(pa.array(lsn < 500)), str(wal), n_files=2)
    write_change_log(
        changes.filter(pa.array(lsn >= 500)), str(wal), n_files=2, format="ipc"
    )
    obj_wal = NORENAME_SCHEME + str(wal)
    ds = read_change_log(obj_wal)
    assert ds.count() == 1000
    # watermark pruning by encoded filename still applies
    assert read_change_log(obj_wal, min_lsn_exclusive=499).count() == 500

    root = _root(tmp_path)
    TranscriptLake.create(root, num_partitions=4)
    replay_into_lake(root, read_change_log(obj_wal), validate_sample=None)
    got, exp = _state(root), _expected(changes)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)


def test_csv_latin1_encoding_fallback(ray_session, tmp_path):
    """The reference retries latin-1 when a CSV is not valid UTF-8
    (postgres/postgres.py:152-156): a WAL segment with latin-1 bytes
    decodes through the fallback instead of aborting the tail."""
    import gzip

    from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import (
        read_change_log,
    )

    wal = tmp_path / "wal_l1"
    wal.mkdir()
    rows = "op,lsn,conv_id,turn_idx,role,text,tool,ts\n" + "".join(
        f"insert,{i},c{i},0,user,caf\xe9 n\xba{i},,2024-01-01 00:00:0{i}\n"
        for i in range(3)
    )
    seg = wal / "changes-00000-lsn-0-3.csv.gz"
    with gzip.open(seg, "wb") as f:
        f.write(rows.encode("latin-1"))  # é / º are invalid UTF-8 solo bytes

    out = read_change_log(str(wal)).to_pandas().sort_values("lsn")
    assert out["text"].tolist() == ["café nº0", "café nº1", "café nº2"]
    # same through the object-store backend
    out2 = read_change_log(NORENAME_SCHEME + str(wal)).to_pandas().sort_values("lsn")
    assert out2["text"].tolist() == out["text"].tolist()


def test_pointer_log_concurrent_writer_semantics(tmp_path):
    """The documented single-writer contract's failure modes, pinned:
    (a) a RETRIED identical write re-PUTs the same sha-named object —
    version list unchanged (idempotent); (b) two DIFFERENT payloads
    racing the same version (forbidden by contract, possible before a
    conditional-put hardening) resolve deterministically — every
    reader sees the lexicographically-largest version, and the next
    writer observes it and appends above both."""
    st, phys = storage_for(_root(tmp_path, "ptr"))
    ptr = st.join(phys, "part-00000", "manifest.json")

    st.put_pointer(ptr, b'{"v": 1}')
    v1 = st._versions(ptr)
    st.put_pointer(ptr, b'{"v": 1}')  # identical retry
    assert st._versions(ptr) != v1  # a new version appends...
    assert st.get_pointer(ptr) == b'{"v": 1}'  # ...same resolved state

    # simulate two racing writers at the same version number: write
    # both objects directly (bypassing the version-discovery LIST)
    import hashlib

    d = ptr + ".v"
    for payload in (b'{"v": "A"}', b'{"v": "B"}'):
        sha = hashlib.sha256(payload).hexdigest()[:8]
        st.put_object(st.join(d, f"cv-{9:010d}-{sha}"), payload)
    winner = st.get_pointer(ptr)
    assert winner in (b'{"v": "A"}', b'{"v": "B"}')
    assert st.get_pointer(ptr) == winner  # deterministic re-read
    # the next well-behaved writer lands ABOVE both racers
    st.put_pointer(ptr, b'{"v": 10}')
    assert st.get_pointer(ptr) == b'{"v": 10}'
    # gc keeps exactly the newest
    st.gc_pointer(ptr)
    assert len(st._versions(ptr)) == 1
    assert st.get_pointer(ptr) == b'{"v": 10}'
