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


def test_wal_single_file_and_missing_path(ray_session, tmp_path):
    """A scheme-prefixed path to ONE segment file must read that file
    (it used to silently yield an empty dataset — the dir listing of
    a file is empty), and a path that exists as neither file nor
    directory raises instead of fabricating zero rows."""
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import write_change_log
    from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import (
        read_change_log,
    )

    changes = generate_changes(300, n_convs=10, seed=47)
    wal = tmp_path / "wal1f"
    write_change_log(changes, str(wal), n_files=1)
    (seg,) = [f for f in wal.iterdir() if f.suffix == ".parquet"]

    assert read_change_log(str(seg)).count() == 300  # plain local file
    obj = NORENAME_SCHEME + str(seg)
    assert read_change_log(obj).count() == 300  # scheme-prefixed file

    with pytest.raises(FileNotFoundError):
        read_change_log(NORENAME_SCHEME + str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        read_change_log(str(tmp_path / "nope"))


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
    """The conditional-put (CAS) commit contract, pinned:
    (a) sequential identical retry appends a new version with the
    same bytes — resolved state unchanged; (b) a version can only be
    created, never overwritten (``put_object_if_absent`` loses
    against an existing object); (c) a ZOMBIE retry whose bytes
    already sit at the contested version succeeds without writing;
    (d) a loser with DIFFERENT bytes lands at the NEXT version —
    no lost update; (e) vacuum keeps the newest version only."""
    st, phys = storage_for(_root(tmp_path, "ptr"))
    ptr = st.join(phys, "part-00000", "manifest.json")
    d = ptr + ".v"

    st.put_pointer(ptr, b'{"v": 1}')
    v1 = st._versions(ptr)
    st.put_pointer(ptr, b'{"v": 1}')  # identical sequential retry
    assert st._versions(ptr) != v1  # a new version appends...
    assert st.get_pointer(ptr) == b'{"v": 1}'  # ...same resolved state

    # (b) exclusive create: a version object is immutable
    other = st.join(phys, "part-00001", "manifest.json") + ".v"
    taken = st.join(other, f"cv-{1:010d}")
    assert st.put_object_if_absent(taken, b'{"v": "A"}')
    assert not st.put_object_if_absent(taken, b'{"v": "B"}')
    assert st.get_object(taken) == b'{"v": "A"}'  # loser changed nothing

    # sibling commits version 3; the zombie's LIST predates it
    st.put_pointer(ptr, b'{"v": 3}')  # versions now [1, 2, 3]
    before = st._versions(ptr)
    real_versions = type(st)._versions
    stale = {}

    def stale_versions(self, path):
        vs = real_versions(self, path)
        if stale.pop("armed", False):
            return [v for v in vs if v != f"cv-{3:010d}"]
        return vs

    type(st)._versions = stale_versions
    try:
        # (c) zombie twin with the SAME bytes: contests version 3,
        # loses the create, recognizes its own bytes → success, no write
        stale["armed"] = True
        st.put_pointer(ptr, b'{"v": 3}')
        assert real_versions(st, ptr) == before  # no version appended
        assert st.get_pointer(ptr) == b'{"v": 3}'

        # (d) a DIFFERENT payload losing the same race retries ABOVE
        # the taken version — its update is not lost
        stale["armed"] = True
        st.put_pointer(ptr, b'{"v": 4}')
    finally:
        type(st)._versions = real_versions
    assert st._versions(ptr)[-1] == f"cv-{4:010d}"
    assert st.get_pointer(ptr) == b'{"v": 4}'
    # (e) gc keeps exactly the newest
    st.gc_pointer(ptr)
    assert len(st._versions(ptr)) == 1
    assert st.get_pointer(ptr) == b'{"v": 4}'


def test_pointer_cas_two_writer_race_drill(tmp_path):
    """The zombie-retry scenario the CAS exists for: TWO concurrent
    writers hammer ONE partition pointer with different payload
    streams.  Invariants asserted: versions are a contiguous 1..K
    sequence, each version holds exactly one immutable payload,
    EVERY payload from both writers landed at exactly one version
    (no lost update), and the final pointer resolves to the very
    last version committed."""
    import threading

    st, phys = storage_for(_root(tmp_path, "race"))
    ptr = st.join(phys, "part-00042", "manifest.json")
    n_each = 40
    errs = []

    def writer(tag):
        try:
            # a fresh storage per writer — no shared client state
            s2, _ = storage_for(_root(tmp_path, "race"))
            for i in range(n_each):
                s2.put_pointer(ptr, f'{{"w": "{tag}", "i": {i}}}'.encode())
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(t,)) for t in ("A", "B")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs

    vs = st._versions(ptr)
    # contiguous version chain, exactly one object per version
    nums = [int(v[3:13]) for v in vs]
    assert nums == list(range(1, len(nums) + 1))
    payloads = [st.get_object(st.join(ptr + ".v", v)) for v in vs]
    # no lost update: all 2×n_each distinct payloads present exactly once
    import json as _json

    seen = [( _json.loads(p)["w"], _json.loads(p)["i"]) for p in payloads]
    assert len(set(seen)) == 2 * n_each
    assert len(seen) == 2 * n_each  # and no duplicate versions of one payload
    # per-writer order preserved in the total order
    for tag in ("A", "B"):
        idx = [i for (w, i) in seen if w == tag]
        assert idx == sorted(idx)
    assert st.get_pointer(ptr) == payloads[-1]


def test_pointer_cas_generic_fallback_detects_conflict(tmp_path, monkeypatch):
    """A filesystem WITHOUT a native exclusive create (no handler
    ``put_if_absent`` — e.g. pyarrow S3 before the If-None-Match hook
    is wired) must still DETECT a stolen version and retry above it:
    inject a conflicting object between the existence check and the
    PUT and assert the writer's update lands at the next version."""
    from cityofphiladelphia_databridge_etl_tools_ray.state import fs as fsmod

    st, phys = storage_for(_root(tmp_path, "fb"))
    # hide the native CAS so ObjectStorage takes the generic path
    monkeypatch.setattr(
        type(st.fs.handler), "put_if_absent", None, raising=True
    )
    ptr = st.join(phys, "p", "manifest.json")
    st.put_pointer(ptr, b"v1")
    assert st.get_pointer(ptr) == b"v1"

    real_get = fsmod.ObjectStorage.get_object
    stolen = {}

    def thieving_get(self, path):
        if "cv-0000000002" in path and not stolen:
            # a zombie twin's last-write-wins PUT lands between our
            # PUT and the read-back verify — the race the fallback
            # can only DETECT, not prevent
            stolen["done"] = True
            with self.fs.open_output_stream(path) as f:
                f.write(b"zombie")
        return real_get(self, path)

    monkeypatch.setattr(fsmod.ObjectStorage, "get_object", thieving_get)
    st.put_pointer(ptr, b"v2")
    vs = st._versions(ptr)
    objs = {v: st.get_object(st.join(ptr + ".v", v)) for v in vs}
    # the thief kept version 2; our update survived at version 3
    assert objs[f"cv-{2:010d}"] == b"zombie"
    assert objs[f"cv-{3:010d}"] == b"v2"
    assert st.get_pointer(ptr) == b"v2"


from hypothesis import given, settings
from hypothesis import strategies as st_hyp


@settings(max_examples=40, deadline=None)
@given(st_hyp.data())
def test_pointer_cas_stale_view_interleavings_property(data):
    """CAS commit invariants under ARBITRARY stale version listings —
    the only shared state between concurrent writers is the version
    list, so hiding a hypothesis-chosen suffix of it at each LIST
    simulates every interleaving the threaded drill samples: commits
    stay totally ordered (contiguous chain), every distinct payload
    lands at exactly one version, per-writer order is preserved, and
    an identical-bytes re-commit never duplicates a version."""
    import tempfile

    root = NORENAME_SCHEME + tempfile.mkdtemp(prefix="casprop-")
    st, phys = storage_for(root)
    ptr = st.join(phys, "p", "manifest.json")

    real_versions = type(st)._versions
    hide = {"n": 0}

    def stale_versions(self, path):
        vs = real_versions(self, path)
        k = hide["n"]
        hide["n"] = 0
        return vs[: len(vs) - k] if k else vs

    type(st)._versions = stale_versions
    try:
        streams = {
            w: [
                (w, i, f'{{"w":"{w}","i":{i}}}'.encode())
                for i in range(data.draw(st_hyp.integers(1, 6), label=f"n_{w}"))
            ]
            for w in ("A", "B")
        }
        payloads = streams["A"] + streams["B"]
        # hypothesis-chosen interleaving that PRESERVES each writer's
        # own order (a merge of two ordered streams — what concurrency
        # can actually produce)
        pos = {"A": 0, "B": 0}
        schedule = []
        while pos["A"] < len(streams["A"]) or pos["B"] < len(streams["B"]):
            choices = [w for w in ("A", "B") if pos[w] < len(streams[w])]
            w = (
                choices[0]
                if len(choices) == 1
                else data.draw(st_hyp.sampled_from(choices), label="next")
            )
            schedule.append(streams[w][pos[w]])
            pos[w] += 1
        for w, i, p in schedule:
            # each commit's FIRST list may be stale by up to 3 versions
            cur = len(real_versions(st, ptr))
            hide["n"] = data.draw(
                st_hyp.integers(0, min(3, cur)), label=f"stale_{w}{i}"
            )
            st.put_pointer(ptr, p)
            # occasional zombie re-commit of the same payload
            if data.draw(st_hyp.booleans(), label=f"retry_{w}{i}"):
                before = real_versions(st, ptr)
                hide["n"] = data.draw(
                    st_hyp.integers(0, min(3, len(before))), label=f"rs_{w}{i}"
                )
                st.put_pointer(ptr, p)
    finally:
        type(st)._versions = real_versions

    vs = st._versions(ptr)
    nums = [int(v[3:13]) for v in vs]
    assert nums == list(range(1, len(nums) + 1))  # contiguous, no gaps
    contents = [st.get_object(st.join(ptr + ".v", v)) for v in vs]
    import json as _json

    seen = [(_json.loads(c)["w"], _json.loads(c)["i"]) for c in contents]
    # every payload committed somewhere; re-commits may append an
    # identical-content version (harmless) but only ADJACENT to or
    # after the original — per-writer index order must hold over
    # first occurrences
    for w, i, _ in payloads:
        assert (w, i) in seen
    for tag in ("A", "B"):
        firsts = []
        done = set()
        for (w, i) in seen:
            if w == tag and i not in done:
                done.add(i)
                firsts.append(i)
        assert firsts == sorted(firsts)
    assert st.get_pointer(ptr) == contents[-1]


def test_orc_wal_segments_all_paths(ray_session, tmp_path):
    """ORC WAL segments (the Hive/Hadoop-ecosystem CDC interchange):
    decode to byte-identical Arrow schemas (timestamp ns→us cast),
    mix with parquet/IPC segments in one directory, prune by encoded
    lsn filename, respect reader-side projection, ride the object
    backend, and replay to the sequential reference."""
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import write_change_log
    from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import (
        read_change_log,
    )

    changes = generate_changes(900, n_convs=30, delete_frac=0.1, seed=51)
    lsn = np.asarray(changes.column("lsn"))
    wal = str(tmp_path / "walorc")
    write_change_log(changes.filter(pa.array(lsn < 300)), wal, n_files=2, format="orc")
    write_change_log(
        changes.filter(pa.array((lsn >= 300) & (lsn < 600))), wal, n_files=2
    )
    write_change_log(changes.filter(pa.array(lsn >= 600)), wal, n_files=2, format="ipc")

    ds = read_change_log(wal)
    assert ds.count() == 900
    # every segment format yields the same Arrow schema (ts back at us)
    assert ds.schema().base_schema.field("ts").type == pa.timestamp("us")
    # watermark pruning by encoded filename applies to .orc too
    assert read_change_log(wal, min_lsn_exclusive=299).count() == 600
    # reader-side projection with the forced-lsn filter rule
    proj = read_change_log(wal, min_lsn_exclusive=299, columns=["conv_id", "op"])
    t = proj.take_batch(10, batch_format="pyarrow")
    assert t.column_names == ["conv_id", "op"]

    # replay ORC-sourced WAL into a lake on the OBJECT backend
    st, phys = storage_for(NORENAME_SCHEME + str(tmp_path / "walobj"))
    for name in sorted(__import__("os").listdir(wal)):
        with open(f"{wal}/{name}", "rb") as f:
            st.put_object(st.join(phys, name), f.read())
    obj_wal = NORENAME_SCHEME + str(tmp_path / "walobj")
    assert read_change_log(obj_wal).count() == 900

    root = _root(tmp_path, "orclake")
    TranscriptLake.create(root, num_partitions=4)
    replay_into_lake(root, read_change_log(obj_wal), validate_sample=None)
    got, exp = _state(root), _expected(changes)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)
