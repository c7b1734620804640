"""LIVE ``s3://`` integration leg — the engine's object-store protocol
driven through ``pyarrow.fs.S3FileSystem`` resolved by
``FileSystem.from_uri``, against a loopback S3-compatible endpoint
(scripts/minis3.py).

The ``norename://`` suites prove the commit protocol's LOGIC with
rename hard-disabled; this module proves the one layer they cannot:
URI-scheme parsing, the AWS-SDK HTTP path (ranged parquet GETs,
multipart-upload output streams, ListObjectsV2 paging, DeleteObjects),
and Ray workers independently reconstructing the S3 filesystem from
the root string on their own connections.  Scenarios: storage
primitives + versioned-pointer CAS semantics, the flagship replay vs
the sequential reference with exactly-once re-replay (WAL and lake
both on s3), an online partition split, and a cross-lake 2PC commit.
"""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from minis3 import MiniS3  # noqa: E402

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (  # noqa: E402
    apply_changes_reference,
    generate_changes,
    write_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (  # noqa: E402
    replay_into_lake,
    replay_transactional,
)
from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import (  # noqa: E402
    read_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.state.fs import storage_for  # noqa: E402
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake  # noqa: E402
from cityofphiladelphia_databridge_etl_tools_ray.state.txn import TxnLog  # noqa: E402


@pytest.fixture(scope="module")
def s3():
    with MiniS3() as srv:
        yield srv


def _expected(changes: pa.Table) -> pd.DataFrame:
    df = apply_changes_reference(None, changes)
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _state(root: str) -> pd.DataFrame:
    df = TranscriptLake(root).read_all().to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _upload_wal(local_dir: str, s3_root: str) -> str:
    """Copy locally-generated WAL segments to the endpoint byte-for-byte."""
    st, phys = storage_for(s3_root)
    for name in sorted(os.listdir(local_dir)):
        with open(os.path.join(local_dir, name), "rb") as f:
            st.put_object(st.join(phys, name), f.read())
    return s3_root


def test_storage_primitives_and_pointer_cas(s3):
    st, phys = storage_for(s3.uri("prim/lake"))
    # objects
    st.put_object(st.join(phys, "a/b.bin"), b"\x00\x01payload")
    assert st.get_object(st.join(phys, "a/b.bin")) == b"\x00\x01payload"
    assert st.exists(st.join(phys, "a/b.bin"))
    assert st.size(st.join(phys, "a/b.bin")) == 9
    assert st.list_objects(st.join(phys, "a")) == ["b.bin"]
    assert st.is_dir(st.join(phys, "a"))
    # versioned pointer commit log over real HTTP
    ptr = st.join(phys, "part-00000", "manifest.json")
    st.put_pointer(ptr, b'{"v": 1}')
    st.put_pointer(ptr, b'{"v": 2}')
    assert st.get_pointer(ptr) == b'{"v": 2}'
    assert st._versions(ptr) == ["cv-0000000001", "cv-0000000002"]
    # S3 has no native exclusive create wired yet -> generic fallback:
    # a taken version is detected and the commit retries above it
    assert not st.put_object_if_absent(
        st.join(ptr + ".v", "cv-0000000002"), b"other"
    )
    st.put_pointer(ptr, b'{"v": 3}')
    assert st._versions(ptr)[-1] == "cv-0000000003"
    # publish_staged: rename-free staged->current flip
    staged = st.join(phys, "staged.json")
    st.put_object(staged, b'{"v": 4}')
    st.publish_staged(staged, ptr)
    assert st.get_pointer(ptr) == b'{"v": 4}'
    assert not st.exists(staged)
    # vacuum keeps the newest version only
    st.gc_pointer(ptr)
    assert st._versions(ptr) == ["cv-0000000004"]


def test_replay_matches_reference_and_is_exactly_once(ray_session, s3, tmp_path):
    changes = generate_changes(3000, n_convs=80, delete_frac=0.1, dup_frac=0.05, seed=5)
    write_change_log(changes, str(tmp_path / "wal"), n_files=3)
    wal = _upload_wal(str(tmp_path / "wal"), s3.uri("flag/wal"))
    root = s3.uri("flag/lake")
    TranscriptLake.create(root, num_partitions=4)

    m1 = replay_into_lake(root, read_change_log(wal), validate_sample=None)
    got, exp = _state(root), _expected(changes)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)

    # exactly-once: the same WAL replayed again applies nothing
    m2 = replay_into_lake(root, read_change_log(wal), validate_sample=None)
    assert int(m2["events_applied"].sum()) == 0
    pd.testing.assert_series_equal(
        _state(root)["text"], exp["text"], check_names=False
    )
    # single-segment read through the scheme (the dir-vs-file branch)
    st, phys = storage_for(wal)
    (first,) = [n for n in st.list_objects(phys) if n.endswith(".parquet")][:1]
    assert read_change_log(wal.replace("flag/wal", f"flag/wal/{first}")).count() > 0


def test_partition_split_preserves_state(ray_session, s3, tmp_path):
    changes = generate_changes(1500, n_convs=40, delete_frac=0.08, seed=7)
    write_change_log(changes, str(tmp_path / "wal2"), n_files=2)
    wal = _upload_wal(str(tmp_path / "wal2"), s3.uri("resc/wal"))
    root = s3.uri("resc/lake")
    TranscriptLake.create(root, num_partitions=4)
    replay_into_lake(root, read_change_log(wal), validate_sample=None)
    before = _state(root)
    res = TranscriptLake(root).split_partitions(factor=2)
    assert res["num_partitions"] == 8
    after = _state(root)
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )
    # replays resume exactly-once on the new layout
    m = replay_into_lake(root, read_change_log(wal), validate_sample=None)
    assert int(m["events_applied"].sum()) == 0


def test_cross_lake_transaction_two_phase(ray_session, s3):
    a, b = s3.uri("txn/lake_a"), s3.uri("txn/lake_b")
    txn_dir = s3.uri("txn/log")
    TranscriptLake.create(a, num_partitions=2)
    TranscriptLake.create(b, num_partitions=2)
    changes = generate_changes(800, n_convs=30, delete_frac=0.1, seed=9)
    lsn = np.asarray(changes.column("lsn"))
    ca = changes.filter(pa.array(lsn % 2 == 0))
    cb = changes.filter(pa.array(lsn % 2 == 1))
    replay_transactional(
        [(a, ray.data.from_arrow(ca)), (b, ray.data.from_arrow(cb))],
        txn_dir,
        "t-s3",
        validate_sample=None,
    )
    pd.testing.assert_series_equal(
        _state(a)["text"], _expected(ca)["text"], check_names=False
    )
    pd.testing.assert_series_equal(
        _state(b)["text"], _expected(cb)["text"], check_names=False
    )
    assert TxnLog(txn_dir).pending() == []


def test_follow_tail_on_s3(ray_session, s3, tmp_path):
    """Continuous WAL tail with BOTH the WAL and the lake on s3://: a
    producer appends segments between cycles through the S3 API; the
    follower must converge to the sequential reference exactly-once,
    with idle cycles pruning fully-applied segments by filename."""
    changes = generate_changes(1200, n_convs=30, delete_frac=0.1, seed=13)
    lsn = np.asarray(changes.column("lsn"))
    w1 = changes.filter(pa.array(lsn < 600))
    w2 = changes.filter(pa.array(lsn >= 600))

    from cityofphiladelphia_databridge_etl_tools_ray.datagen import write_change_log
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import follow_wal

    loc1 = tmp_path / "w1"
    write_change_log(w1, str(loc1), n_files=2)
    wal = _upload_wal(str(loc1), s3.uri("follow/wal"))
    root = s3.uri("follow/lake")
    TranscriptLake.create(root, num_partitions=2)

    stage = {"n": 0}

    def producer(_interval):
        stage["n"] += 1
        if stage["n"] == 1:  # deliver window 2 through the S3 API
            loc2 = tmp_path / "w2"
            write_change_log(w2, str(loc2), n_files=2)
            _upload_wal(str(loc2), wal)

    m = follow_wal(
        root, wal, sleep=producer, idle_stop=2, max_cycles=10,
        validate_sample=None,
    )
    assert int(m["events_applied"].sum()) == len(changes)
    pd.testing.assert_series_equal(
        _state(root)["text"], _expected(changes)["text"], check_names=False
    )
