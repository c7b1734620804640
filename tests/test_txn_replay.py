"""Cross-table transactional replay (state/txn.py +
replay_into_lake(txn=) + replay_transactional).

Contract under test: staging is invisible until the single atomic
transaction record exists; a crash before the record fully disappears
(roll-back + exactly-once re-replay), a crash after it fully lands
(roll-forward); vacuum never reclaims a staged transaction's files;
and the transactional path converges to the same state as plain
sequential replays.
"""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    apply_changes_reference,
    generate_changes,
)
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
    replay_into_lake,
    replay_transactional,
)
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake
from cityofphiladelphia_databridge_etl_tools_ray.state.txn import TxnLog


def _split(changes: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Route one WAL to two tables: odd lsn → A, even lsn → B."""
    import numpy as np

    lsn = changes.column("lsn").to_numpy()
    return changes.filter(pa.array(lsn % 2 == 1)), changes.filter(pa.array(lsn % 2 == 0))


def _state(root: str) -> pd.DataFrame:
    df = TranscriptLake(root).read_all().to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _expected(changes: pa.Table) -> pd.DataFrame:
    df = apply_changes_reference(None, changes)
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


@pytest.fixture(params=["", "norename://"], ids=["posix", "objectstore"])
def two_lakes(request, tmp_path):
    a = request.param + str(tmp_path / "lake_a")
    b = request.param + str(tmp_path / "lake_b")
    TranscriptLake.create(a, num_partitions=4)
    TranscriptLake.create(b, num_partitions=4)
    txn_dir = request.param + str(tmp_path / "txns")
    changes = generate_changes(1200, n_convs=50, delete_frac=0.1, seed=11)
    return a, b, txn_dir, changes


def test_staged_replay_is_invisible_until_commit(ray_session, two_lakes):
    a, b, txn_dir, changes = two_lakes
    ca, cb = _split(changes)
    replay_into_lake(a, ray.data.from_arrow(ca), txn="t1", validate_sample=None)
    lake = TranscriptLake(a)
    assert lake.read_all().num_rows == 0  # staged only — nothing visible
    assert lake.watermarks() == {p: -1 for p in range(4)}
    assert lake.staged_txn_manifests("t1")
    # recovery with no record rolls the stage back
    rec = TxnLog(txn_dir).recover([a, b])
    assert rec["rolled_forward"] == 0 and rec["rolled_back"] >= 1
    assert not TranscriptLake(a).staged_txn_manifests()
    # re-replay (transactionally this time) lands the full state
    replay_transactional(
        [(a, ray.data.from_arrow(ca)), (b, ray.data.from_arrow(cb))],
        txn_dir,
        "t2",
        validate_sample=None,
    )
    pd.testing.assert_series_equal(
        _state(a)["text"], _expected(ca)["text"], check_names=False
    )
    pd.testing.assert_series_equal(
        _state(b)["text"], _expected(cb)["text"], check_names=False
    )


def test_crash_after_commit_point_rolls_forward(ray_session, two_lakes):
    a, b, txn_dir, changes = two_lakes
    ca, cb = _split(changes)
    # stage both, write the record, "crash" before publish
    replay_into_lake(a, ray.data.from_arrow(ca), txn="t1", validate_sample=None)
    replay_into_lake(b, ray.data.from_arrow(cb), txn="t1", validate_sample=None)
    log = TxnLog(txn_dir)
    log.commit("t1", [a, b])
    assert TranscriptLake(a).read_all().num_rows == 0
    # recovery (what the next transactional replay runs first) publishes
    rec = log.recover([a, b])
    assert rec["rolled_forward"] > 0 and rec["rolled_back"] == 0
    assert not log.pending()
    pd.testing.assert_series_equal(
        _state(a)["text"], _expected(ca)["text"], check_names=False
    )
    pd.testing.assert_series_equal(
        _state(b)["text"], _expected(cb)["text"], check_names=False
    )
    # the published watermarks make a re-replay of the window a no-op
    m = replay_into_lake(a, ray.data.from_arrow(ca), validate_sample=None)
    assert int(m["events_applied"].sum()) == 0


def test_partial_publish_crash_is_resumable(ray_session, two_lakes):
    a, b, txn_dir, changes = two_lakes
    ca, cb = _split(changes)
    replay_into_lake(a, ray.data.from_arrow(ca), txn="t1", validate_sample=None)
    replay_into_lake(b, ray.data.from_arrow(cb), txn="t1", validate_sample=None)
    log = TxnLog(txn_dir)
    log.commit("t1", [a, b])
    TranscriptLake(a).publish_txn("t1")  # crash mid-publish: A flipped, B not
    assert TranscriptLake(b).read_all().num_rows == 0
    log.recover([a, b])
    pd.testing.assert_series_equal(
        _state(b)["text"], _expected(cb)["text"], check_names=False
    )


def test_vacuum_preserves_staged_txn_files(ray_session, two_lakes):
    a, b, txn_dir, changes = two_lakes
    ca, _ = _split(changes)
    replay_into_lake(a, ray.data.from_arrow(ca), txn="t1", validate_sample=None)
    lake = TranscriptLake(a)
    staged = lake.staged_txn_manifests("t1")
    removed = lake.vacuum()
    assert lake.staged_txn_manifests("t1") == staged
    # the staged manifests' data files survived the vacuum
    from cityofphiladelphia_databridge_etl_tools_ray.state.manifest import (
        PartitionManifest,
    )

    for path in staged:
        m = PartitionManifest.load(path, lake.store)  # staged = object;
        if m is None:  # object backend: read the staged object directly
            m = PartitionManifest.from_json(lake.store.get_json(path))
        pdir = path.rsplit("/", 1)[0]
        for f in m.files:
            assert lake.store.exists(lake.store.join(pdir, f["path"]))
    lake.publish_txn("t1")
    pd.testing.assert_series_equal(
        _state(a)["text"], _expected(ca)["text"], check_names=False
    )


def test_two_transactional_windows_equal_plain_replay(ray_session, two_lakes):
    a, b, txn_dir, changes = two_lakes
    import numpy as np

    lsn = changes.column("lsn").to_numpy()
    mid = int(np.median(lsn))
    w1 = changes.filter(pa.array(lsn <= mid))
    w2 = changes.filter(pa.array(lsn > mid))
    for tid, window in (("w1", w1), ("w2", w2)):
        ca, cb = _split(window)
        replay_transactional(
            [(a, ray.data.from_arrow(ca)), (b, ray.data.from_arrow(cb))],
            txn_dir,
            tid,
            validate_sample=None,
        )
    ca_all, cb_all = _split(changes)
    pd.testing.assert_series_equal(
        _state(a)["text"], _expected(ca_all)["text"], check_names=False
    )
    pd.testing.assert_series_equal(
        _state(b)["text"], _expected(cb_all)["text"], check_names=False
    )
    assert not TxnLog(txn_dir).pending()
    assert not TranscriptLake(a).staged_txn_manifests()


def test_snapshot_mode_refuses_txn(ray_session, two_lakes):
    a, _, _, changes = two_lakes
    with pytest.raises(ValueError, match="snapshot"):
        replay_into_lake(
            a,
            ray.data.from_arrow(changes),
            mode="snapshot",
            txn="t1",
            validate_sample=None,
        )
