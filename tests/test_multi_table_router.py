"""Binlog-router semantics (cdc_replay_multi_table's underlying shape):
one WAL routed into two lakes with different PKs must

- partition the stream DISJOINTLY (every change lands in exactly one
  table; total applied = WAL length, no duplication or loss),
- keep INDEPENDENT per-table watermarks/manifests,
- stay exactly-once per table (a second routed replay is a no-op on
  both lakes).
"""

import numpy as np
import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.datagen import generate_changes
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
    replay_into_lake,
)
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    GENERIC_PK_SCHEMA,
)
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake


def _routed(changes: pa.Table, keep_users: bool):
    import ray.data

    lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
    m = lsn % 3 == 0
    part = changes.filter(pa.array(m if keep_users else ~m))
    if keep_users:
        # reshape onto the generic user-state schema: PK user_id derived
        # from the conv, payload (event_type, value, ts)
        conv = part.column("conv_id").to_numpy(zero_copy_only=False)
        uid = np.array([int(str(c).rsplit("-", 1)[-1]) for c in conv], np.int64)
        part = pa.table(
            {
                "op": part.column("op"),
                "lsn": part.column("lsn"),
                "user_id": pa.array(uid),
                "event_type": part.column("role"),
                "value": pa.array(np.ones(len(part), np.float64)),
                "ts": part.column("ts"),
            }
        )
    return ray.data.from_arrow(part)


@pytest.fixture(scope="module")
def routed_lakes(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("router")
    t_root, u_root = str(root / "transcripts"), str(root / "users")
    TranscriptLake.create(t_root, num_partitions=8)
    TranscriptLake.create(
        u_root, num_partitions=8, schema=GENERIC_PK_SCHEMA, primary_key=["user_id"]
    )
    changes = generate_changes(4000, n_convs=60, delete_frac=0.1, dup_frac=0.0)
    m1 = replay_into_lake(t_root, _routed(changes, False))
    m2 = replay_into_lake(u_root, _routed(changes, True))
    return t_root, u_root, changes, m1, m2


def test_router_partitions_disjointly(routed_lakes):
    """Each lake's final state is the LWW of exactly ITS routed subset
    (nothing lost, nothing duplicated across tables)."""
    t_root, u_root, changes, m1, m2 = routed_lakes
    assert int(m1["events_applied"].sum()) > 0
    assert int(m2["events_applied"].sum()) > 0
    df = changes.to_pandas()
    lsn = df["lsn"].to_numpy()

    t_df = df[lsn % 3 != 0].sort_values("lsn").groupby(
        ["conv_id", "turn_idx"], as_index=False
    ).last()
    t_exp = t_df[t_df["op"] != "delete"]
    assert TranscriptLake(t_root).metrics()["row_count"] == len(t_exp)

    u_df = df[lsn % 3 == 0].copy()
    u_df["user_id"] = u_df["conv_id"].str.rsplit("-", n=1).str[-1].astype(np.int64)
    u_last = u_df.sort_values("lsn").groupby("user_id", as_index=False).last()
    u_exp = u_last[u_last["op"] != "delete"]
    assert TranscriptLake(u_root).metrics()["row_count"] == len(u_exp)


def test_router_keeps_independent_watermarks(routed_lakes):
    t_root, u_root, changes, _, _ = routed_lakes
    lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
    t_lake, u_lake = TranscriptLake(t_root), TranscriptLake(u_root)
    assert t_lake.metrics()["max_watermark"] == int(lsn[lsn % 3 != 0].max())
    assert u_lake.metrics()["max_watermark"] == int(lsn[lsn % 3 == 0].max())


def test_router_exactly_once_per_table(routed_lakes):
    t_root, u_root, changes, _, _ = routed_lakes
    r1 = replay_into_lake(t_root, _routed(changes, False))
    r2 = replay_into_lake(u_root, _routed(changes, True))
    assert r1.empty or r1["events_applied"].sum() == 0
    assert r2.empty or r2["events_applied"].sum() == 0
