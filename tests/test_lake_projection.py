"""Projected merge-on-read reads (state/lake.py ``columns=``):
pruning at the parquet read must not change values, must drop
resolution-only columns from the result, and must null-fill columns a
partition predates (schema evolution) against the lake-wide schema."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    generate_base,
    generate_changes,
    write_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.functions.hashing import partition_ids
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_into_lake
from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import read_change_log
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake


@pytest.fixture
def lake_with_deltas(tmp_path):
    base = generate_base(n_convs=40, max_turns=10)
    root = str(tmp_path / "lake")
    lake = TranscriptLake.create(root, num_partitions=4)
    pids = partition_ids(base.column("conv_id"), 4)
    for p in range(4):
        lake.commit_partition(p, base.filter(pa.array(pids == p)), high_lsn=-1)
    changes = generate_changes(2000, n_convs=40, delete_frac=0.15)
    write_change_log(changes, str(tmp_path / "wal"), n_files=2)
    replay_into_lake(root, read_change_log(str(tmp_path / "wal")), mode="delta", compact_after=0)
    assert any(lake.run_count(p) > 1 for p in range(4))
    return lake


def _sorted(df):
    cols = [c for c in ("conv_id", "turn_idx", "text") if c in df.columns]
    return df.sort_values(cols, kind="stable").reset_index(drop=True)


def test_projection_matches_full_read(ray_session, lake_with_deltas):
    lake = lake_with_deltas
    full = _sorted(lake.dataset().to_pandas())
    proj = _sorted(lake.dataset(columns=["conv_id", "turn_idx", "text"]).to_pandas())
    assert list(proj.columns) == ["conv_id", "turn_idx", "text"]
    pd.testing.assert_frame_equal(full[["conv_id", "turn_idx", "text"]], proj)

    # keys not requested are read for resolution but dropped from the
    # result; row multiset still matches
    texts = lake.dataset(columns=["text"]).to_pandas()
    assert list(texts.columns) == ["text"]
    assert sorted(texts["text"]) == sorted(full["text"])

    # per-partition projected read agrees with the full partition read
    got = lake.read_partition(1, columns=["text", "conv_id"])
    assert got.schema.names == ["text", "conv_id"]
    ref = lake.read_partition(1)
    assert got.sort_by("conv_id").equals(ref.select(["text", "conv_id"]).sort_by("conv_id"))


def test_projection_fast_path_after_compaction(ray_session, lake_with_deltas):
    lake = lake_with_deltas
    full = _sorted(lake.dataset().to_pandas())
    for p in range(4):
        lake.compact_partition(p)
    proj = _sorted(lake.dataset(columns=["conv_id", "turn_idx", "text"]).to_pandas())
    pd.testing.assert_frame_equal(full[["conv_id", "turn_idx", "text"]], proj)


def test_projection_unknown_column_rejected(ray_session, lake_with_deltas):
    with pytest.raises(KeyError, match="nope"):
        lake_with_deltas.dataset(columns=["nope"])


def test_projection_null_fills_pre_evolution_partitions(ray_session, tmp_path):
    """Partition 0 was written before the ``tool`` column existed; a
    projected read including ``tool`` must null-fill it there instead
    of erroring — on the delta path AND the compacted fast path."""
    v1 = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("text", pa.string()),
        ]
    )
    root = str(tmp_path / "lake")
    lake = TranscriptLake.create(root, num_partitions=2, schema=v1)
    old = pa.table(
        {
            "conv_id": pa.array(["a", "c"]),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "text": pa.array(["old-a", "old-c"]),
        }
    )
    pids = partition_ids(old.column("conv_id"), 2)
    for p in range(2):
        lake.commit_partition(p, old.filter(pa.array(pids == p)), high_lsn=1)
    # evolve: partition owning "b" gets a v2 row with tool
    new = pa.table(
        {
            "conv_id": pa.array(["b"]),
            "turn_idx": pa.array([0], pa.int32()),
            "text": pa.array(["new-b"]),
            "tool": pa.array(["grep"]),
        }
    )
    pid_b = int(partition_ids(new.column("conv_id"), 2)[0])
    merged = pa.concat_tables(
        [lake.read_partition(pid_b), new], promote_options="permissive"
    )
    lake.commit_partition(pid_b, merged, high_lsn=2)

    got = (
        lake.dataset(columns=["conv_id", "tool"])
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == ["a", "b", "c"]
    assert got["tool"].tolist()[1] == "grep"
    assert pd.isna(got["tool"][0]) and pd.isna(got["tool"][2])
