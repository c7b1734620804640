"""Watermark filter × column projection on every WAL segment format
(ADVICE r2: CSV's include_columns dropped lsn before the lsn filter and
raised KeyError; IPC had the same latent bug; JSONL's ordering was
correct only by accident).  The rule now everywhere: decode with lsn
force-included, filter, project last."""

import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
    generate_changes,
    write_change_log,
)
from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import read_change_log


@pytest.mark.parametrize("fmt", ["parquet", "ipc", "csv", "jsonl"])
def test_lsn_filter_with_projection_excluding_lsn(ray_session, tmp_path, fmt):
    ch = generate_changes(400, n_convs=20, max_turns=10, seed=3)
    out = str(tmp_path / fmt)
    write_change_log(ch, out, n_files=4, format=fmt)

    cutoff = int(pa.compute.approximate_median(ch.column("lsn")).as_py())
    expect = ch.filter(pa.compute.greater(ch.column("lsn"), cutoff))

    got = read_change_log(
        out, columns=["conv_id", "turn_idx"], min_lsn_exclusive=cutoff
    ).to_pandas()
    assert sorted(got.columns) == ["conv_id", "turn_idx"]
    assert len(got) == len(expect)
    key = ["conv_id", "turn_idx"]
    assert (
        got.sort_values(key)
        .reset_index(drop=True)
        .equals(
            expect.select(key).to_pandas().sort_values(key).reset_index(drop=True)
        )
    )


@pytest.mark.parametrize("fmt", ["csv", "ipc", "jsonl"])
def test_projection_without_filter_still_works(ray_session, tmp_path, fmt):
    ch = generate_changes(200, n_convs=10, max_turns=5, seed=4)
    out = str(tmp_path / fmt)
    write_change_log(ch, out, n_files=2, format=fmt)
    got = read_change_log(out, columns=["conv_id", "op"]).to_pandas()
    assert sorted(got.columns) == ["conv_id", "op"]
    assert len(got) == 200
