"""CLI + dead-letter routing tests (reference analogs: click command
tree cli.py:13-25; error file write ago/ago.py:319-344)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.cli import main
from cityofphiladelphia_databridge_etl_tools_ray.datagen import generate_changes, write_change_log
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_into_lake
from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import read_change_log
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake


@pytest.fixture
def wal(tmp_path):
    changes = generate_changes(3000, n_convs=40, seed=5)
    wal_dir = tmp_path / "wal"
    write_change_log(changes, str(wal_dir), n_files=4)
    return wal_dir


def test_cli_create_replay_metrics_vacuum(ray_session, wal, tmp_path, capsys):
    lake_root = str(tmp_path / "lake")
    assert main(["create-lake", lake_root, "--partitions", "8"]) == 0
    assert main(["replay", lake_root, str(wal)]) == 0
    out = capsys.readouterr().out
    recs = json.loads(out.strip().splitlines()[-1])
    # events_applied counts post-combiner rows, so ≤ raw events
    applied = sum(r["events_applied"] for r in recs)
    assert 0 < applied <= 3000

    assert main(["watermarks", lake_root]) == 0
    wm = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert max(wm.values()) == 2999

    assert main(["metrics", lake_root]) == 0
    m = json.loads(capsys.readouterr().out)
    assert m["row_count"] == TranscriptLake(lake_root).total_rows()
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import apply_changes_reference

    expected = apply_changes_reference(None, generate_changes(3000, n_convs=40, seed=5))
    assert m["row_count"] == len(expected)

    assert main(["vacuum", lake_root]) == 0


def test_dead_letter_routes_invalid_ops(ray_session, tmp_path):
    changes = generate_changes(500, n_convs=10, seed=9)
    # corrupt 50 ops
    op = changes.column("op").to_pylist()
    for i in range(0, 500, 10):
        op[i] = "mutate"
    changes = changes.set_column(0, "op", pa.array(op))
    wal_dir = tmp_path / "wal"
    write_change_log(changes, str(wal_dir), n_files=2)

    lake_root = str(tmp_path / "lake")
    dl_dir = str(tmp_path / "dead")
    TranscriptLake.create(lake_root, num_partitions=4)
    replay_into_lake(
        lake_root,
        read_change_log(str(wal_dir)),
        invalid_ops="dead_letter",
        dead_letter_dir=dl_dir,
    )
    files = [f for f in os.listdir(dl_dir) if f.endswith(".parquet")]
    assert files
    rejected = pa.concat_tables([pq.read_table(os.path.join(dl_dir, f)) for f in files])
    assert len(rejected) == 50
    assert set(rejected.column("op").to_pylist()) == {"mutate"}


def test_invalid_op_error_mode_raises(ray_session, tmp_path):
    changes = generate_changes(100, n_convs=5, seed=9)
    op = changes.column("op").to_pylist()
    op[3] = "bogus"
    changes = changes.set_column(0, "op", pa.array(op))
    wal_dir = tmp_path / "wal"
    write_change_log(changes, str(wal_dir), n_files=1)
    lake_root = str(tmp_path / "lake")
    TranscriptLake.create(lake_root, num_partitions=2)
    with pytest.raises(Exception, match="invalid op|bogus|RayTaskError"):
        replay_into_lake(lake_root, read_change_log(str(wal_dir)))


def test_cli_replay_assume_tz(ray_session, tmp_path):
    """CLI --assume-tz threads through to the normalizer: replayed ts
    payloads arrive as UTC instants."""
    import pandas as pd

    changes = generate_changes(500, n_convs=20, seed=31)
    wal = str(tmp_path / "wal")
    write_change_log(changes, wal, n_files=2)
    root = str(tmp_path / "lake")
    assert main(["create-lake", root, "--partitions", "4"]) == 0
    assert main(["replay", root, wal, "--assume-tz", "US/Eastern"]) == 0

    got = TranscriptLake(root).read_all().to_pandas().set_index(["conv_id", "turn_idx"])
    plain_root = str(tmp_path / "lake2")
    assert main(["create-lake", plain_root, "--partitions", "4"]) == 0
    assert main(["replay", plain_root, wal]) == 0
    plain = TranscriptLake(plain_root).read_all().to_pandas().set_index(["conv_id", "turn_idx"])
    shifted = (
        plain["ts"]
        .dt.tz_localize("US/Eastern", ambiguous=True, nonexistent="shift_backward")
        .dt.tz_convert("UTC")
        .dt.tz_localize(None)
    )
    pd.testing.assert_series_equal(got["ts"].sort_index(), shifted.sort_index(), check_names=False)


def test_export_json_schema(ray_session, tmp_path):
    """Frictionless-style schema sidecar from the lake manifests —
    the reference's export_json_schema (postgres/_properties.py:36-85)
    including evolution: a replayed extra column appears."""
    import ray.data

    changes = generate_changes(300, n_convs=10, seed=7)
    changes = changes.append_column("score", pa.array([1.5] * len(changes), pa.float64()))
    root = str(tmp_path / "lake")
    assert main(["create-lake", root, "--partitions", "4"]) == 0
    replay_into_lake(root, ray.data.from_arrow(changes))
    sidecar = TranscriptLake(root).export_json_schema()
    by_name = {f["name"]: f["type"] for f in sidecar["fields"]}
    assert by_name["conv_id"] == "string"
    assert by_name["turn_idx"] == "integer"
    assert by_name["ts"] == "datetime"
    assert by_name["score"] == "number"  # evolved column present
    assert sidecar["primaryKey"] == ["conv_id", "turn_idx"]


def test_cli_publish_gzip_csv(ray_session, tmp_path, capsys):
    """CLI publish: lake state → gzip-CSV parts readable by pandas,
    with a per-part manifest summary on stdout (the reference's
    OpenData upload command, opendata/opendata.py:249-263)."""
    import glob
    import gzip
    import io
    import json as _json

    import pandas as pd

    changes = generate_changes(800, n_convs=30, seed=5)
    wal = str(tmp_path / "wal")
    write_change_log(changes, wal, n_files=2)
    root = str(tmp_path / "lake")
    assert main(["create-lake", root, "--partitions", "4"]) == 0
    assert main(["replay", root, wal]) == 0
    out_dir = str(tmp_path / "pub")
    assert main(["publish", "--root", root, "--out", out_dir]) == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    lake_rows = TranscriptLake(root).total_rows()
    assert summary["rows"] == lake_rows and summary["parts"] >= 1
    parts = sorted(glob.glob(out_dir + "/part-*.csv.gz"))
    assert len(parts) == summary["parts"]
    dfs = [pd.read_csv(io.BytesIO(gzip.decompress(open(p, "rb").read()))) for p in parts]
    got = pd.concat(dfs, ignore_index=True)
    assert len(got) == lake_rows
    assert set(got.columns) == set(TranscriptLake(root).base_schema.names)


def test_cli_query_out_streams_parquet(tmp_path):
    """`query --out` streams a Dataset result to parquet (no driver
    to_pandas); the written table round-trips with correct rows."""
    import subprocess
    import sys

    import duckdb

    out = str(tmp_path / "res")
    r = subprocess.run(
        [
            sys.executable, "-m", "cityofphiladelphia_databridge_etl_tools_ray",
            "--num-cpus", "4", "query", "text_token_counts",
            "--sf-dir", "/root/testdata/sf0.001", "--out", out,
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    exp = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert f"wrote {exp} rows" in r.stdout, r.stdout[-500:]
    n = duckdb.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
    assert n == exp
    # rerun into the same non-empty dir must refuse, not silently mix
    r2 = subprocess.run(
        [
            sys.executable, "-m", "cityofphiladelphia_databridge_etl_tools_ray",
            "--num-cpus", "4", "query", "text_token_counts",
            "--sf-dir", "/root/testdata/sf0.001", "--out", out,
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r2.returncode != 0 and "not empty" in (r2.stderr + r2.stdout)


def test_cli_leaves_caller_owned_ray_session_alive(ray_session, wal, tmp_path):
    """Embedded main() must NOT shut down a Ray session it did not
    create — an unconditional shutdown here let a post-shutdown Ray
    Data stats flush hard-exit the whole host process (silent pytest
    death, core_worker_process.cc 'already been shutdown')."""
    import ray

    lake_root = str(tmp_path / "lake")
    assert main(["create-lake", lake_root, "--partitions", "4"]) == 0
    assert main(["replay", lake_root, str(wal)]) == 0
    assert ray.is_initialized()  # caller's session survives the CLI


def test_cli_objectstore_roots_end_to_end(ray_session, wal, tmp_path, capsys):
    """The CLI accepts object-store root strings untouched (the
    backend scheme rides in the string, state/fs.py): create-lake /
    replay / watermarks / metrics / fsck / vacuum against a
    norename:// lake reading a norename:// WAL."""
    from cityofphiladelphia_databridge_etl_tools_ray.state.fs import NORENAME_SCHEME

    lake_root = NORENAME_SCHEME + str(tmp_path / "objlake")
    obj_wal = NORENAME_SCHEME + str(wal)
    assert main(["create-lake", lake_root, "--partitions", "4"]) == 0
    assert main(["replay", lake_root, obj_wal]) == 0
    recs = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sum(r["events_applied"] for r in recs) > 0

    assert main(["watermarks", lake_root]) == 0
    wm = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert max(wm.values()) == 2999

    assert main(["fsck", lake_root]) == 0
    audit = json.loads(capsys.readouterr().out)
    assert audit["ok"]

    assert main(["metrics", lake_root]) == 0
    m = json.loads(capsys.readouterr().out)
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
        apply_changes_reference,
    )

    expected = apply_changes_reference(None, generate_changes(3000, n_convs=40, seed=5))
    assert m["row_count"] == len(expected)
    assert main(["vacuum", lake_root]) == 0
