"""Lake patch-mode ingestion (mode="patch"): end-to-end sparse-diff
replay with manifests, watermarks and exactly-once.

- full replay of the derived sparse WAL equals the oracle-checked
  query-layer semantics (cdc_replay_partial_updates);
- re-replaying the same WAL is a watermark no-op (idempotence);
- a 40%/100% overlapping two-step replay equals the one-shot replay
  (exactly-once across the watermark, with stale components inside
  prereduced states losing per column);
- the CLI exposes --mode patch.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    QUERIES,
    _derive_sparse_changelog,
)
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_into_lake
from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake

SF = "/root/testdata/sf0.001"


def _lake_state(root: str) -> pd.DataFrame:
    lake = TranscriptLake(root)
    parts = [lake.read_partition(p) for p in range(lake.num_partitions)]
    parts = [p for p in parts if len(p)]
    df = pa.concat_tables(parts).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _expected() -> pd.DataFrame:
    exp = QUERIES["cdc_replay_partial_updates"](SF).to_pandas()
    return exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _cmp_state(got: pd.DataFrame, exp: pd.DataFrame):
    got = got[sorted(exp.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_patch_replay_full_and_idempotent(ray_session, tmp_path):
    root = str(tmp_path / "lake")
    TranscriptLake.create(root, num_partitions=8)
    m1 = replay_into_lake(root, _derive_sparse_changelog(SF), mode="patch")
    assert (m1["events_applied"] > 0).any()
    exp = _expected()
    _cmp_state(_lake_state(root), exp)
    wm1 = TranscriptLake(root).watermarks()

    # re-replay: every state is stale -> watermark no-op everywhere
    m2 = replay_into_lake(root, _derive_sparse_changelog(SF), mode="patch")
    assert (m2["events_applied"] == 0).all() if len(m2) else True
    assert TranscriptLake(root).watermarks() == wm1
    _cmp_state(_lake_state(root), exp)


def test_patch_replay_overlapping_windows_exactly_once(ray_session, tmp_path):
    import pyarrow.compute as pc

    changes = _derive_sparse_changelog(SF)
    hi = changes.max("lsn")
    cut = int(hi * 0.4)

    root = str(tmp_path / "lake")
    TranscriptLake.create(root, num_partitions=8)
    first = _derive_sparse_changelog(SF).filter(lambda r: r["lsn"] <= cut)
    replay_into_lake(root, first, mode="patch")
    mid = _lake_state(root)
    assert len(mid) > 0
    # second replay OVERLAPS: the full stream, stale half included
    replay_into_lake(root, _derive_sparse_changelog(SF), mode="patch")
    _cmp_state(_lake_state(root), _expected())


def test_patch_mode_rejects_salt(ray_session, tmp_path):
    root = str(tmp_path / "lake")
    TranscriptLake.create(root, num_partitions=4)
    with pytest.raises(ValueError, match="salting"):
        replay_into_lake(root, _derive_sparse_changelog(SF), mode="patch", salt=4)


def test_cli_patch_mode(ray_session, tmp_path, capsys):
    import json

    from cityofphiladelphia_databridge_etl_tools_ray.cli import main
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import write_change_log

    rows = _derive_sparse_changelog(SF).take_all()
    tbl = pa.Table.from_pylist(rows)
    # conform to the WAL interchange schema (tool column, typed turn_idx)
    tbl = tbl.add_column(
        tbl.schema.get_field_index("text"),
        pa.field("tool", pa.string()),
        pa.nulls(len(tbl), pa.string()),
    )
    i = tbl.schema.get_field_index("turn_idx")
    tbl = tbl.set_column(i, "turn_idx", tbl.column("turn_idx").cast(pa.int32()))
    wal_dir = tmp_path / "wal"
    write_change_log(tbl, str(wal_dir), n_files=2)

    root = str(tmp_path / "lake")
    assert main(["create-lake", root, "--partitions", "4"]) == 0
    assert main(["replay", root, str(wal_dir), "--mode", "patch"]) == 0
    out = capsys.readouterr().out
    recs = json.loads(out.strip().splitlines()[-1])
    assert sum(r["events_applied"] for r in recs) > 0
    _cmp_state(_lake_state(root), _expected())


def test_patch_mode_generic_pk_lake(ray_session, tmp_path):
    """Patch ingestion on a custom-PK, custom-schema lake: updates
    carry NULL for untouched columns; the per-column winners must
    match a sequential patch reference keyed on item_id."""
    import ray.data

    schema = pa.table(
        {
            "item_id": pa.array([], pa.int64()),
            "qty": pa.array([], pa.int64()),
            "note": pa.array([], pa.string()),
        }
    ).schema
    root = str(tmp_path / "genpk")
    TranscriptLake.create(root, num_partitions=8, schema=schema, primary_key=["item_id"])

    rng = np.random.default_rng(7)
    n = 3000
    item = rng.integers(0, 50, n)
    op = np.where(
        rng.random(n) < 0.12, "delete", np.where(rng.random(n) < 0.3, "insert", "update")
    )
    qty = rng.integers(0, 1000, n).astype(object)
    note = np.array([f"n{i}" for i in range(n)], dtype=object)
    qty[rng.random(n) < 0.5] = None   # sparse: half the patches omit qty
    note[rng.random(n) < 0.5] = None  # ... and half omit note
    t = pa.table(
        {
            "op": pa.array(op.tolist()),
            "lsn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "item_id": pa.array(item, pa.int64()),
            "qty": pa.array(qty.tolist(), pa.int64()),
            "note": pa.array(note.tolist(), pa.string()),
        }
    )

    replay_into_lake(root, ray.data.from_arrow(t), mode="patch")

    state: dict = {}
    for r in t.to_pylist():  # sequential patch reference
        k = r["item_id"]
        if r["op"] == "delete":
            state.pop(k, None)
            continue
        cur = state.setdefault(k, {"qty": None, "note": None})
        for c in ("qty", "note"):
            if r[c] is not None:
                cur[c] = r[c]
    got = {
        r["item_id"]: (r["qty"], r["note"])
        for r in TranscriptLake(root).read_all().to_pylist()
    }
    exp = {k: (v["qty"], v["note"]) for k, v in state.items()}
    assert got == exp


def _sparse_wal_table() -> pa.Table:
    rows = _derive_sparse_changelog(SF).take_all()
    tbl = pa.Table.from_pylist(rows)
    tbl = tbl.add_column(
        tbl.schema.get_field_index("text"),
        pa.field("tool", pa.string()),
        pa.nulls(len(tbl), pa.string()),
    )
    i = tbl.schema.get_field_index("turn_idx")
    return tbl.set_column(i, "turn_idx", tbl.column("turn_idx").cast(pa.int32()))


def test_follow_wal_patch_mode(ray_session, tmp_path):
    """The continuous tail composes with patch mode: segments appear
    between cycles, each cycle patch-merges only what is new, and the
    final state equals the one-shot replay."""
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import write_change_log
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import follow_wal

    tbl = _sparse_wal_table()
    order = np.argsort(np.asarray(tbl.column("lsn")))
    tbl = tbl.take(pa.array(order))
    half = len(tbl) // 2
    wal_dir = tmp_path / "wal"
    write_change_log(tbl.slice(0, half), str(wal_dir), n_files=2)

    produced = {"done": False}

    def producer_sleep(_secs):
        if not produced["done"]:
            # append the rest of the WAL as new segments mid-loop
            # (segment filenames encode their lsn range, so they land
            # beside the first half without collisions)
            write_change_log(tbl.slice(half), str(wal_dir), n_files=2)
            produced["done"] = True

    root = str(tmp_path / "lake")
    TranscriptLake.create(root, num_partitions=8)
    follow_wal(
        root, str(wal_dir), mode="patch", sleep=producer_sleep,
        idle_stop=2, max_cycles=10, poll_interval=0,
    )
    _cmp_state(_lake_state(root), _expected())


def test_transactional_patch_replay(ray_session, tmp_path):
    """All-or-nothing patch replay across two lakes (the binlog-router
    transaction composed with sparse-diff semantics)."""
    import ray.data

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
        replay_transactional,
    )

    roots = [str(tmp_path / "lake_a"), str(tmp_path / "lake_b")]
    for r in roots:
        TranscriptLake.create(r, num_partitions=4)
    tbl = _sparse_wal_table()
    replay_transactional(
        [(roots[0], ray.data.from_arrow(tbl)), (roots[1], ray.data.from_arrow(tbl))],
        str(tmp_path / "txn"),
        "txn-patch-1",
        mode="patch",
    )
    exp = _expected()
    _cmp_state(_lake_state(roots[0]), exp)
    _cmp_state(_lake_state(roots[1]), exp)
