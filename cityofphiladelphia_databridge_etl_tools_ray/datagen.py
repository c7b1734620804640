"""Deterministic synthetic transcripts + CDC change-log generators.

Seed-fixed, wall-clock-free (FIXTURES.md §1-2).  Replaces the
reference's fixture CSVs (reference tests/fixtures_data/ — e.g. the
special-char rows ``ab#$%c`` / ``d!@^&*?-=+ef`` in
staging/point_table_2272.csv, mirrored here in TEXT_SALTS).

Also provides :func:`apply_changes_reference` — the sequential oracle
(sort by lsn, apply one-by-one to a dict) used by the tests, the
analog of the reference's extract→upsert→extract ``recorddiff`` round
trip (reference tests/test_postgres.py:69-92).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA

ROLES = np.array(["user", "assistant", "system", "tool"])
EPOCH_US = 1_700_000_000_000_000  # fixed origin, not wall clock

# Edge-case text fragments: empty, special chars (reference fixture
# rows), unicode, embedded newlines/quotes, a large cell.
TEXT_SALTS = [
    "",
    "ab#$%c",
    "d!@^&*?-=+ef",
    "naïve café — 北京 🚀",
    'line1\nline2\t"quoted"',
    "x" * 4096,
]


def _texts(conv: np.ndarray, turn: np.ndarray, tag: np.ndarray) -> np.ndarray:
    """Deterministic per-row text: unique per (conv, turn, tag) with a
    rotating edge-case salt so equality checks exercise unicode,
    newlines, empties and big cells."""
    salt_ix = (turn.astype(np.int64) * 7 + tag.astype(np.int64) * 13) % len(TEXT_SALTS)
    salts = pd.Series(np.array(TEXT_SALTS, dtype=object)[salt_ix])
    s = (
        pd.Series(conv, dtype=object)
        + "/" + pd.Series(turn).astype(str)
        + "#" + pd.Series(tag).astype(str)
        + "|" + salts
    )
    return s.to_numpy(dtype=object)


def generate_base(n_convs: int = 100, max_turns: int = 20, seed: int = 42) -> pa.Table:
    """Base transcripts table: dense 0-based turn_idx per conv_id,
    monotone ts within a conv, a few hot convs with max turns."""
    rng = np.random.default_rng(seed)
    turns_per_conv = rng.integers(1, max_turns + 1, size=n_convs)
    conv_ix = np.repeat(np.arange(n_convs), turns_per_conv)
    turn = np.concatenate([np.arange(t) for t in turns_per_conv]).astype(np.int32)
    conv = np.char.add("conv-", np.char.zfill(conv_ix.astype(str), 6))
    n = len(conv)
    role = ROLES[np.where(turn % 2 == 0, 0, 1)]
    role = np.where(turn % 7 == 3, "tool", role)
    tool = np.where(role == "tool", "search", None)
    ts = EPOCH_US + conv_ix.astype(np.int64) * 3_600_000_000 + turn.astype(np.int64) * 60_000_000
    return pa.Table.from_arrays(
        [
            pa.array(conv, pa.string()),
            pa.array(turn, pa.int32()),
            pa.array(role, pa.string()),
            pa.array(_texts(conv, turn, np.zeros(n, np.int64)), pa.string()),
            pa.array(tool, pa.string()),
            pa.array(ts, pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def generate_changes(
    n_events: int,
    *,
    n_convs: int = 100,
    max_turns: int = 20,
    start_lsn: int = 0,
    update_frac: float = 0.5,
    delete_frac: float = 0.1,
    hot_frac: float = 0.0,
    dup_frac: float = 0.0,
    shuffle: bool = True,
    seed: int = 42,
) -> pa.Table:
    """Change log of upserts/deletes against conv-space [0, n_convs).

    - ``update_frac`` of events hit existing (conv, turn) keys
      repeatedly (update-heavy scenario);
    - ``delete_frac`` are tombstones;
    - ``hot_frac`` of events all target conv-000000 (hot-key skew);
    - ``dup_frac`` of events are exact duplicates (same lsn replayed —
      the replay-overlap scenario);
    - ``shuffle`` permutes rows so lsn order ≠ arrival order
      (out-of-order scenario).
    """
    rng = np.random.default_rng(seed + 1)
    lsn = start_lsn + np.arange(n_events, dtype=np.int64)
    conv_ix = rng.integers(0, n_convs, size=n_events)
    n_hot = int(n_events * hot_frac)
    if n_hot:
        hot_pos = rng.choice(n_events, size=n_hot, replace=False)
        conv_ix[hot_pos] = 0
    turn = rng.integers(0, max_turns, size=n_events).astype(np.int32)
    u = rng.random(n_events)
    op = np.where(u < delete_frac, "delete", np.where(u < delete_frac + update_frac, "update", "insert"))
    conv = np.char.add("conv-", np.char.zfill(conv_ix.astype(str), 6))
    role = ROLES[rng.integers(0, 4, size=n_events)]
    text = _texts(conv, turn, lsn)
    tool = np.where(role == "tool", "search", None)
    ts = EPOCH_US + lsn * 1_000_000
    is_del = op == "delete"

    # Duplicate + shuffle at the numpy-index level, then materialize the
    # Arrow table in bounded chunks: one contiguous string array of the
    # whole log can exceed the 2 GiB int32-offset limit at bench scale
    # (text carries 4 KiB salt cells), so never `take` the full table.
    idx = np.arange(n_events, dtype=np.int64)
    n_dup = int(n_events * dup_frac)
    if n_dup:
        dup_pos = rng.choice(n_events, size=n_dup, replace=False)
        idx = np.concatenate([idx, np.sort(dup_pos)])
    if shuffle:
        idx = idx[rng.permutation(len(idx))]

    if len(idx) == 0:
        return CHANGE_SCHEMA.empty_table()
    chunk = 500_000
    pieces = []
    for lo_i in range(0, len(idx), chunk):
        s = idx[lo_i : lo_i + chunk]
        d = is_del[s]
        pieces.append(
            pa.Table.from_arrays(
                [
                    pa.array(op[s], pa.string()),
                    pa.array(lsn[s], pa.int64()),
                    pa.array(conv[s], pa.string()),
                    pa.array(turn[s], pa.int32()),
                    pa.array(role[s], pa.string(), mask=d),
                    pa.array(text[s], pa.string(), mask=d),
                    pa.array(tool[s], pa.string(), mask=d),
                    pa.array(ts[s], pa.timestamp("us"), mask=d),
                ],
                schema=CHANGE_SCHEMA,
            )
        )
    return pa.concat_tables(pieces)


def write_change_log(
    changes: pa.Table, out_dir: str, n_files: int = 8, format: str = "parquet"
) -> list[str]:
    """Write the change log as ``n_files`` segment files bucketed by
    lsn RANGE (file i holds lsn bucket i) but with rows in arrival
    (shuffled) order inside — the reference's S3 interchange files,
    pre-bucketed so a reader can prune whole files by watermark.

    ``format="parquet"`` for columnar-scan segments,
    ``format="ipc"`` for Arrow IPC + lz4 — the tail-optimized WAL
    format (3-6× cheaper decode; see sources/changelog.py docstring),
    ``format="csv"`` for gzip CSV — the reference's interchange format
    (schema-driven decode in sources/changelog._read_csv_segments),
    ``format="jsonl"`` for gzip JSON-lines — the Debezium-style CDC
    feed shape (explicit-schema decode in _read_jsonl_segments).
    """
    import os

    import pyarrow.parquet as pq
    from pyarrow import feather

    if format not in ("parquet", "ipc", "csv", "jsonl", "orc"):
        raise ValueError(
            f"format must be 'parquet', 'ipc', 'csv', 'jsonl' or 'orc', got {format!r}"
        )
    ext = {"parquet": "parquet", "ipc": "arrow", "csv": "csv.gz", "jsonl": "jsonl.gz", "orc": "orc"}[format]
    os.makedirs(out_dir, exist_ok=True)
    if len(changes) == 0:  # empty log -> no segments (lsn.min() would raise)
        return []
    lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
    lo, hi = int(lsn.min()), int(lsn.max()) + 1
    width = max(1, (hi - lo + n_files - 1) // n_files)
    bucket = (lsn - lo) // width
    paths = []
    for b in range(n_files):
        part = changes.filter(pa.array(bucket == b))
        if len(part) == 0:
            continue
        path = os.path.join(out_dir, f"changes-{b:05d}-lsn-{lo + b * width}-{min(hi, lo + (b + 1) * width)}.{ext}")
        if format == "parquet":
            pq.write_table(part, path)
        elif format == "jsonl":
            import gzip
            import json

            # Debezium-style JSON-lines interchange; ts as ISO-8601 so
            # the reader's explicit-schema parse recovers timestamp[us]
            with gzip.open(path, "wt", encoding="utf-8") as f:
                for row in part.to_pylist():
                    if row.get("ts") is not None:
                        row["ts"] = row["ts"].isoformat()
                    f.write(json.dumps(row, ensure_ascii=False) + "\n")
        elif format == "csv":
            from pyarrow import csv as pa_csv

            with pa.CompressedOutputStream(path, "gzip") as f:
                pa_csv.write_csv(part, f)
        elif format == "orc":
            # the Hive/Hadoop-ecosystem interchange format (a CDC feed
            # landed by Hive/Spark jobs); decoded by
            # sources/changelog._read_orc_segments
            from pyarrow import orc as pa_orc

            pa_orc.write_table(part, path)
        else:
            feather.write_feather(part, path, compression="lz4")
        paths.append(path)
    return paths


def stream_change_log(
    n_events: int,
    out_dir: str,
    n_files: int = 128,
    format: str = "ipc",
    *,
    n_convs: int = 100,
    max_turns: int = 20,
    update_frac: float = 0.5,
    delete_frac: float = 0.1,
    hot_frac: float = 0.0,
    dup_frac: float = 0.0,
    seed: int = 42,
) -> list[str]:
    """Bounded-memory WAL writer for very large logs: generates and
    writes ONE lsn bucket at a time via ``generate_changes(start_lsn=
    bucket_lo, seed=per-bucket)``, so peak memory is one bucket
    (~n_events/n_files rows) instead of the whole log — the monolithic
    path OOMs the driver around 10^8 events (measured: 129 GB RSS at
    128M).  Same schema, same per-bucket shuffle/dup/hot semantics,
    same lsn-range file naming (pruning applies); duplicates replay
    within their bucket, which is the same same-lsn-twice scenario."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    width = (n_events + n_files - 1) // n_files
    paths: list[str] = []
    for b in range(n_files):
        lo = b * width
        hi = min(n_events, (b + 1) * width)
        if lo >= hi:
            break
        t = generate_changes(
            hi - lo,
            n_convs=n_convs,
            max_turns=max_turns,
            start_lsn=lo,
            update_frac=update_frac,
            delete_frac=delete_frac,
            hot_frac=hot_frac,
            dup_frac=dup_frac,
            seed=seed + 1_000_003 * b,
        )
        paths.extend(write_change_log(t, out_dir, n_files=1, format=format))
        del t
    return paths


def apply_changes_reference(base: pa.Table | None, changes: pa.Table) -> pd.DataFrame:
    """Sequential oracle: sort by (lsn, input order), apply events
    one-by-one to a dict keyed by (conv_id, turn_idx).  O(rows) python
    loop — test-only (FIXTURES.md §5)."""
    state: dict[tuple, dict] = {}
    if base is not None:
        for row in base.to_pylist():
            state[(row["conv_id"], row["turn_idx"])] = row
    df = changes.to_pandas().reset_index(drop=True)
    df = df.sort_values("lsn", kind="stable")  # stable → later input row wins on lsn ties
    for row in df.to_dict("records"):
        key = (row["conv_id"], row["turn_idx"])
        if row["op"] == "delete":
            state.pop(key, None)
        else:
            state[key] = {k: v for k, v in row.items() if k not in ("op", "lsn")}
    if not state:
        return pd.DataFrame(columns=[f.name for f in TRANSCRIPT_SCHEMA])
    out = pd.DataFrame(list(state.values()))
    return out.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
