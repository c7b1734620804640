"""Change-log (WAL/binlog tail) reader.

The reference's extract stage reads a full table snapshot from a DB
into a CSV (oracle/oracle.py:177-270); the engine's source instead
tails a directory of LSN-bucketed Parquet change files, pruning at
the read:

- **file-level pruning** by the lsn range encoded in the file name
  (``changes-<bucket>-lsn-<lo>-<hi>.parquet``, see
  datagen.write_change_log) — committed ranges are never even opened
  on resume;
- **row-group pruning + column projection** via
  ``ray.data.read_parquet(filter=..., columns=...)`` pushdown.

Segments come in two formats (datagen.write_change_log):

- ``.parquet`` — columnar-scan friendly; row-group pruning + column
  projection pushdown.
- ``.arrow`` — Arrow IPC with lz4 frames, the tail-optimized format:
  a WAL segment is written once and tailed once, so decode CPU (not
  scan compression) is what matters — IPC decode measures 3-6× faster
  than parquet on the same segments, and the replay's read stage is
  its single largest CPU consumer.  Decoded one segment per Ray task
  (the natural log-segment granularity), filtered after decode.
"""

from __future__ import annotations

import os
import re

_LSN_RANGE = re.compile(r"lsn-(\d+)-(\d+)\.(parquet|arrow|orc|csv(\.gz)?|jsonl(\.gz)?)$")


def prune_files_by_lsn(paths: list[str], min_lsn_exclusive: int) -> list[str]:
    """Drop files whose encoded lsn range lies entirely at or below
    the watermark. Files without an encoded range are kept."""
    out = []
    for p in paths:
        m = _LSN_RANGE.search(os.path.basename(p))
        # file name encodes [lo, hi) → max lsn in file is hi-1
        if m and int(m.group(2)) - 1 <= min_lsn_exclusive:
            continue
        out.append(p)
    return out


def read_change_log(
    path: str | list[str],
    *,
    min_lsn_exclusive: int = -1,
    columns: list[str] | None = None,
):
    """Dataset of change events with lsn > ``min_lsn_exclusive``."""
    import pyarrow.compute as pc
    import ray.data

    from ..state.fs import storage_for

    store = None
    if isinstance(path, str):
        # WAL dirs ride the same backend scheme as lake roots
        # (state/fs.py): a norename:// or s3:// WAL is listed and
        # decoded through its pyarrow FileSystem, so follow-mode can
        # tail object-store WALs on a multi-node cluster.
        st, phys = storage_for(path)
        if st.is_dir(phys):
            store = st
            paths = sorted(
                st.join(phys, f)
                for f in st.list_objects(phys)
                if f.endswith((".parquet", ".arrow", ".orc", ".csv", ".csv.gz", ".jsonl", ".jsonl.gz"))
            )
        elif st.exists(phys):
            # a scheme-prefixed SINGLE segment (s3://bucket/seg.parquet)
            # must ride the store too, not fall through to local paths
            if "://" in path:
                store = st
            paths = [phys if store is not None else path]
        else:
            raise FileNotFoundError(f"change log path does not exist: {path}")
    else:
        paths = list(path)
    if min_lsn_exclusive >= 0:
        paths = prune_files_by_lsn(paths, min_lsn_exclusive)
    if not paths:
        from ..schema import CHANGE_SCHEMA

        return ray.data.from_arrow(CHANGE_SCHEMA.empty_table())
    flt = (pc.field("lsn") > min_lsn_exclusive) if min_lsn_exclusive >= 0 else None
    pq_paths = [p for p in paths if p.endswith(".parquet")]
    ipc_paths = [p for p in paths if p.endswith(".arrow")]
    orc_paths = [p for p in paths if p.endswith(".orc")]
    csv_paths = [p for p in paths if p.endswith((".csv", ".csv.gz"))]
    jsonl_paths = [p for p in paths if p.endswith((".jsonl", ".jsonl.gz"))]
    parts = []
    pa_fs = store.pa_filesystem if store is not None else None
    if pq_paths:
        parts.append(
            ray.data.read_parquet(pq_paths, columns=columns, filter=flt, filesystem=pa_fs)
        )
    if ipc_paths:
        parts.append(_read_ipc_segments(ipc_paths, columns=columns, min_lsn_exclusive=min_lsn_exclusive, store=store))
    if orc_paths:
        parts.append(_read_orc_segments(orc_paths, columns=columns, min_lsn_exclusive=min_lsn_exclusive, store=store))
    if csv_paths:
        parts.append(_read_csv_segments(csv_paths, columns=columns, min_lsn_exclusive=min_lsn_exclusive, store=store))
    if jsonl_paths:
        parts.append(_read_jsonl_segments(jsonl_paths, columns=columns, min_lsn_exclusive=min_lsn_exclusive, store=store))
    if not parts:  # e.g. a directory holding only foreign files
        from ..schema import CHANGE_SCHEMA

        return ray.data.from_arrow(CHANGE_SCHEMA.empty_table())
    if len(parts) == 1:
        return parts[0]
    # one variadic union: chained .union(.union(...)) builds a nested
    # Union node that Ray's planner rejects (expects ≥2 children)
    return parts[0].union(*parts[1:])


def _read_csv_segments(paths: list[str], *, columns, min_lsn_exclusive: int, store=None):
    """CSV / gzip-CSV WAL segments as a Dataset — the reference's
    interchange format (get_csv_from_s3 → upsert-csv,
    databridge_etl_tools/postgres/postgres.py:497-573) as a tail
    source.  One decode task per segment (same granularity as the IPC
    path); parsing is schema-driven from CHANGE_SCHEMA (typed lsn /
    turn_idx / ts columns, unquoted-empty → null for nullable payload
    columns) rather than inferred per file, so every segment decodes
    to identical Arrow types regardless of which values it happens to
    contain.

    Encoding fallback (the reference retries latin-1 when a source
    CSV is not valid UTF-8, postgres/postgres.py:152-156): a segment
    whose bytes fail the UTF-8 parse is re-read with
    ``ReadOptions(encoding="latin-1")`` — latin-1 maps every byte, so
    the retry always succeeds and mojibake never aborts a tail."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from pyarrow import csv as pa_csv

    from ..schema import CHANGE_SCHEMA

    col_types = {f.name: f.type for f in CHANGE_SCHEMA}
    # the lsn filter needs the lsn column: force-include it at the
    # read, filter, then apply the caller's projection LAST (otherwise
    # columns=[...without lsn] + a watermark raises KeyError)
    read_cols = list(columns) if columns else None
    if read_cols is not None and min_lsn_exclusive >= 0 and "lsn" not in read_cols:
        read_cols = read_cols + ["lsn"]
    convert = pa_csv.ConvertOptions(
        column_types=col_types,
        strings_can_be_null=True,
        quoted_strings_can_be_null=False,
        include_columns=read_cols,
    )

    def _open(p):
        if store is not None:
            compression = "gzip" if p.endswith(".gz") else None
            return pa.input_stream(store.open_input(p), compression=compression)
        return pa.input_stream(p, compression="detect")

    def decode(b: pa.Table) -> pa.Table:
        tabs = []
        for p in b.column("path").to_pylist():
            try:
                with _open(p) as f:
                    t = pa_csv.read_csv(f, convert_options=convert)
            except pa.ArrowInvalid as e:
                if "UTF8" not in str(e) and "utf8" not in str(e):
                    raise
                # reference fallback: not UTF-8 -> decode as latin-1
                with _open(p) as f:
                    t = pa_csv.read_csv(
                        f,
                        read_options=pa_csv.ReadOptions(encoding="latin-1"),
                        convert_options=convert,
                    )
            if min_lsn_exclusive >= 0:
                t = t.filter(pc.greater(t.column("lsn"), min_lsn_exclusive))
            if columns:
                t = t.select(list(columns))
            tabs.append(t)
        return pa.concat_tables(tabs)

    items = ray.data.from_items(
        [{"path": p} for p in paths], override_num_blocks=len(paths)
    )
    return items.map_batches(decode, batch_format="pyarrow")


def _read_ipc_segments(paths: list[str], *, columns, min_lsn_exclusive: int, store=None):
    """Arrow-IPC WAL segments as a Dataset: one decode task per
    segment file (streaming — segments enter the pipeline as their
    task runs, with normal backpressure)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    # force-include lsn at the read when the watermark filter needs it;
    # the caller's projection applies after the filter
    read_cols = list(columns) if columns else None
    if read_cols is not None and min_lsn_exclusive >= 0 and "lsn" not in read_cols:
        read_cols = read_cols + ["lsn"]

    def decode(b: pa.Table) -> pa.Table:
        from pyarrow import feather

        tabs = []
        for p in b.column("path").to_pylist():
            if store is not None:
                with store.open_input_file(p) as f:  # feather seeks
                    t = feather.read_table(f, columns=read_cols)
            else:
                t = feather.read_table(p, columns=read_cols)
            if min_lsn_exclusive >= 0:
                t = t.filter(pc.greater(t.column("lsn"), min_lsn_exclusive))
            if columns:
                t = t.select(list(columns))
            tabs.append(t)
        return pa.concat_tables(tabs)

    items = ray.data.from_items(
        [{"path": p} for p in paths], override_num_blocks=len(paths)
    )
    return items.map_batches(decode, batch_format="pyarrow")


def _read_orc_segments(paths: list[str], *, columns, min_lsn_exclusive: int, store=None):
    """ORC WAL segments as a Dataset — the Hive/Hadoop-ecosystem
    interchange shape (a CDC feed landed by Hive/Spark jobs).  One
    decode task per segment with reader-side column projection (ORC
    is columnar); ORC stores timestamps at ns, so decoded columns are
    cast back to the CHANGE_SCHEMA field types (timestamp[us], exact
    nullability) before they join the union — every segment format
    yields byte-identical Arrow schemas."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from ..schema import CHANGE_SCHEMA

    # force-include lsn at the read when the watermark filter needs it;
    # the caller's projection applies after the filter
    read_cols = list(columns) if columns else None
    if read_cols is not None and min_lsn_exclusive >= 0 and "lsn" not in read_cols:
        read_cols = read_cols + ["lsn"]

    def decode(b: pa.Table) -> pa.Table:
        from pyarrow import orc as pa_orc

        tabs = []
        for p in b.column("path").to_pylist():
            if store is not None:
                with store.open_input_file(p) as f:  # ORC seeks
                    t = pa_orc.ORCFile(f).read(columns=read_cols)
            else:
                t = pa_orc.ORCFile(p).read(columns=read_cols)
            t = t.cast(pa.schema([CHANGE_SCHEMA.field(n) for n in t.column_names]))
            if min_lsn_exclusive >= 0:
                t = t.filter(pc.greater(t.column("lsn"), min_lsn_exclusive))
            if columns:
                t = t.select(list(columns))
            tabs.append(t)
        return pa.concat_tables(tabs)

    items = ray.data.from_items(
        [{"path": p} for p in paths], override_num_blocks=len(paths)
    )
    return items.map_batches(decode, batch_format="pyarrow")


def _read_jsonl_segments(paths: list[str], *, columns, min_lsn_exclusive: int, store=None):
    """Gzip JSON-lines WAL segments as a Dataset — the Debezium-style
    CDC feed shape (one JSON object per change event).  One decode
    task per segment; parsing is schema-driven from CHANGE_SCHEMA
    (``explicit_schema``: typed lsn / int32 turn_idx, ISO-8601 →
    timestamp[us], JSON null → Arrow null) so every segment decodes to
    identical Arrow types.  JSON has no reader-side projection —
    columns are selected right after decode, before the batch leaves
    the task."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from pyarrow import json as pa_json

    from ..schema import CHANGE_SCHEMA

    parse = pa_json.ParseOptions(explicit_schema=CHANGE_SCHEMA)

    def _open(p):
        if store is not None:
            compression = "gzip" if p.endswith(".gz") else None
            return pa.input_stream(store.open_input(p), compression=compression)
        return pa.input_stream(p, compression="detect")

    def decode(b: pa.Table) -> pa.Table:
        tabs = []
        for p in b.column("path").to_pylist():
            with _open(p) as f:
                t = pa_json.read_json(f, parse_options=parse)
            # order is load-bearing: filter on lsn BEFORE the caller's
            # projection (which may drop lsn) — same rule as CSV/IPC
            if min_lsn_exclusive >= 0:
                t = t.filter(pc.greater(t.column("lsn"), min_lsn_exclusive))
            if columns:
                t = t.select(list(columns))
            tabs.append(t)
        return pa.concat_tables(tabs)

    items = ray.data.from_items(
        [{"path": p} for p in paths], override_num_blocks=len(paths)
    )
    return items.map_batches(decode, batch_format="pyarrow")
