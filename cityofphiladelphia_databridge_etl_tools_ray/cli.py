"""Operator CLI — the engine's analog of the reference's click
command tree (reference databridge_etl_tools/cli.py:13-25, one group
per endpoint with shared context params).

Here the endpoints collapse to one: the partitioned Parquet lake.
Commands own the Ray session (guarded init — the library never calls
``ray.init``):

    python -m cityofphiladelphia_databridge_etl_tools_ray create-lake /lake --partitions 64
    python -m cityofphiladelphia_databridge_etl_tools_ray replay /lake 'wal/*.parquet' \
        --rename-map old_col=new_col --invalid-ops dead_letter
    python -m cityofphiladelphia_databridge_etl_tools_ray metrics /lake
    python -m cityofphiladelphia_databridge_etl_tools_ray watermarks /lake
    python -m cityofphiladelphia_databridge_etl_tools_ray vacuum /lake
    python -m cityofphiladelphia_databridge_etl_tools_ray query q1_pricing_summary --sf-dir ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys


_OWNS_RAY = False  # did THIS process's CLI start the Ray session?


def _ray_session(num_cpus: int | None):
    global _OWNS_RAY
    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": num_cpus} if num_cpus else {}
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", **kw)
        _OWNS_RAY = True
    return ray


def _shutdown(ray) -> None:
    """Shut down ONLY a session this CLI created.  When ``main()`` is
    embedded (tests, notebooks, another driver), the caller owns the
    session — shutting it down under them detonates the documented
    core-worker hard exit: a Ray Data stats-flush thread from the
    caller's earlier datasets lands after shutdown and
    ``core_worker_process.cc`` kills the WHOLE process ("The core
    worker has already been shutdown ... The process will exit"),
    which presented as pytest dying silently mid-suite.  The flag
    resets after the shutdown: a later embedded ``main()`` call in
    this process that finds a CALLER-initialized session (started
    after ours ended) must not mistake it for its own."""
    global _OWNS_RAY
    if _OWNS_RAY:
        ray.shutdown()
        _OWNS_RAY = False


def _parse_rename(pairs: list[str]) -> dict[str, str]:
    """``old=new`` pairs — the reference's column-mapping file
    (postgres/example_column_mapping.txt) as CLI flags."""
    out = {}
    for p in pairs or []:
        if "=" not in p:
            raise SystemExit(f"--rename-map wants old=new, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def cmd_create_lake(args) -> int:
    """Initialise a lake; PK and payload schema are configurable per
    lake (the reference's per-job ``--primary_key``,
    ago/ago_commands.py:41, and catalog-derived column list,
    postgres/_properties.py:88-101).  ``--schema-from`` infers the
    payload schema from an existing parquet file (e.g. a WAL segment),
    dropping the CDC metadata columns."""
    from .state.lake import TranscriptLake

    kw = {}
    if args.primary_key:
        kw["primary_key"] = [c.strip() for c in args.primary_key.split(",") if c.strip()]
    if args.schema_from:
        import pyarrow as pa
        import pyarrow.parquet as pq

        s = pq.read_schema(args.schema_from)
        kw["schema"] = pa.schema([f for f in s if f.name not in ("op", "lsn", "_part")])
    lake = TranscriptLake.create(args.root, num_partitions=args.partitions, **kw)
    print(
        json.dumps(
            {
                "root": args.root,
                "num_partitions": args.partitions,
                "primary_key": lake.primary_key,
                "columns": lake.base_schema.names,
            }
        )
    )
    return 0


def cmd_replay(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .pipelines.replay import follow_wal, replay_into_lake
    from .sources.changelog import read_change_log

    kwargs = dict(
        rename_map=_parse_rename(args.rename_map),
        invalid_ops=args.invalid_ops,
        dead_letter_dir=args.dead_letter_dir,
        mode=args.mode,
        compact_after=args.compact_after,
        assume_tz=args.assume_tz,
    )
    if args.follow:
        metrics = follow_wal(
            args.root,
            args.wal,
            poll_interval=args.poll_interval,
            max_cycles=args.max_cycles,
            idle_stop=args.idle_stop,
            **kwargs,
        )
    else:
        metrics = replay_into_lake(args.root, read_change_log(args.wal), **kwargs)
    print(metrics.to_json(orient="records"))
    _shutdown(ray)
    return 0


def cmd_metrics(args) -> int:
    from .state.lake import TranscriptLake

    print(json.dumps(TranscriptLake(args.root).metrics(), indent=2, default=str))
    return 0


def cmd_export_schema(args) -> int:
    from .state.lake import TranscriptLake

    print(json.dumps(TranscriptLake(args.root).export_json_schema(), indent=2))
    return 0


def cmd_watermarks(args) -> int:
    from .state.lake import TranscriptLake

    print(json.dumps(TranscriptLake(args.root).watermarks()))
    return 0


def cmd_compact(args) -> int:
    """Fold delta runs across partitions — one Ray task per
    multi-run partition (the rescale fan-out pattern), not a driver
    loop: compaction of a 10^4-partition lake is embarrassingly
    parallel and each unit is an independent write-aside +
    manifest-swap."""
    from .state.lake import TranscriptLake

    lake = TranscriptLake(args.root)
    todo = [p for p in range(lake.num_partitions) if lake.run_count(p) > 1]
    if len(todo) <= 1:
        fold = (
            lake.compact_partition_adaptive
            if args.policy == "tiered"
            else lake.compact_partition
        )
        done = [p for p in todo if fold(p)]
    else:
        ray = _ray_session(args.num_cpus)
        import pyarrow as pa
        import ray.data as rd

        root, policy = args.root, args.policy

        def run(b: pa.Table) -> pa.Table:
            lk = TranscriptLake(root)
            fold = (
                lk.compact_partition_adaptive
                if policy == "tiered"
                else lk.compact_partition
            )
            out = [int(p) for p in b.column("p").to_pylist() if fold(int(p))]
            return pa.table({"p": pa.array(out, pa.int64())})

        done = sorted(
            rd.from_items([{"p": p} for p in todo], override_num_blocks=len(todo))
            .map_batches(run, batch_format="pyarrow", batch_size=1)
            .to_pandas()["p"]
            .tolist()
        )
        _shutdown(ray)
    print(json.dumps({"compacted_partitions": done, "policy": args.policy}))
    return 0


def cmd_rescale(args) -> int:
    """Online partition rescale (split or coalesce by an integer
    factor) — generation-flip protocol, crash-safe / resumable."""
    ray = _ray_session(args.num_cpus)

    from .state.lake import TranscriptLake

    lake = TranscriptLake(args.root)
    if args.mode == "split":
        res = lake.split_partitions(args.factor)
    elif args.mode == "coalesce":
        res = lake.coalesce_partitions(args.factor)
    else:  # abort: discard an in-progress rescale's partial progress
        res = {"aborted_files": len(lake.abort_rescale())}
    if args.vacuum:
        res["vacuumed_files"] = len(lake.vacuum())
    print(json.dumps(res))
    _shutdown(ray)
    return 0


def cmd_snapshot(args) -> int:
    """Snapshot lifecycle: record / list / drop lake snapshots
    (metadata-only, Iceberg-style; time-travel reads via
    ``publish --snapshot`` or ``TranscriptLake.dataset(snapshot=)``)."""
    from .state.lake import TranscriptLake

    lake = TranscriptLake(args.root)
    if args.action == "create":
        print(json.dumps({"snapshot_id": lake.snapshot(note=args.note or "")}))
    elif args.action == "list":
        print(json.dumps(lake.snapshots()))
    else:  # drop
        if args.id is None:
            print("snapshot drop requires --id", file=sys.stderr)
            return 2
        lake.drop_snapshot(args.id)
        print(json.dumps({"dropped": args.id}))
    return 0


def cmd_lookup(args) -> int:
    """Point lookup by primary-key-prefix values: reads only the
    owning hash partitions (the reference's AGO per-row PK lookup,
    lake-native)."""
    ray = _ray_session(args.num_cpus)

    from .state.lake import TranscriptLake

    lake = TranscriptLake(args.root)
    cols = args.columns.split(",") if args.columns else None
    ds = lake.lookup(args.values, columns=cols)
    df = ds.to_pandas()
    print(df.to_csv(index=False))
    _shutdown(ray)
    return 0


def cmd_fsck(args) -> int:
    """Integrity audit: manifest-referenced files exist, hashes and
    row counts match, lineage watermarks are monotonic."""
    from .state.lake import TranscriptLake

    res = TranscriptLake(args.root).fsck(verify_hashes=not args.fast)
    print(json.dumps(res))
    return 0 if res["ok"] else 1


def cmd_view_create(args) -> int:
    from .pipelines.matview import create_view

    create_view(args.root, num_partitions=args.partitions)
    print(json.dumps({"root": args.root, "num_partitions": args.partitions}))
    return 0


def cmd_view_maintain(args) -> int:
    """Fold new WAL segments into the materialized view — O(delta);
    already-applied lsn ranges are no-ops (watermark-filtered), so
    re-running after a crash or over an overlapping glob is safe."""
    _ray_session(args.num_cpus)
    from .pipelines.matview import maintain_view, read_view
    from .sources.changelog import read_change_log

    applied = maintain_view(args.root, read_change_log(args.wal))
    print(json.dumps({"applied": applied, "view_keys": len(read_view(args.root))}))
    return 0


def cmd_vacuum(args) -> int:
    from .state.lake import TranscriptLake

    removed = TranscriptLake(args.root).vacuum()
    print(json.dumps({"removed": removed}))
    return 0


def cmd_publish(args) -> int:
    """Publish lake state (or a registered query result) as gzip CSV
    parts — the reference's OpenData upload command
    (opendata/opendata.py:68-75, 249-263)."""
    ray = _ray_session(args.num_cpus)
    from .stages.publish import write_csv_gzip

    if args.query:
        from .pipelines.queries import QUERIES

        if args.query not in QUERIES:
            raise SystemExit(f"unknown query {args.query!r}; one of {sorted(QUERIES)}")
        ds = QUERIES[args.query](args.sf_dir)
        if not hasattr(ds, "map_batches"):  # pandas/Arrow result → tiny
            import ray.data as rd

            ds = rd.from_pandas(ds) if hasattr(ds, "to_csv") else rd.from_arrow(ds)
    else:
        from .state.lake import TranscriptLake

        ds = TranscriptLake(args.root).dataset(snapshot=args.snapshot)
    manifest = write_csv_gzip(ds, args.out, level=args.gzip_level)
    print(
        json.dumps(
            {
                "parts": len(manifest),
                "rows": int(manifest["rows"].sum()),
                "bytes_gz": int(manifest["bytes_gz"].sum()),
                "out": args.out,
            }
        )
    )
    _shutdown(ray)
    return 0


def cmd_query(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .pipelines.queries import QUERIES

    if args.name not in QUERIES:
        raise SystemExit(f"unknown query {args.name!r}; one of {sorted(QUERIES)}")

    def to_arrow(obj):
        # one sniff for every non-Dataset result shape (pandas / arrow)
        import pyarrow as pa

        return obj if isinstance(obj, pa.Table) else pa.Table.from_pandas(obj)

    res = QUERIES[args.name](args.sf_dir)
    is_ds = hasattr(res, "write_parquet")  # ray Dataset
    if args.out:
        # refuse a non-empty target: write_parquet appends uniquely
        # named files, so rerunning into a stale dir would silently
        # mix (and double-count) two exports
        if os.path.isdir(args.out) and os.listdir(args.out):
            raise SystemExit(f"--out {args.out!r} exists and is not empty")
        # scale-correct export: a Dataset streams straight to
        # partitioned parquet (never materialized on the driver);
        # small pandas/arrow results write one file
        if is_ds:
            res.write_parquet(args.out)
            # row count from the written footers — a Dataset is lazy,
            # so res.count() here would re-execute the whole pipeline
            import glob as _glob

            import pyarrow.parquet as pq

            n = sum(
                pq.ParquetFile(f).metadata.num_rows
                for f in _glob.glob(os.path.join(args.out, "*.parquet"))
            )
        else:
            import pyarrow.parquet as pq

            t = to_arrow(res)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(t, os.path.join(args.out, "part-0.parquet"))
            n = len(t)
        print(f"wrote {n} rows to {args.out}")
    else:
        if is_ds:
            # materialize ONCE: limit() then reads cached blocks and
            # count() is metadata-only (lazy limit+count would execute
            # the pipeline twice)
            res = res.materialize()
            df = res.limit(args.limit).to_pandas()
            total = res.count()
        else:
            t = to_arrow(res)
            total = len(t)
            df = t.slice(0, args.limit).to_pandas()
        print(df.to_string())
        print(f"... {total} rows")
    _shutdown(ray)
    return 0


def cmd_diff(args) -> int:
    """Keyed snapshot diff of two parquet tables (the reference's
    recorddiff / upsert-verification flow): classify every key as
    insert / delete / update and stream the changed rows to
    partitioned parquet or print a summary."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .functions.cluster import parallelism
    from .pipelines.diff import snapshot_diff

    a = rd.read_parquet(args.a)
    b = rd.read_parquet(args.b)
    value_cols = args.columns.split(",") if args.columns else [
        c for c in a.schema().names if c != args.key
    ]
    n_buckets = 1 << (parallelism(4.0, lo=16) - 1).bit_length()
    out = snapshot_diff(a, b, key=args.key, value_cols=value_cols, n_buckets=n_buckets)
    if args.out:
        if os.path.isdir(args.out) and os.listdir(args.out):
            raise SystemExit(f"--out {args.out!r} exists and is not empty")
        out.write_parquet(args.out)
        print(f"diff written to {args.out}")
    else:
        m = out.materialize()
        counts = (
            m.groupby("diff_kind").count().to_pandas().set_index("diff_kind")["count()"]
        )
        print(
            json.dumps(
                {k: int(counts.get(k, 0)) for k in ("insert", "update", "delete")}
            )
        )
    _shutdown(ray)
    return 0


def cmd_change_feed(args) -> int:
    """CDC egress: net per-key insert/update/delete feed between the
    WAL's AS-OF states at two LSNs (bloom-pruned to touched keys,
    one shuffle) — written as parquet or summarized."""
    ray = _ray_session(args.num_cpus)

    from .pipelines.diff import change_feed
    from .sources.changelog import read_change_log

    out = change_feed(read_change_log(args.wal), args.from_lsn, args.to_lsn)
    if args.out:
        if os.path.isdir(args.out) and os.listdir(args.out):
            raise SystemExit(f"--out {args.out!r} exists and is not empty")
        out.write_parquet(args.out)
        print(f"change feed written to {args.out}")
    else:
        m = out.materialize()
        counts = (
            m.groupby("change_op").count().to_pandas().set_index("change_op")["count()"]
        )
        print(
            json.dumps(
                {k: int(counts.get(k, 0)) for k in ("insert", "update", "delete")}
            )
        )
    _shutdown(ray)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cityofphiladelphia_databridge_etl_tools_ray")
    p.add_argument("--num-cpus", type=int, default=None, help="ray.init num_cpus (local)")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create-lake", help="initialise an empty partitioned lake")
    c.add_argument("root")
    c.add_argument("--partitions", type=int, default=32)
    c.add_argument(
        "--primary-key",
        default=None,
        metavar="COL[,COL...]",
        help="per-lake primary key columns (default: conv_id,turn_idx)",
    )
    c.add_argument(
        "--schema-from",
        default=None,
        metavar="PARQUET",
        help="infer the payload schema from this parquet file (op/lsn dropped)",
    )
    c.set_defaults(fn=cmd_create_lake)

    c = sub.add_parser("replay", help="replay a change log into the lake (exactly-once)")
    c.add_argument("root")
    c.add_argument("wal", help="change-log parquet path/glob/dir")
    c.add_argument("--rename-map", nargs="*", default=[], metavar="OLD=NEW")
    c.add_argument(
        "--invalid-ops",
        choices=["error", "drop", "dead_letter"],
        default="error",
        help="route for rows with unknown op values",
    )
    c.add_argument("--dead-letter-dir", default=None)
    c.add_argument(
        "--mode",
        choices=["merge", "delta", "snapshot", "patch"],
        default="merge",
        help=(
            "merge = copy-on-write partition rewrite; delta = O(batch) run append "
            "with merge-on-read; patch = sparse-diff stream (NULL keeps prior value)"
        ),
    )
    c.add_argument("--compact-after", type=int, default=8, help="fold delta runs after this many")
    c.add_argument(
        "--assume-tz",
        default=None,
        help="localize naive timestamps as this zone (e.g. US/Eastern), normalized to UTC",
    )
    c.add_argument(
        "--follow",
        action="store_true",
        help="continuous tail: poll the WAL dir and replay new segments until idle",
    )
    c.add_argument("--poll-interval", type=float, default=2.0, help="seconds between cycles")
    c.add_argument("--max-cycles", type=int, default=None)
    c.add_argument(
        "--idle-stop",
        type=int,
        default=3,
        help="stop after this many consecutive cycles with nothing to apply",
    )
    c.set_defaults(fn=cmd_replay)

    c = sub.add_parser("compact", help="fold delta runs into base runs")
    c.add_argument("root")
    c.add_argument(
        "--policy",
        choices=["full", "tiered"],
        default="full",
        help="full = rewrite each partition; tiered = fold small deltas, rewrite base only when warranted",
    )
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_compact)

    c = sub.add_parser(
        "rescale", help="online partition split/coalesce (generation flip, resumable)"
    )
    c.add_argument("root")
    c.add_argument("mode", choices=["split", "coalesce", "abort"])
    c.add_argument("--factor", type=int, default=2)
    c.add_argument("--vacuum", action="store_true", help="reclaim stale generations after")
    c.set_defaults(fn=cmd_rescale)

    c = sub.add_parser("metrics", help="per-partition lineage + lag metrics")
    c.add_argument("root")
    c.set_defaults(fn=cmd_metrics)

    c = sub.add_parser("export-schema", help="frictionless JSON Table Schema of the lake")
    c.add_argument("root")
    c.set_defaults(fn=cmd_export_schema)

    c = sub.add_parser("watermarks", help="committed high-LSN per partition")
    c.add_argument("root")
    c.set_defaults(fn=cmd_watermarks)

    c = sub.add_parser("fsck", help="verify file hashes, row counts, watermark monotonicity")
    c.add_argument("root")
    c.add_argument("--fast", action="store_true", help="skip content-hash verification")
    c.set_defaults(fn=cmd_fsck)

    c = sub.add_parser("vacuum", help="delete orphaned data files")
    c.add_argument("root")
    c.set_defaults(fn=cmd_vacuum)

    c = sub.add_parser("snapshot", help="record / list / drop time-travel snapshots")
    c.add_argument("action", choices=["create", "list", "drop"])
    c.add_argument("root")
    c.add_argument("--note", default="", help="free-text note stored with the snapshot")
    c.add_argument("--id", type=int, default=None, help="snapshot id (for drop)")
    c.set_defaults(fn=cmd_snapshot)

    c = sub.add_parser("lookup", help="point lookup by primary-key values (routed read)")
    c.add_argument("root")
    c.add_argument("values", nargs="+", help="primary_key[0] values to fetch")
    c.add_argument("--columns", default=None, help="comma-separated output columns")
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_lookup)

    c = sub.add_parser("view-create", help="initialise an incremental materialized view")
    c.add_argument("root")
    c.add_argument("--partitions", type=int, default=16)
    c.set_defaults(fn=cmd_view_create)

    c = sub.add_parser("view-maintain", help="fold WAL segments into the view (O(delta), idempotent)")
    c.add_argument("root")
    c.add_argument("wal", help="WAL glob/dir (parquet / ipc.lz4 / csv.gz / jsonl.gz)")
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_view_maintain)

    c = sub.add_parser("publish", help="publish lake/query as gzip-CSV parts (OpenData analog)")
    c.add_argument("--root", default=None, help="lake root to publish")
    c.add_argument("--query", default=None, help="publish a registered query result instead")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.001", help="input tables for --query")
    c.add_argument("--out", required=True)
    c.add_argument("--gzip-level", type=int, default=7)
    c.add_argument(
        "--snapshot", type=int, default=None, help="publish a time-travel snapshot of the lake"
    )
    c.set_defaults(fn=cmd_publish)

    c = sub.add_parser("diff", help="keyed snapshot diff of two parquet tables (recorddiff)")
    c.add_argument("a", help="parquet path of snapshot A (old)")
    c.add_argument("b", help="parquet path of snapshot B (new)")
    c.add_argument("--key", required=True, help="int64 primary-key column")
    c.add_argument("--columns", default=None, help="comma-separated value columns (default: all non-key)")
    c.add_argument("--out", default=None, help="write changed rows to partitioned parquet")
    c.set_defaults(fn=cmd_diff)

    c = sub.add_parser(
        "change-feed", help="CDC egress: net key diff between two WAL versions"
    )
    c.add_argument("wal", help="change-log parquet path/glob/dir")
    c.add_argument("--from-lsn", type=int, required=True)
    c.add_argument("--to-lsn", type=int, required=True)
    c.add_argument("--out", default=None, help="write partitioned parquet here")
    c.set_defaults(fn=cmd_change_feed)

    c = sub.add_parser("query", help="run a registered analytic pipeline")
    c.add_argument("name")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    c.add_argument("--limit", type=int, default=20)
    c.add_argument("--out", default=None, help="stream the result to partitioned parquet instead of printing")
    c.set_defaults(fn=cmd_query)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
