"""Benchmark harness.

Headline: sustained CDC upsert throughput — replay a deterministic
change log (datagen, cached under /tmp) into a fresh partitioned lake
via the full normalize → shuffle → merge → commit path.  Also times
every registered query over ``$GRAFT_SF_DIR``.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "num_cpus": N,
   "replay": {...events/sec...}}

``--scaling``: run the replay at 8 and 32 CPUs in fresh processes on
the same input and report throughputs + efficiency = (T8/T32)/4
(the sandbox stand-in for the N vs 4N node criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_DIR = "/tmp/graft_bench"
# Sized so the replay runs ~1 min at 32 CPUs: short enough for the
# per-round driver, long enough that startup/ramp overheads stop
# dominating the sustained-throughput and scaling-efficiency numbers.
N_EVENTS = int(os.environ.get("GRAFT_BENCH_EVENTS", "16000000"))
N_CONVS = int(os.environ.get("GRAFT_BENCH_CONVS", "200000"))
N_PARTITIONS = int(os.environ.get("GRAFT_BENCH_PARTITIONS", "128"))
WAL_FILES = 128
# WAL segment format: Arrow IPC + lz4 ("ipc") decodes 3-6x faster than
# parquet — the replay's read stage is its largest CPU consumer (see
# sources/changelog.py).  GRAFT_WAL_FORMAT=parquet to compare.
WAL_FORMAT = os.environ.get("GRAFT_WAL_FORMAT", "ipc")


def build_wal() -> str:
    """Deterministic change log, cached across runs/processes."""
    wal_dir = os.path.join(BENCH_DIR, f"wal-{N_EVENTS}-{N_CONVS}-{WAL_FORMAT}")
    done = os.path.join(wal_dir, ".done")
    if os.path.exists(done):
        return wal_dir
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
        generate_changes,
        stream_change_log,
        write_change_log,
    )

    shutil.rmtree(wal_dir, ignore_errors=True)
    gen_kwargs = dict(
        n_convs=N_CONVS,
        max_turns=50,
        update_frac=0.5,
        delete_frac=0.1,
        hot_frac=0.1,
        dup_frac=0.02,
        seed=42,
    )
    if N_EVENTS > 64_000_000:
        # monolithic generation OOMs the 128 GB driver around 10^8
        # events (129 GB RSS measured at 128M; 64M fits and is kept
        # monolithic so the recorded BENCH_LOCAL_r5_64m input stays
        # byte-reproducible); the streamed writer generates one lsn
        # bucket at a time
        stream_change_log(
            N_EVENTS, wal_dir, n_files=WAL_FILES, format=WAL_FORMAT, **gen_kwargs
        )
    else:
        changes = generate_changes(N_EVENTS, **gen_kwargs)
        write_change_log(changes, wal_dir, n_files=WAL_FILES, format=WAL_FORMAT)
    with open(done, "w") as f:
        f.write("ok")
    return wal_dir


def run_replay(num_cpus: int) -> dict:
    """Measure SUSTAINED replay throughput: one untimed warmup pass
    (faults worker heap pages once — a 10^10-event replay is in that
    steady state for its entire life), then a timed pass into a fresh
    lake.  The warmup wall time is reported as ``cold_replay_sec``."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_into_lake
    from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import read_change_log
    from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake

    wal_dir = build_wal()
    # warm OS page cache so we measure compute + shuffle, not cold disk
    read_change_log(wal_dir).count()

    reps = 1 + int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    results = []
    last_lake = None
    for rep in range(reps):
        lake_root = os.path.join(BENCH_DIR, f"lake-{num_cpus}-{os.getpid()}-{rep}")
        shutil.rmtree(lake_root, ignore_errors=True)
        TranscriptLake.create(lake_root, num_partitions=N_PARTITIONS)
        t0 = time.perf_counter()
        replay_into_lake(lake_root, read_change_log(wal_dir))
        dt = time.perf_counter() - t0
        rows = TranscriptLake(lake_root).total_rows()
        if last_lake:
            shutil.rmtree(last_lake, ignore_errors=True)
        last_lake = lake_root
        results.append((dt, rows))
    cold = results[0]
    timed = sorted(dt for dt, _ in results[1:])
    dt = timed[len(timed) // 2]  # median of warm reps

    # incremental tail: 1/16th of the events arriving after the full
    # load, appended as O(batch) delta runs — the steady-state shape
    # of a real WAL tail against an existing lake.
    tail_wal = build_tail_wal()
    read_change_log(tail_wal).count()
    t0 = time.perf_counter()
    replay_into_lake(last_lake, read_change_log(tail_wal), mode="delta")
    tail_dt = time.perf_counter() - t0
    shutil.rmtree(last_lake, ignore_errors=True)

    # patch-mode leg (one rep): the sparse-diff ingest path — same WAL
    # (full-row events are valid patches), exercising the associative
    # lsn-stamped state combiner + merge_partition_patch end-to-end.
    patch_dt = None
    if os.environ.get("GRAFT_BENCH_PATCH", "1") != "0":
        lake_root = os.path.join(BENCH_DIR, f"patchlake-{num_cpus}-{os.getpid()}")
        shutil.rmtree(lake_root, ignore_errors=True)
        TranscriptLake.create(lake_root, num_partitions=N_PARTITIONS)
        t0 = time.perf_counter()
        replay_into_lake(lake_root, read_change_log(wal_dir), mode="patch")
        patch_dt = time.perf_counter() - t0
        shutil.rmtree(lake_root, ignore_errors=True)

    return {
        "patch_replay_sec": round(patch_dt, 2) if patch_dt else None,
        "patch_events_per_sec": round(N_EVENTS / patch_dt) if patch_dt else None,
        "events": N_EVENTS,
        "replay_sec": round(dt, 2),
        "events_per_sec": round(N_EVENTS / dt),
        "cold_replay_sec": round(cold[0], 2),
        "warm_reps_sec": [round(x, 2) for x in timed],
        "tail_events": N_EVENTS // 16,
        "tail_sec": round(tail_dt, 2),
        "tail_events_per_sec": round((N_EVENTS // 16) / tail_dt),
        "lake_rows": results[-1][1],
    }


def build_tail_wal() -> str:
    tail_n = N_EVENTS // 16
    wal_dir = os.path.join(BENCH_DIR, f"tailwal-{tail_n}-{N_CONVS}-{WAL_FORMAT}")
    done = os.path.join(wal_dir, ".done")
    if os.path.exists(done):
        return wal_dir
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
        generate_changes,
        write_change_log,
    )

    shutil.rmtree(wal_dir, ignore_errors=True)
    changes = generate_changes(
        tail_n,
        n_convs=N_CONVS,
        max_turns=50,
        start_lsn=N_EVENTS,
        update_frac=0.7,
        delete_frac=0.1,
        hot_frac=0.1,
        seed=43,
    )
    write_change_log(changes, wal_dir, n_files=max(WAL_FILES // 16, 4), format=WAL_FORMAT)
    with open(done, "w") as f:
        f.write("ok")
    return wal_dir


def run_queries(sf_dir: str) -> dict:
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import QUERIES

    out = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "materialize"):
            res.materialize()
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def main():
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    replay = run_replay(num_cpus)
    queries = {} if os.environ.get("GRAFT_BENCH_QUERIES", "1") == "0" else run_queries(sf_dir)
    result = {
        "metric": "cdc_replay_sec",
        "value": replay["replay_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "replay": replay,
    }
    ray.shutdown()
    print(json.dumps(result))


def scaling():
    """Two-parallelism scaling protocol (the sandbox stand-in for the
    N vs 4N node criterion).

    The host's first-touch page-fault serialization makes any single
    32-CPU rep swing several-fold with host phase (BASELINE.md), so a
    single 8-vs-32 pair is not a measurement.  Protocol: INTERLEAVED
    A/B pairs — each rep runs 8 CPUs then 32 CPUs back-to-back in
    fresh processes (one untimed warmup pass each, then one timed
    pass), so both legs of a pair see the same host phase.  Reported:
    per-pair efficiencies, their median (robust to phase drift between
    pairs), the median-of-times efficiency, and the full range.
    """
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    # The N / 4N parallelism pair.  Default 4→16: the host's OWN
    # pure-CPU strong-scaling ceiling (preallocated multiprocessing
    # matmul, no Ray) measures 0.81 at 4→16 but only 0.73 at 8→32,
    # and its aggregate memcpy bandwidth is already saturated by 8
    # processes — so the 8→32 substitution measures the hypervisor,
    # not the engine.  At 4→16 both legs sit below the host ceilings
    # and the criterion is measured cleanly (still N vs 4N on the
    # same input).  Override: GRAFT_SCALING_NCPUS="8,32".
    lo_n, hi_n = (
        int(x) for x in os.environ.get("GRAFT_SCALING_NCPUS", "4,16").split(",")
    )
    ratio = hi_n / lo_n

    def run_once(ncpu: int) -> float:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_QUERIES="0",
            GRAFT_BENCH_REPS="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return float(json.loads(out.strip().splitlines()[-1])["replay"]["replay_sec"])

    t_lo, t_hi = [], []
    for _ in range(reps):
        t_lo.append(run_once(lo_n))
        t_hi.append(run_once(hi_n))

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    pair_eff = [round((a / b) / ratio, 3) for a, b in zip(t_lo, t_hi)]
    med_lo, med_hi = med(t_lo), med(t_hi)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "events": N_EVENTS,
                "reps": reps,
                "ncpus": [lo_n, hi_n],
                f"sec_{lo_n}": t_lo,
                f"sec_{hi_n}": t_hi,
                f"events_per_sec_{lo_n}": round(N_EVENTS / med_lo),
                f"events_per_sec_{hi_n}": round(N_EVENTS / med_hi),
                "pair_efficiencies": pair_eff,
                "scaling_efficiency": med(pair_eff),
                "scaling_efficiency_of_medians": round((med_lo / med_hi) / ratio, 3),
                "efficiency_range": [min(pair_eff), max(pair_eff)],
            }
        )
    )


def skew():
    """Skew-mitigation evidence (`bench.py --skew`): replay a HOT
    change log — 40% of all events target one conv_id — through (a)
    the plain merge, (b) the skew-aware combiner only (default path),
    and (c) combiner + salted two-phase merge, and report wall time
    per leg plus the max single merge-task time from the metrics rows.
    The north rule requires explicit skew handling; this is its
    reproducible measurement."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
        generate_changes,
        write_change_log,
    )
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_into_lake
    from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import read_change_log
    from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake

    n = int(os.environ.get("GRAFT_SKEW_EVENTS", "4000000"))
    wal_dir = os.path.join(BENCH_DIR, f"skewwal-{n}-{WAL_FORMAT}")
    if not os.path.exists(os.path.join(wal_dir, ".done")):
        shutil.rmtree(wal_dir, ignore_errors=True)
        ch = generate_changes(
            n, n_convs=50000, max_turns=50, update_frac=0.7, hot_frac=0.4, seed=11
        )
        write_change_log(ch, wal_dir, n_files=64, format=WAL_FORMAT)
        with open(os.path.join(wal_dir, ".done"), "w") as f:
            f.write("ok")
        del ch  # a 64M-event table is ~90 GB — do not hold it through the legs
    read_change_log(wal_dir).count()  # warm page cache

    legs = {}
    for name, scheme, kwargs in (
        ("combiner_only", "", {}),
        ("combiner_salted8", "", {"salt": 8}),
        # the same hot WAL through the rename-free versioned-pointer
        # commit protocol: skew handling must not depend on POSIX
        ("combiner_objectstore", "norename://", {}),
    ):
        times, max_merge = [], []
        for rep in range(3):
            base = os.path.join(BENCH_DIR, f"skewlake-{name}-{rep}")
            shutil.rmtree(base, ignore_errors=True)
            root = scheme + base
            TranscriptLake.create(root, num_partitions=N_PARTITIONS)
            t0 = time.perf_counter()
            m = replay_into_lake(root, read_change_log(wal_dir), **kwargs)
            times.append(round(time.perf_counter() - t0, 2))
            max_merge.append(round(float(m["merge_sec"].max()), 2))
            shutil.rmtree(base, ignore_errors=True)
        med = sorted(times)[1]
        legs[name] = {
            "replay_sec": times,
            "median_sec": med,
            "events_per_sec": round(n / med),
            "max_merge_task_sec": max_merge,
        }
    print(
        json.dumps(
            {"metric": "skew_mitigation", "events": n, "hot_frac": 0.4, "legs": legs}
        )
    )
    ray.shutdown()


def objectstore():
    """Object-store backend overhead (`bench.py --objectstore`): the
    SAME replay into a POSIX lake vs a ``norename://`` lake (the
    versioned-pointer commit log driven through the pyarrow FileSystem
    API with rename disabled — state/fs.py).  Quantifies what the
    rename-free commit protocol costs per partition commit; on a real
    cluster the absolute numbers shift with object-store latency, but
    the PROTOCOL cost (1 LIST + 1 PUT per pointer write, 1 LIST + 1
    GET per pointer read) is what this leg isolates."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from cityofphiladelphia_databridge_etl_tools_ray.datagen import (
        generate_changes,
        write_change_log,
    )
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import replay_into_lake
    from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import read_change_log
    from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake

    n = int(os.environ.get("GRAFT_OBJ_EVENTS", "4000000"))
    wal_dir = os.path.join(BENCH_DIR, f"objwal-{n}-{WAL_FORMAT}")
    if not os.path.exists(os.path.join(wal_dir, ".done")):
        shutil.rmtree(wal_dir, ignore_errors=True)
        ch = generate_changes(
            n, n_convs=50000, max_turns=50, update_frac=0.5, delete_frac=0.1, seed=17
        )
        write_change_log(ch, wal_dir, n_files=64, format=WAL_FORMAT)
        with open(os.path.join(wal_dir, ".done"), "w") as f:
            f.write("ok")
        del ch  # a 64M-event table is ~90 GB — do not hold it through the legs
    read_change_log(wal_dir).count()  # warm page cache

    legs = {}
    rows = {}
    for name, scheme in (("posix", ""), ("objectstore_norename", "norename://")):
        times = []
        for rep in range(3):
            base = os.path.join(BENCH_DIR, f"objlake-{name}-{rep}")
            shutil.rmtree(base, ignore_errors=True)
            root = scheme + base
            TranscriptLake.create(root, num_partitions=N_PARTITIONS)
            t0 = time.perf_counter()
            replay_into_lake(root, read_change_log(wal_dir))
            times.append(round(time.perf_counter() - t0, 2))
            rows[name] = TranscriptLake(root).total_rows()
            shutil.rmtree(base, ignore_errors=True)
        med = sorted(times)[1]
        legs[name] = {
            "replay_sec": times,
            "median_sec": med,
            "events_per_sec": round(n / med),
        }
    assert rows["posix"] == rows["objectstore_norename"], rows
    legs["overhead_ratio"] = round(
        legs["objectstore_norename"]["median_sec"] / legs["posix"]["median_sec"], 3
    )

    # live s3:// leg (loopback endpoint, scripts/minis3.py): the SAME
    # replay through a genuine pyarrow S3FileSystem — URI parsing, AWS
    # SDK HTTP, multipart writes, ranged reads.  One rep at a bounded
    # event count (the endpoint holds objects in memory); the point is
    # the protocol running end-to-end over s3://, not raw throughput —
    # absolute numbers are dominated by the single-host HTTP stub.
    # Skippable via GRAFT_S3_LEG=0 (e.g. for very large -size runs).
    if os.environ.get("GRAFT_S3_LEG", "1") != "0":
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from minis3 import MiniS3

        n_s3 = min(n, int(os.environ.get("GRAFT_S3_EVENTS", "1000000")))
        s3wal_local = os.path.join(BENCH_DIR, f"s3wal-{n_s3}-{WAL_FORMAT}")
        if not os.path.exists(os.path.join(s3wal_local, ".done")):
            shutil.rmtree(s3wal_local, ignore_errors=True)
            ch = generate_changes(
                n_s3, n_convs=50000, max_turns=50, update_frac=0.5, delete_frac=0.1, seed=17
            )
            write_change_log(ch, s3wal_local, n_files=16, format=WAL_FORMAT)
            with open(os.path.join(s3wal_local, ".done"), "w") as f:
                f.write("ok")
        with MiniS3() as srv:
            from cityofphiladelphia_databridge_etl_tools_ray.state.fs import storage_for

            wal_uri = srv.uri("bench/wal")
            st, phys = storage_for(wal_uri)
            for seg in sorted(os.listdir(s3wal_local)):
                if seg.startswith("."):
                    continue
                with open(os.path.join(s3wal_local, seg), "rb") as f:
                    st.put_object(st.join(phys, seg), f.read())
            root = srv.uri("bench/lake")
            TranscriptLake.create(root, num_partitions=N_PARTITIONS)
            t0 = time.perf_counter()
            replay_into_lake(root, read_change_log(wal_uri))
            dt = round(time.perf_counter() - t0, 2)
            s3_rows = TranscriptLake(root).total_rows()
        legs["s3_loopback"] = {
            "events": n_s3,
            "replay_sec": [dt],
            "median_sec": dt,
            "events_per_sec": round(n_s3 / dt),
            "lake_rows": s3_rows,
        }
    print(
        json.dumps(
            {
                "metric": "objectstore_commit_overhead",
                "events": n,
                "lake_rows": rows["posix"],
                "legs": legs,
            }
        )
    )
    ray.shutdown()


def stats():
    """Print the replay pipeline's per-operator ``ds.stats()`` after one
    warmup + one timed pass at RAY_GRAFT_CPUS — the reproducible
    stage-level evidence for the scaling analysis in BASELINE.md
    (host-phase-independent structural metrics: max block rows, max
    task wall time, per-operator remote CPU)."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.replay import (
        ChangeNormalizer,
        _enable_push_shuffle,
        _MergeCommit,
        _normalized,
        PART_COL,
    )
    from cityofphiladelphia_databridge_etl_tools_ray.sources.changelog import read_change_log
    from cityofphiladelphia_databridge_etl_tools_ray.state.lake import TranscriptLake

    _enable_push_shuffle()
    wal = build_wal()
    read_change_log(wal).count()
    metrics = None
    for rep in range(2):  # warmup + timed
        root = os.path.join(BENCH_DIR, f"stats-{num_cpus}-{rep}")
        shutil.rmtree(root, ignore_errors=True)
        TranscriptLake.create(root, num_partitions=N_PARTITIONS)
        lake = TranscriptLake(root)
        ds = _normalized(
            read_change_log(wal),
            ChangeNormalizer(lake.num_partitions, min_lsn_exclusive=lake.min_watermark()),
            None,
        )
        metrics = ds.groupby(PART_COL).map_groups(_MergeCommit(root), batch_format="pyarrow")
        t0 = time.perf_counter()
        metrics.to_pandas()
        dt = time.perf_counter() - t0
        shutil.rmtree(root, ignore_errors=True)
    print(f"timed replay: {dt:.1f}s at {num_cpus} CPUs")
    print(metrics.stats())
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--stats" in sys.argv:
        stats()
    elif "--skew" in sys.argv:
        skew()
    elif "--objectstore" in sys.argv:
        objectstore()
    else:
        main()
