"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at a given sf and compare against ``oracle_sql()``
via DuckDB (row count + column names + order-insensitive values).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == "int32":
            df[c] = df[c].astype("int64")
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def dtype_kinds(df: pd.DataFrame) -> list:
    """Dtype *kind* per column — the driver's value hash distinguishes
    int64 from float64 (and Int64 from int64), so the local gate must
    too.  Kinds: i/u int, f float, M datetime, O/b object/bool; pandas
    nullable Int64 reports kind 'i' but a distinct dtype name, so use
    the full dtype string for extension dtypes."""
    out = []
    for c in df.columns:
        dt = df[c].dtype
        name = str(dt)
        if name in ("Int64", "Int32", "Float64", "boolean"):
            out.append(name)  # extension dtype ≠ numpy dtype for the hash
        else:
            out.append(dt.kind)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            raw = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray error: {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            # rows-only: result may carry list columns canon() can't sort
            print(f"ROWS-ONLY {name}: {len(raw)} rows ({dt:.1f}s)")
            continue
        got = canon(raw)
        exp = canon(con.execute(sqls[name]).fetchdf())
        if len(got) == 0 and len(exp) == 0:
            print(f"OK   {name}: 0 rows both sides ({dt:.1f}s)")
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures.append(name)
            continue
        gk, ek = dtype_kinds(got), dtype_kinds(exp)
        if gk != ek:
            print(f"FAIL {name}: dtype kinds {dict(zip(got.columns, gk))} != {dict(zip(exp.columns, ek))}")
            failures.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=False, rtol=1e-9)
            print(f"OK   {name}: {len(got)} rows ({dt:.1f}s)")
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch: {str(ex)[:400]}")
            failures.append(name)
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all OK")


if __name__ == "__main__":
    main()
