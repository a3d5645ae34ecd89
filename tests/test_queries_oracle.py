"""Mimic the driver's correctness gate locally: run each Ray query and its
DuckDB oracle on sf0.001 and compare row count, column names, and
order-insensitive values (exact equality — stricter than a value hash)."""

import duckdb
import pandas as pd
import pytest

from ptt_spider_go_ray.queries import SQL_QUERIES

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_result(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_query_matches_oracle(name, ray_session):
    fn, sql = SQL_QUERIES[name]
    got = canon(to_pandas(fn(SF)))
    want = canon(duck_result(sql))
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for col in want.columns:
        g, w = got[col], want[col]
        if g.dtype != w.dtype:
            try:
                g = g.astype(w.dtype)
            except (TypeError, ValueError):
                pass
        pd.testing.assert_series_equal(
            g, w, check_names=False, check_dtype=False, obj=f"{name}.{col}"
        )
