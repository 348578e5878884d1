"""Spark-vs-DuckDB oracle gate — local mirror of the driver's t2 check.

Runs every entry in aircan_spark.queries.QUERIES at sf0.001 and compares
against the oracle SQL: row count, column names, and values (rows sorted,
order-insensitive, exact after canonicalization — floats excepted with a
tight tolerance).
"""

import os

import duckdb
import pandas as pd
import pytest

from aircan_spark.queries import ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # normalize temporal values to ISO strings so DATE (object of
            # datetime.date on the Spark side) and datetime64 (duckdb side)
            # compare equal
            df[c] = pd.to_datetime(df[c]).dt.strftime("%Y-%m-%dT%H:%M:%S")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: pd.Timestamp(v).strftime("%Y-%m-%dT%H:%M:%S")
                if hasattr(v, "toordinal")
                else str(v)
            )
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle):
    if name not in ORACLES:
        # rows-only contract (non-SQL-expressible op): must run and produce
        # a stable schema; value checks live in tests/test_ext.py
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0
        return
    got = canonicalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = canonicalize(oracle.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
