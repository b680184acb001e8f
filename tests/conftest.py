"""Shared pytest fixtures: one tuned SparkSession per test session, a DuckDB
connection with the corpus tables pre-registered as views (mirroring the
driver's harness), and an oracle-comparison helper."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from currency_etl_spark.session import get_spark
from currency_etl_spark.sources import CORPUS_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # lighter for unit tests
    spark = get_spark("currency_etl_spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in CORPUS_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style normalization: column order by name, row order by all
    columns — comparison is order-insensitive but value-exact. Temporal
    columns are coerced to datetime64[us] (Spark yields ns, DuckDB us)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    # stringify for a total order across mixed/NaN columns, like a value hash
    key = df.astype(str)
    idx = key.sort_values(by=list(key.columns)).index
    return df.loc[idx].reset_index(drop=True)


def assert_matches_oracle(spark_df, ddb, sql: str, name: str = "?") -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(ddb.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True, obj=name
    )
