"""The local twin of the driver's correctness gate: every catalog query with
an oracle is executed in Spark and in DuckDB on the same parquet tables and
compared value-exactly (order-insensitive). Runs at sf0.001 for speed; the
driver repeats this at sf0.01."""

from __future__ import annotations

import pytest

from currency_etl_spark.catalog import load_catalog
from tests.conftest import assert_matches_oracle

CATALOG = load_catalog()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    spec = CATALOG[name]
    df = spec.spark_fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    assert_matches_oracle(df, ddb, spec.oracle, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 3


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert len(qs) >= 10
    assert set(os_).issubset(set(qs))
