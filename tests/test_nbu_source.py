"""Custom data source tests: spark.read.format("nbu") over a fixture,
schema contract, and composition with the transform stage."""

from __future__ import annotations

import pytest

from currency_etl_spark.nbu_source import register
from currency_etl_spark.transforms import transform_rates
from tests.fixtures import nbu_records, write_raw_json


@pytest.fixture(scope="module")
def nbu_df(spark, tmp_path_factory):
    path = write_raw_json(
        nbu_records(days=3), str(tmp_path_factory.mktemp("nbu") / "response.json")
    )
    register(spark)
    return spark.read.format("nbu").option("fixture_path", path).load()


def test_nbu_source_schema_and_rows(nbu_df):
    assert [f.name for f in nbu_df.schema.fields] == ["r030", "txt", "rate", "cc", "exchangedate"]
    rows = nbu_df.collect()
    assert len(rows) == 3 * 4  # 3 days × 4 currencies
    assert {r["cc"] for r in rows} == {"USD", "EUR", "GBP", "PLN"}
    assert all(isinstance(r["rate"], float) for r in rows)


def test_nbu_source_feeds_transform(nbu_df):
    out = transform_rates(nbu_df)
    assert out.count() == 3 * 2  # USD/EUR filter
    assert out.columns == ["cc", "rate", "txt", "exchangedate", "rate_per_100"]
