"""SCD2 history table: version tracking, no-churn on unchanged values,
time travel, and idempotent re-application."""

from __future__ import annotations

import pytest

from currency_etl_spark.scd2 import Scd2Table


def _df(spark, rows):
    return spark.createDataFrame(rows, "cc string, rate double")


@pytest.fixture()
def t(spark, tmp_path):
    return Scd2Table(
        spark, str(tmp_path / "scd2"), key_cols=["cc"], tracked_cols=["rate"]
    )


def test_versions_accumulate(spark, t):
    t.apply_changes(_df(spark, [("USD", 41.0), ("EUR", 45.0)]), "2024-01-01 00:00:00")
    assert t.current().count() == 2

    # USD changes, EUR unchanged, GBP new
    t.apply_changes(
        _df(spark, [("USD", 42.0), ("EUR", 45.0), ("GBP", 52.0)]), "2024-01-02 00:00:00"
    )
    cur = {r["cc"]: r["rate"] for r in t.current().collect()}
    assert cur == {"USD": 42.0, "EUR": 45.0, "GBP": 52.0}

    hist = t.read().collect()
    assert len(hist) == 4  # USD v1 (closed) + USD v2 + EUR v1 + GBP v1
    usd = sorted(
        (r for r in hist if r["cc"] == "USD"), key=lambda r: r["valid_from"]
    )
    assert [r["is_current"] for r in usd] == [False, True]
    assert str(usd[0]["valid_to"]) == "2024-01-02 00:00:00"
    # EUR saw no version churn despite appearing in the batch
    assert sum(1 for r in hist if r["cc"] == "EUR") == 1


def test_as_of_time_travel(spark, t):
    t.apply_changes(_df(spark, [("USD", 41.0)]), "2024-01-01 00:00:00")
    t.apply_changes(_df(spark, [("USD", 42.0)]), "2024-01-05 00:00:00")
    t.apply_changes(_df(spark, [("USD", 43.0)]), "2024-01-09 00:00:00")
    assert t.as_of("2024-01-03 00:00:00").collect()[0]["rate"] == 41.0
    assert t.as_of("2024-01-05 00:00:00").collect()[0]["rate"] == 42.0
    assert t.as_of("2024-02-01 00:00:00").collect()[0]["rate"] == 43.0
    assert t.as_of("2023-12-31 00:00:00").count() == 0
    assert t.read().count() == 3
    assert t.current().count() == 1


def test_reapply_same_batch_is_noop(spark, t):
    t.apply_changes(_df(spark, [("USD", 41.0), ("EUR", 45.0)]), "2024-01-01 00:00:00")
    before = sorted(map(tuple, t.read().collect()))
    t.apply_changes(_df(spark, [("USD", 41.0), ("EUR", 45.0)]), "2024-01-02 00:00:00")
    after = sorted(map(tuple, t.read().collect()))
    assert before == after  # unchanged values create no versions
