"""Approximate-aggregate accuracy: the sketches (HLL++, approx_percentile)
must land within tolerance of the exact operators they replace at 100 TB."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from currency_etl_spark.queries.extras import approx_distinct_stats
from currency_etl_spark.sources import table


def test_approx_within_tolerance_of_exact(spark, sf_dir):
    approx = {r["event_type"]: r for r in approx_distinct_stats(spark, sf_dir).collect()}
    exact = {
        r["event_type"]: r
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et in exact:
        assert approx[et]["approx_users"] == pytest.approx(exact[et]["users"], rel=0.05)
        assert approx[et]["approx_median"] == pytest.approx(exact[et]["median"], rel=0.05)
