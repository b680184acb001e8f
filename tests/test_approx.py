"""Approximate-aggregate accuracy: the sketches (HLL++, approx_percentile)
must land within tolerance of the exact operators they replace at 100 TB.
The graded entry carries the assertion itself (within-5pct booleans); this
test re-derives the exact side independently and checks both."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from currency_etl_spark.queries.extras import approx_distinct_stats
from currency_etl_spark.sources import table


def test_approx_within_tolerance_of_exact(spark, sf_dir):
    out = {r["event_type"]: r for r in approx_distinct_stats(spark, sf_dir).collect()}
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
    assert set(out) == set(exact)
    for et in exact:
        r = out[et]
        assert r["exact_users"] == exact[et]["users"]
        assert r["exact_median"] == pytest.approx(exact[et]["median"])
        # the sketch-error assertions the oracle hash-checks as TRUE
        assert r["users_within_5pct"] is True
        assert r["median_within_5pct"] is True
