"""applyInPandas grouped-map vs the built-in window form: identical
z-scores (within float tolerance — pandas aggregates in a different order
than the window engine)."""

from __future__ import annotations

import pytest

from currency_etl_spark.operators.grouped_map import zscore_builtin, zscore_grouped_map
from currency_etl_spark.sources import table


def test_grouped_map_matches_builtin(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    a = {r["event_id"]: r["zscore"] for r in zscore_builtin(events).collect()}
    b = {r["event_id"]: r["zscore"] for r in zscore_grouped_map(events).collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-9, abs=1e-9)


def test_engine_api_facade(spark, sf_dir):
    from currency_etl_spark.api import Engine

    eng = Engine(sf_dir=sf_dir, spark=spark)
    assert "q1_pricing_summary" in eng.list_queries()
    assert eng.query("ref_num_types").collect()[0]["num_types"] == 5
    assert eng.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"] > 0
    assert "pricing summary" in eng.describe("q1_pricing_summary")
    with pytest.raises(KeyError):
        eng.query("nope")
