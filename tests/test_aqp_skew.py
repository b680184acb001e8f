"""Invariant tests for the AQP estimator and the skew report: sampling
accounting re-derived from hashlib, estimator calibration bounds, and
skew-factor algebra recomputed in pandas."""

from __future__ import annotations

import hashlib

import pytest

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.queries.extras import SAMPLE_MOD
from currency_etl_spark.sources import table

CATALOG = load_catalog()


def test_sample_estimate_reproduces_from_hashlib(spark, sf_dir):
    got = CATALOG["orders_sample_estimate"].spark_fn(spark, sf_dir).toPandas().iloc[0]
    orders = table(spark, sf_dir, "orders").toPandas()

    def slot(k: int) -> int:
        return int(hashlib.md5(str(k).encode()).hexdigest()[:7], 16) % SAMPLE_MOD

    slots = orders.o_orderkey.map(slot)
    in_sample = slots == 0
    assert got.n_total == len(orders)
    assert got.n_sample == int(in_sample.sum())
    est = orders.o_totalprice[in_sample].sum() * SAMPLE_MOD
    assert got.est_revenue == pytest.approx(est, rel=1e-9)
    assert got.exact_revenue == pytest.approx(orders.o_totalprice.sum(), rel=1e-9)
    # a uniform-hash 10% sample of thousands of orders lands near 10%
    assert abs(got.n_sample / got.n_total - 1 / SAMPLE_MOD) < 0.03
    # and its scaled estimate is a sane estimator (loose calibration bound)
    assert got.rel_error < 0.15


def test_skew_report_matches_pandas(spark, sf_dir):
    got = CATALOG["events_skew_report"].spark_fn(spark, sf_dir).toPandas()
    ev = table(spark, sf_dir, "events").toPandas()
    per_key = ev.groupby("user_id").size().sort_values(ascending=False)
    n_keys, n_total = len(per_key), len(ev)
    assert len(got) == 5
    # the report really holds the heaviest keys
    assert set(got.n_rows) <= set(per_key.head(20))
    assert got.n_rows.iloc[0] == per_key.iloc[0]
    for row in got.itertuples():
        assert per_key[row.user_id] == row.n_rows
        assert row.share == pytest.approx(round(row.n_rows / n_total, 6), abs=1e-9)
        assert row.skew_factor == pytest.approx(
            round(row.n_rows * n_keys / n_total, 6), abs=1e-9
        )
    # skew factor of the heaviest key is >= 1 by construction
    assert got.skew_factor.iloc[0] >= 1.0
