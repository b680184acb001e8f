"""Invariant tests for the ACF / pseudonymization pair: numpy-reference
autocorrelation and collision-freedom + count-preservation of the keyed
hash — properties the shared-formulation oracles can't pin."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.queries.extras import PSEUDO_PEPPER
from currency_etl_spark.sources import table

CATALOG = load_catalog()


def test_acf_matches_numpy(spark, sf_dir):
    got = CATALOG["events_autocorrelation"].spark_fn(spark, sf_dir).toPandas()
    ev = table(spark, sf_dir, "events").toPandas()
    daily = (
        ev.assign(day=ev.ts.dt.floor("D"), q=(ev.value * 10000).round())
        .groupby("day")
        .q.sum()
    )
    idx = pd.date_range(daily.index.min(), daily.index.max(), freq="D")
    x = (daily.reindex(idx, fill_value=0) / 10000).to_numpy(dtype=np.float64)
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    for row in got.itertuples():
        k = int(row.lag)
        want = ((x[:-k] - mu) * (x[k:] - mu)).sum() / den
        # 1e-2 quantization of centered products bounds the drift
        assert row.acf == pytest.approx(want, abs=1e-4)
        assert row.n_pairs == len(x) - k
    assert list(got.lag) == list(range(1, 8))
    assert (got.acf.abs() <= 1 + 1e-9).all()


def test_pseudonymization_is_collision_free_and_count_preserving(spark, sf_dir):
    got = CATALOG["customers_pseudonymize_audit"].spark_fn(spark, sf_dir).toPandas()
    cust = table(spark, sf_dir, "customer").toPandas()
    orders = table(spark, sf_dir, "orders").toPandas()
    # full-dimension collision check (not just the top 20)
    hashes = {
        hashlib.sha256(f"{PSEUDO_PEPPER}:{k}".encode()).hexdigest()
        for k in cust.c_custkey
    }
    assert len(hashes) == cust.c_custkey.nunique()
    # the reported counts reproduce from the cleartext join
    per_cust = orders.groupby("o_custkey").size()
    want_top = per_cust.sort_values(ascending=False)
    for row in got.itertuples():
        # invert the hash via the known pepper to find the customer
        matches = [
            k
            for k in cust.c_custkey
            if hashlib.sha256(f"{PSEUDO_PEPPER}:{k}".encode()).hexdigest()
            == row.pseudo_key
        ]
        assert len(matches) == 1
        assert per_cust[matches[0]] == row.n_orders
    assert (got.n_orders >= want_top.iloc[19]).all()  # really the top 20
