"""Invariant tests for churn-label assembly (point-in-time correctness)
and journey trigrams (pandas re-derivation of path counts)."""

from __future__ import annotations

import pandas as pd
import pytest

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.queries.extras import CHURN_DAYS
from currency_etl_spark.sources import table

CATALOG = load_catalog()


def test_churn_labels_point_in_time_correct(spark, sf_dir):
    got = (
        CATALOG["customers_churn_labels"].spark_fn(spark, sf_dir).toPandas()
        .set_index("mktsegment")
    )
    orders = table(spark, sf_dir, "orders").toPandas()
    cust = table(spark, sf_dir, "customer").toPandas()
    cutoff = orders.o_orderdate.max() - pd.Timedelta(days=CHURN_DAYS)
    prior = orders[orders.o_orderdate <= cutoff]
    recent_ids = set(orders[orders.o_orderdate > cutoff].o_custkey)
    feats = prior.groupby("o_custkey").agg(
        n=("o_orderkey", "size"), spend=("o_totalprice", "sum")
    )
    feats["churned"] = ~feats.index.isin(recent_ids)
    feats = feats.merge(
        cust[["c_custkey", "c_mktsegment"]], left_index=True, right_on="c_custkey"
    )
    for seg, grp in feats.groupby("c_mktsegment"):
        row = got.loc[seg]
        assert row.n_customers == len(grp)
        assert row.n_churned == int(grp.churned.sum())
        assert row.churn_rate == pytest.approx(
            round(grp.churned.mean(), 6), abs=1e-9
        )
        assert row.avg_prior_orders == pytest.approx(grp.n.mean(), abs=1e-3)
    # non-vacuous: both classes exist somewhere
    assert got.n_churned.sum() > 0
    assert got.n_churned.sum() < got.n_customers.sum()
    # customers first seen AFTER the cutoff never get a row
    cold = set(orders.o_custkey) - set(prior.o_custkey)
    assert got.n_customers.sum() == orders.o_custkey.nunique() - len(cold)


def test_journey_trigrams_match_pandas(spark, sf_dir):
    got = CATALOG["events_journey_trigrams"].spark_fn(spark, sf_dir).toPandas()
    ev = (
        table(spark, sf_dir, "events")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["p1"] = ev.groupby("user_id").event_type.shift(1)
    ev["p2"] = ev.groupby("user_id").event_type.shift(2)
    tri = ev.dropna(subset=["p2"])
    tri = tri.assign(j=tri.p2 + ">" + tri.p1 + ">" + tri.event_type)
    counts = tri.groupby("j").agg(n=("j", "size"), u=("user_id", "nunique"))
    assert len(got) == 10
    assert got.n_occurrences.is_monotonic_decreasing
    for row in got.itertuples():
        assert counts.loc[row.journey].n == row.n_occurrences
        assert counts.loc[row.journey].u == row.n_users
    # really the global top-10
    assert got.n_occurrences.min() >= counts.n.sort_values(ascending=False).iloc[10]
