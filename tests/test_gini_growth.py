"""Invariant tests for the Gini coefficient (numpy reference + bounds)
and growth accounting (state partition identity + pandas reference)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.sources import table

CATALOG = load_catalog()


def test_gini_matches_numpy(spark, sf_dir):
    got = CATALOG["customers_spend_gini"].spark_fn(spark, sf_dir).toPandas().iloc[0]
    orders = table(spark, sf_dir, "orders").toPandas()
    x = np.sort(orders.groupby("o_custkey").o_totalprice.sum().to_numpy())
    n = len(x)
    want = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (n + 1) / n
    assert got.n_customers == n
    assert got.gini == pytest.approx(want, abs=1e-6)
    assert 0 <= got.gini < 1


def test_growth_accounting_states_partition_actives(spark, sf_dir):
    got = CATALOG["events_growth_accounting"].spark_fn(spark, sf_dir).toPandas()
    # states partition the weekly active set exactly
    assert (
        got.n_new + got.n_retained + got.n_resurrected == got.n_active
    ).all()
    ev = table(spark, sf_dir, "events").toPandas()
    act = (
        ev.assign(wk=ev.ts.dt.to_period("W").dt.start_time)[["user_id", "wk"]]
        .drop_duplicates()
    )
    weeks = sorted(act.wk.unique())
    by_week = {w: set(act[act.wk == w].user_id) for w in weeks}
    first = act.groupby("user_id").wk.min()
    for i, w in enumerate(weeks):
        row = got[got.week == pd.Timestamp(w).strftime("%Y-%m-%d")].iloc[0]
        users = by_week[w]
        new = {u for u in users if first[u] == w}
        prev = by_week.get(w - pd.Timedelta(days=7), set())
        retained = (users & prev) - new
        resurrected = users - new - retained
        assert row.n_new == len(new)
        assert row.n_retained == len(retained)
        assert row.n_resurrected == len(resurrected)
        if i > 0:
            churned = by_week[weeks[i - 1]] - users if (
                w - pd.Timedelta(days=7) == weeks[i - 1]
            ) else set()
            assert row.n_churned_in == len(churned)


def test_forecast_backtest_matches_pandas(spark, sf_dir):
    got = (
        CATALOG["orders_forecast_backtest"].spark_fn(spark, sf_dir).toPandas()
        .set_index("year")
    )
    orders = table(spark, sf_dir, "orders").toPandas()
    monthly = (
        orders.assign(m=orders.o_orderdate.dt.to_period("M"))
        .groupby("m")
        .o_totalprice.sum()
    )
    rows = {}
    for m, actual in monthly.items():
        prev = m - 12
        if prev in monthly.index:
            y = str(m.year)
            rows.setdefault(y, []).append(abs(actual - monthly[prev]) / actual)
    for y, apes in rows.items():
        assert got.loc[y].n_months == len(apes)
        assert got.loc[y].mape == pytest.approx(
            sum(apes) / len(apes), abs=1e-4
        )
    assert set(got.index) == set(rows)
    # the first 12 months never get a row (no training year behind them)
    assert got.n_months.sum() == len(monthly) - 12
