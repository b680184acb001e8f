"""Property-based tests (SURVEY.md §5.2) for the semantics that are easy to
break silently: upsert last-write-wins convergence over arbitrary batch
sequences, rolling-mean parity with pandas on arbitrary series, and the
LEAST(cnt,31) clamp at arbitrary history lengths. Example counts are small
— each example runs real Spark jobs."""

from __future__ import annotations

import datetime as _dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from currency_etl_spark.currency_queries import run_queries
from currency_etl_spark.forecast import rolling_avg
from currency_etl_spark.warehouse import ParquetUpsertTable

START = _dt.date(2024, 1, 1)

_PROP_SETTINGS = settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)


@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(0, 5), st.floats(1, 100, allow_nan=False)),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
@_PROP_SETTINGS
def test_upsert_converges_to_last_write(spark, tmp_path_factory, batches):
    """Applying any sequence of keyed batches leaves exactly the last-written
    value per key — the ON CONFLICT DO UPDATE contract (load.py:38-41)."""
    path = str(tmp_path_factory.mktemp("prop_upsert") / "t")
    t = ParquetUpsertTable(spark, path, ["k"])
    expect: dict[int, float] = {}
    for batch in batches:
        rows = [(k, float(v), i) for i, (k, v) in enumerate(batch)]
        df = spark.createDataFrame(rows, "k int, v double, __seq long")
        t.merge_upsert(df)
        for k, v in batch:  # in-batch: later row wins, like the row loop
            expect[k] = float(v)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == pytest.approx(expect)


@given(
    values=st.lists(st.floats(0.125, 1000, allow_nan=False, width=32), min_size=1, max_size=40)
)
@_PROP_SETTINGS
def test_rolling_mean_matches_pandas(spark, values):
    """Window rowsBetween(-6, 0) == pandas rolling(7, min_periods=1).mean()
    for every series shape (currency_etl.py:41)."""
    rows = [
        ("USD", float(v), "x", START + _dt.timedelta(days=i), float(v) * 100)
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "cc string, rate double, txt string, exchangedate date, rate_per_100 double"
    )
    got = [
        r["avg_rate"]
        for r in rolling_avg(df).orderBy("exchangedate").select("avg_rate").collect()
    ]
    want = pd.Series([float(v) for v in values]).rolling(7, min_periods=1).mean().tolist()
    assert got == pytest.approx(want)


@given(n=st.integers(1, 45))
@_PROP_SETTINGS
def test_change_month_clamp_any_history_length(spark, n):
    """diff == last - history[-min(cnt, 31)] for every history length —
    the LEAST(cnt,31) clamp (analyze.py:77-81)."""
    vals = [round(40 + 0.37 * i, 2) for i in range(n)]
    rows = [
        ("USD", v, "x", START + _dt.timedelta(days=i), v * 100)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "cc string, rate double, txt string, exchangedate date, rate_per_100 double"
    )
    res = run_queries(spark, df, today=str(START + _dt.timedelta(days=n)))
    expect = vals[-1] - vals[len(vals) - min(n, 31)]
    assert res["usd_change_month"][0]["diff_usd"] == pytest.approx(expect)
