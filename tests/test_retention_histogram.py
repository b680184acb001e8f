"""Invariant tests for Dn retention (censoring correctness vs a pandas
reference) and the equi-depth histogram (equal-mass property + boundary
containment vs numpy)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.queries.extras import EQUIDEPTH_BUCKETS, RETENTION_DAYS
from currency_etl_spark.sources import table

CATALOG = load_catalog()


def test_dn_retention_matches_pandas(spark, sf_dir):
    got = (
        CATALOG["events_dn_retention"].spark_fn(spark, sf_dir).toPandas()
        .set_index("n")
    )
    ev = table(spark, sf_dir, "events").toPandas()
    p = (
        ev[ev.event_type == "purchase"]
        .assign(d=lambda x: x.ts.dt.floor("D"))[["user_id", "d"]]
        .drop_duplicates()
    )
    first = p.groupby("user_id").d.min()
    m = ev.ts.dt.floor("D").max()
    days = set(zip(p.user_id, p.d))
    for n in RETENTION_DAYS:
        eligible = first[first + pd.Timedelta(days=n) <= m]
        retained = sum(
            (uid, f + pd.Timedelta(days=n)) in days for uid, f in eligible.items()
        )
        row = got.loc[n]
        assert row.n_eligible == len(eligible)
        assert row.n_retained == retained
        if len(eligible):
            assert row.retention == pytest.approx(
                round(retained / len(eligible), 6), abs=1e-9
            )
    # retention is a proper rate and the curve is non-vacuous
    assert ((got.retention >= 0) & (got.retention <= 1)).all()
    assert got.n_retained.sum() > 0


def test_equidepth_histogram_equal_mass_and_ordered(spark, sf_dir):
    got = CATALOG["lineitem_equidepth_histogram"].spark_fn(spark, sf_dir).toPandas()
    li = table(spark, sf_dir, "lineitem").toPandas()
    n = len(li)
    assert got.n_rows.sum() == n
    assert list(got.bucket) == list(range(1, len(got) + 1))
    # equal mass: every bucket within ~2% of n/k + interpolation slack
    target = n / EQUIDEPTH_BUCKETS
    assert (abs(got.n_rows - target) <= max(0.02 * n, 2)).all()
    # bucket ranges are ordered and non-overlapping
    assert (got.lo <= got.hi).all()
    assert (got.hi.iloc[:-1].values <= got.lo.iloc[1:].values + 1e-9).all()
    # boundaries agree with numpy's linear-interpolation percentiles
    bounds = np.percentile(
        li.l_extendedprice, [100 * i / EQUIDEPTH_BUCKETS for i in range(1, EQUIDEPTH_BUCKETS)]
    )
    for i, b in enumerate(bounds):
        assert got.hi.iloc[i] <= b + 1e-6
        assert got.lo.iloc[i + 1] >= b - 1e-6
