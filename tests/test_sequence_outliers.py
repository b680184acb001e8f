"""Invariant tests for the dwell / protocol-audit / embedding-outlier
batch: accounting identities and numpy/pandas references independent of
the shared-formulation DuckDB oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.sources import table

CATALOG = load_catalog()


def test_dwell_transitions_account_every_adjacency(spark, sf_dir):
    got = CATALOG["events_transition_dwell"].spark_fn(spark, sf_dir).toPandas()
    ev = table(spark, sf_dir, "events").toPandas()
    # each user with k events contributes exactly k-1 transitions
    per_user = ev.groupby("user_id").size()
    assert got.n_transitions.sum() == (per_user - 1).sum()
    assert (got.avg_dwell_s <= got.max_dwell_s + 1e-9).all()
    assert (got.avg_dwell_s >= 0).all()


def test_dwell_avg_matches_pandas_for_one_cell(spark, sf_dir):
    got = (
        CATALOG["events_transition_dwell"].spark_fn(spark, sf_dir).toPandas()
        .set_index(["prev_type", "event_type"])
    )
    ev = (
        table(spark, sf_dir, "events")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["prev_type"] = ev.groupby("user_id").event_type.shift()
    ev["dwell"] = (
        ev.ts.astype("int64") - ev.groupby("user_id").ts.shift().astype("int64")
    ) / 1e9  # pandas ns → seconds
    cell = ev.dropna(subset=["prev_type"])
    grp = cell.groupby(["prev_type", "event_type"]).dwell
    for key, want in grp.mean().items():
        assert got.loc[key].avg_dwell_s == pytest.approx(want, abs=1e-3)


def test_state_machine_audit_matches_pandas(spark, sf_dir):
    got = (
        CATALOG["events_state_machine_audit"].spark_fn(spark, sf_dir).toPandas()
        .set_index("rule")
    )
    ev = table(spark, sf_dir, "events").toPandas()
    g = ev.groupby("user_id")
    first_ts = g.ts.min()
    f_signup = ev[ev.event_type == "signup"].groupby("user_id").ts.min()
    f_engage = (
        ev[ev.event_type.isin(["click", "view"])].groupby("user_id").ts.min()
    )
    f_purchase = ev[ev.event_type == "purchase"].groupby("user_id").ts.min()
    sn = got.loc["signup_not_first"]
    assert sn.n_applicable == len(f_signup)
    assert sn.n_violations == int((f_signup > first_ts.loc[f_signup.index]).sum())
    pb = got.loc["purchase_before_engagement"]
    assert pb.n_applicable == len(f_purchase)
    engage = f_engage.reindex(f_purchase.index)
    assert pb.n_violations == int(
        (engage.isna() | (f_purchase < engage)).sum()
    )
    assert (got.n_violations <= got.n_applicable).all()


def test_label_outliers_matches_numpy(spark, sf_dir):
    got = (
        CATALOG["embedding_label_outliers"].spark_fn(spark, sf_dir).toPandas()
        .set_index("label")
    )
    emb = table(spark, sf_dir, "embeddings").toPandas()
    assert got.n_vecs.sum() == len(emb)
    for label, grp in emb.groupby("label"):
        mat = np.array(grp.embedding.tolist(), dtype=np.float64)
        cent = mat.mean(axis=0)
        dist = np.sqrt(((mat - cent) ** 2).sum(axis=1))
        row = got.loc[label]
        assert row.n_vecs == len(grp)
        assert row.mean_dist == pytest.approx(dist.mean(), abs=1e-4)
        p95 = np.quantile(dist, 0.95, method="linear")
        assert row.p95_dist == pytest.approx(p95, abs=1e-4)
        # at most ~5% beyond an exact p95 by construction
        assert row.n_outliers <= int(np.ceil(0.05 * len(grp))) + 1
