"""Invariant tests for the affinity/profile operator batch (market basket,
inter-order gap, embedding dim stats, source token divergence): properties
the DuckDB oracle can't independently pin because the oracle shares the
formulation — lift algebra, gap accounting against a pandas reference, TV
distance bounds, and quantized-moment accuracy against numpy.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from currency_etl_spark.catalog import load_catalog

CATALOG = load_catalog()


@pytest.fixture(scope="module")
def basket(spark, sf_dir):
    return CATALOG["orders_market_basket"].spark_fn(spark, sf_dir).toPandas()


def test_basket_pairs_canonical_and_supported(basket):
    # pair orientation is canonical (a < b) and support >= the floor
    assert (basket.part_a < basket.part_b).all()
    assert (basket.pair_count >= 2).all()
    assert len(basket) <= 25


def test_basket_lift_recomputes_from_counts(spark, sf_dir, basket):
    # independently recompute lift for the reported pairs from raw counts
    li = (
        CATALOG["orders_market_basket"]
        .spark_fn.__globals__["table"](spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .toPandas()
        .drop_duplicates()
    )
    n_orders = li.l_orderkey.nunique()
    cnt = li.groupby("l_partkey").size()
    by_order = li.groupby("l_orderkey").l_partkey.apply(set)
    for row in basket.itertuples():
        pair_n = sum(1 for s in by_order if row.part_a in s and row.part_b in s)
        assert pair_n == row.pair_count
        want = round(pair_n * n_orders / (cnt[row.part_a] * cnt[row.part_b]), 6)
        assert want == pytest.approx(row.lift, abs=1e-9)


def test_interorder_gap_matches_pandas(spark, sf_dir):
    got = CATALOG["customers_interorder_gap"].spark_fn(spark, sf_dir).toPandas()
    tbl = CATALOG["customers_interorder_gap"].spark_fn.__globals__["table"]
    orders = tbl(spark, sf_dir, "orders").toPandas()
    cust = tbl(spark, sf_dir, "customer").toPandas()
    orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    gaps = (
        orders.assign(
            gap=orders.groupby("o_custkey").o_orderdate.diff().dt.days
        )
        .dropna(subset=["gap"])
        .groupby("o_custkey")
        .agg(n_gaps=("gap", "size"), sum_gap=("gap", "sum"), max_gap=("gap", "max"))
        .reset_index()
        .merge(cust[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey")
    )
    want = gaps.groupby("c_mktsegment").agg(
        n_repeat_customers=("o_custkey", "size"),
        n_gaps=("n_gaps", "sum"),
        sum_gap=("sum_gap", "sum"),
        max_gap_days=("max_gap", "max"),
    )
    for row in got.itertuples():
        w = want.loc[row.mktsegment]
        assert row.n_repeat_customers == w.n_repeat_customers
        assert row.n_gaps == w.n_gaps
        assert row.max_gap_days == w.max_gap_days
        assert row.avg_gap_days == pytest.approx(
            round(w.sum_gap / w.n_gaps, 4), abs=1e-9
        )


def test_dim_stats_matches_numpy(spark, sf_dir):
    got = CATALOG["embeddings_dim_stats"].spark_fn(spark, sf_dir).toPandas()
    tbl = CATALOG["embeddings_dim_stats"].spark_fn.__globals__["table"]
    mat = np.array(
        tbl(spark, sf_dir, "embeddings").toPandas().embedding.tolist(),
        dtype=np.float64,
    )
    assert len(got) == mat.shape[1]
    # quantization at 1e-6 bounds the error vs exact float64 moments
    assert np.allclose(got.mean_val, mat.mean(axis=0), atol=2e-6)
    assert np.allclose(got.std_val, mat.std(axis=0), atol=5e-6)
    assert np.allclose(got.min_val, mat.min(axis=0), atol=1e-6)
    assert np.allclose(got.max_val, mat.max(axis=0), atol=1e-6)
    assert (got.n == mat.shape[0]).all()


def test_source_divergence_bounds_and_consistency(spark, sf_dir):
    got = CATALOG["docs_source_token_divergence"].spark_fn(spark, sf_dir).toPandas()
    # TV distance lives in [0, 1]; every source is reported exactly once
    assert (got.tv_dist >= 0).all() and (got.tv_dist <= 1).all()
    assert got.source.is_unique
    # the top word's excess is non-negative (a source's most over-
    # represented token can't be under-represented unless distributions
    # are identical) and bounded by twice the TV distance
    assert (got.top_excess >= 0).all()
    assert (got.top_excess <= 2 * got.tv_dist + 1e-9).all()


def test_source_divergence_matches_python(spark, sf_dir):
    got = CATALOG["docs_source_token_divergence"].spark_fn(spark, sf_dir).toPandas()
    tbl = CATALOG["docs_source_token_divergence"].spark_fn.__globals__["table"]
    docs = tbl(spark, sf_dir, "documents").toPandas()
    rows = docs.assign(w=docs.text.str.split(" ")).explode("w")
    rows = rows[rows.w != ""]
    cw = rows.w.value_counts()
    n_total = len(rows)
    for row in got.itertuples():
        sw = rows[rows.source == row.source].w.value_counts()
        n_s = int(sw.sum())
        assert n_s == row.n_tokens
        # present-pairs formula: |diff| over the source's own words plus
        # the quantized corpus mass of absent words (closed form, no grid)
        present_q = sum(
            abs(round((sw[w] / n_s - cw[w] / n_total) * 1e12)) for w in sw.index
        )
        covered_q = sum(round(cw[w] / n_total * 1e12) for w in sw.index)
        tv_q = present_q + max(int(1e12) - covered_q, 0)
        assert row.tv_dist == pytest.approx(round(tv_q / 2 / 1e12, 6), abs=1e-9)
