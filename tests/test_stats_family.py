"""Invariant tests for the statistics trio (grouped OLS, chi-square,
HHI): numpy/scipy-free references and algebraic bounds independent of
the shared-formulation DuckDB oracles."""

from __future__ import annotations

import numpy as np
import pytest

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.sources import table

CATALOG = load_catalog()


def test_elasticity_matches_numpy_polyfit(spark, sf_dir):
    got = (
        CATALOG["part_brand_price_elasticity"].spark_fn(spark, sf_dir).toPandas()
        .set_index("p_brand")
    )
    li = table(spark, sf_dir, "lineitem").toPandas()
    part = table(spark, sf_dir, "part").toPandas()
    j = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    for brand, grp in j.groupby("p_brand"):
        x = grp.l_quantity.to_numpy(dtype=np.float64)
        y = grp.l_extendedprice.to_numpy(dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = got.loc[brand]
        assert row.n == len(grp)
        assert row.slope == pytest.approx(slope, rel=1e-4)
        assert row.intercept == pytest.approx(intercept, rel=1e-3)
        assert row.r2 == pytest.approx(r * r, abs=1e-4)
        assert 0 <= row.r2 <= 1 + 1e-9


def test_chi2_matches_python_and_bounds(spark, sf_dir):
    got = CATALOG["docs_lang_source_chi2"].spark_fn(spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents").toPandas()
    ct = docs.groupby(["lang", "source"]).size().unstack(fill_value=0)
    n = ct.values.sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2_cells = (ct.values - e) ** 2 / e
    per_lang = dict(zip(ct.index, chi2_cells.sum(axis=1)))
    for row in got.itertuples():
        assert row.chi2_contrib == pytest.approx(per_lang[row.lang], abs=1e-3)
        assert row.n_docs == int(ct.loc[row.lang].sum())
    assert (got.chi2_contrib >= 0).all()
    assert got.n_docs.sum() == len(docs)


def test_hhi_matches_python_and_bounds(spark, sf_dir):
    got = (
        CATALOG["nation_supplier_hhi"].spark_fn(spark, sf_dir).toPandas()
        .set_index("nation")
    )
    li = table(spark, sf_dir, "lineitem").toPandas()
    sup = table(spark, sf_dir, "supplier").toPandas()
    nat = table(spark, sf_dir, "nation").toPandas()
    j = li.merge(sup[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(nat[["n_nationkey", "n_name"]], left_on="s_nationkey", right_on="n_nationkey")
    for nation, grp in j.groupby("n_name"):
        rev = grp.groupby("s_suppkey").l_extendedprice.sum()
        shares = rev / rev.sum()
        hhi = float((shares**2).sum())
        row = got.loc[nation]
        assert row.n_suppliers == len(rev)
        assert row.hhi == pytest.approx(hhi, abs=1e-4)
        # HHI lives in [1/n, 1]
        assert 1 / len(rev) - 1e-9 <= row.hhi <= 1 + 1e-9
