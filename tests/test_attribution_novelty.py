"""Invariant tests for the attribution / migration / novelty batch:
credit conservation, matrix accounting, and first-occurrence semantics —
properties the shared-formulation DuckDB oracles can't independently pin.
"""

from __future__ import annotations

import pandas as pd
import pytest

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.sources import table

CATALOG = load_catalog()


def test_attribution_conserves_touched_revenue(spark, sf_dir):
    got = CATALOG["events_click_attribution"].spark_fn(spark, sf_dir).toPandas()
    ev = table(spark, sf_dir, "events").toPandas()
    purchases = ev[ev.event_type == "purchase"]
    clicks = ev[ev.event_type == "click"][["user_id", "ts"]]
    touched_rev = 0.0
    n_touched = 0
    for p in purchases.itertuples():
        w = clicks[
            (clicks.user_id == p.user_id)
            & (clicks.ts < p.ts)
            & (clicks.ts >= p.ts - pd.Timedelta(hours=24))
        ]
        if len(w):
            touched_rev += p.value
            n_touched += 1
    # every touched purchase's value is fully distributed across days
    # (each credit is quantized at 1e-6, so the bound scales with clicks)
    assert got.attributed_rev.sum() == pytest.approx(
        touched_rev, abs=1e-6 * max(got.n_credited_clicks.sum(), 1) + 1e-4
    )
    assert n_touched > 0  # policy is non-vacuous on this corpus
    assert (got.n_credited_clicks >= got.n_purchases_touched).any() or len(got) == 0


def test_migration_matrix_accounts_every_customer(spark, sf_dir):
    got = CATALOG["customers_segment_migration"].spark_fn(spark, sf_dir).toPandas()
    orders = table(spark, sf_dir, "orders").toPandas()
    assert got.n_customers.sum() == orders.o_custkey.nunique()
    assert got.from_q.between(0, 4).all() and got.to_q.between(0, 4).all()
    # a customer absent from BOTH halves has no orders at all → impossible
    assert not ((got.from_q == 0) & (got.to_q == 0)).any()


def test_novelty_first_doc_and_duplicates(spark, sf_dir):
    got = (
        CATALOG["docs_shingle_novelty"].spark_fn(spark, sf_dir).toPandas()
        .set_index("doc_id")
    )
    docs = table(spark, sf_dir, "documents").toPandas().sort_values("doc_id")
    # the first document with >=3 tokens is all-novel by construction
    first_id = int(got.index.min())
    assert got.loc[first_id].novelty == 1.0
    # an exact duplicate of an earlier document contributes zero novelty
    seen: dict[str, int] = {}
    dup_checked = 0
    for row in docs.itertuples():
        if row.text in seen and row.doc_id in got.index:
            assert got.loc[row.doc_id].n_novel == 0
            dup_checked += 1
        seen.setdefault(row.text, row.doc_id)
    # novelty counts partition the distinct-shingle dictionary exactly
    sh = docs.assign(
        s=docs.text.str.split(" ").map(
            lambda t: {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        )
    )
    all_shingles = set().union(*sh.s) if len(sh) else set()
    assert got.n_novel.sum() == len(all_shingles)
