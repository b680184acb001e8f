"""Invariant tests for the importance-weighting / A-B experiment pair:
target-slice selectivity and Python-reference weight recompute for DSIR,
hash-assignment determinism and accounting for the experiment readout."""

from __future__ import annotations

import hashlib
import math

import pytest

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.sources import table

CATALOG = load_catalog()


def test_importance_favors_target_slice(spark, sf_dir):
    got = CATALOG["docs_importance_weights"].spark_fn(spark, sf_dir).toPandas()
    # target = non-English: the top-25 selection must be dominated by it
    assert len(got) == 25
    assert (got.lang != "en").mean() > 0.5
    assert got.doc_id.is_unique


def test_importance_weights_match_python(spark, sf_dir):
    got = CATALOG["docs_importance_weights"].spark_fn(spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents").toPandas()
    c_w: dict[str, int] = {}
    t_w: dict[str, int] = {}
    for row in docs.itertuples():
        for w in row.text.split(" "):
            c_w[w] = c_w.get(w, 0) + 1
            if row.lang != "en":
                t_w[w] = t_w.get(w, 0) + 1
    ilog2 = lambda x: x.bit_length() - 1  # noqa: E731
    s_w = {w: ilog2(t_w.get(w, 0) + 1) - ilog2(c + 1) for w, c in c_w.items()}
    by_id = docs.set_index("doc_id")
    for row in got.itertuples():
        toks = by_id.loc[row.doc_id].text.split(" ")
        want = sum(s_w[w] for w in toks)
        assert want == row.imp_sum
        assert row.n_tokens == len(toks)
        assert row.mean_importance == pytest.approx(
            round(want / len(toks), 6), abs=1e-9
        )


def test_ab_assignment_deterministic_and_accounted(spark, sf_dir):
    got = (
        CATALOG["events_ab_experiment"].spark_fn(spark, sf_dir).toPandas()
        .set_index("variant")
    )
    ev = table(spark, sf_dir, "events").toPandas()
    users = ev.user_id.unique()
    assert got.n_users.sum() == len(users)
    # recompute the stable-hash assignment exactly
    def assign(u: int) -> int:
        return int(hashlib.md5(str(u).encode()).hexdigest()[:7], 16) % 2

    conv = ev[ev.event_type == "purchase"].groupby("user_id").size()
    for v in (0, 1):
        vu = [u for u in users if assign(u) == v]
        assert got.loc[v].n_users == len(vu)
        assert got.loc[v].n_converted == sum(1 for u in vu if u in conv.index)
    assert got.loc[0].lift_vs_control == 0.0
    assert got.loc[1].lift_vs_control == pytest.approx(
        round(
            got.loc[1].n_converted / got.loc[1].n_users
            - got.loc[0].n_converted / got.loc[0].n_users,
            6,
        ),
        abs=1e-9,
    )
