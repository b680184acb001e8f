"""customers_k_anonymity invariants: a pandas re-derivation of the QI
grouping must match exactly, the histogram must partition the customer
table (every customer counted once), and the at_risk flag must be the
k-threshold indicator."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from currency_etl_spark.queries.curation import K_ANON_MIN, customers_k_anonymity

SF = "/root/testdata/sf0.001"


def test_k_anonymity_matches_pandas(spark):
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    qi = Counter(
        (r.c_nationkey, r.c_mktsegment, math.floor(r.c_acctbal / 1000))
        for r in cust.itertuples()
    )
    sizes = Counter(qi.values())
    want = {
        k: (n, k * n, int(k < K_ANON_MIN)) for k, n in sizes.items()
    }
    got = {
        r["group_size"]: (r["n_groups"], r["n_customers"], r["at_risk"])
        for r in customers_k_anonymity(spark, SF).collect()
    }
    assert got == want
    # the histogram partitions the table: every customer counted once
    assert sum(v[1] for v in got.values()) == len(cust)
    # the audit fires on this corpus: both risky and safe groups exist
    assert any(v[2] == 1 for v in got.values())
    assert any(v[2] == 0 for v in got.values()) or max(got) < K_ANON_MIN


def test_k_anonymity_k_is_a_real_parameter(spark):
    """k is a keyword parameter (round-9 verdict item 6): at_risk rows
    are exactly the groups below k, so k=1 clears the flag everywhere and
    a huge k flags everything; the histogram itself never changes."""
    base = {r["group_size"]: r for r in customers_k_anonymity(spark, SF).collect()}
    none = {r["group_size"]: r for r in customers_k_anonymity(spark, SF, k=1).collect()}
    all_risky = {
        r["group_size"]: r
        for r in customers_k_anonymity(spark, SF, k=10**6).collect()
    }
    assert set(base) == set(none) == set(all_risky)
    for g, r in base.items():
        assert (r["n_groups"], r["n_customers"]) == (
            none[g]["n_groups"], none[g]["n_customers"]
        )
        assert none[g]["at_risk"] == 0
        assert all_risky[g]["at_risk"] == 1
        assert r["at_risk"] == int(g < K_ANON_MIN)


def _pd_l_diversity(sf: str):
    """Pure-pandas re-derivation of the l-diversity histogram."""
    from collections import defaultdict

    cust = pd.read_parquet(f"{sf}/customer.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")[
        ["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"]
    ]
    latest = {}
    for r in orders.itertuples():
        cur = latest.get(r.o_custkey)
        key = (r.o_orderdate, r.o_orderkey)
        if cur is None or key > cur[0]:
            latest[r.o_custkey] = (key, r.o_orderpriority)
    groups = defaultdict(list)
    for r in cust.itertuples():
        sens = latest.get(r.c_custkey, (None, "NONE"))[1]
        groups[(r.c_nationkey, r.c_mktsegment, math.floor(r.c_acctbal / 1000))].append(
            sens
        )
    hist = Counter()
    custs = Counter()
    for members in groups.values():
        l = len(set(members))
        hist[l] += 1
        custs[l] += len(members)
    return hist, custs, len(cust)


def test_l_diversity_matches_pandas(spark):
    from currency_etl_spark.queries.curation import L_DIV_MIN, customers_l_diversity

    hist, custs, n_cust = _pd_l_diversity(SF)
    got = {
        r["l"]: (r["n_groups"], r["n_customers"], r["at_risk"])
        for r in customers_l_diversity(spark, SF).collect()
    }
    assert got == {
        l: (hist[l], custs[l], int(l < L_DIV_MIN)) for l in hist
    }
    # the histogram partitions the customer table
    assert sum(v[1] for v in got.values()) == n_cust
    # the audit fires: risky levels exist; safe ones too unless the whole
    # corpus sits below the bar (sf0.001's QI groups are 1-2 customers)
    assert any(v[2] == 1 for v in got.values())
    assert any(v[2] == 0 for v in got.values()) or max(got) < L_DIV_MIN


def test_l_diversity_l_min_is_a_real_parameter(spark):
    from currency_etl_spark.queries.curation import customers_l_diversity

    base = {r["l"]: r for r in customers_l_diversity(spark, SF).collect()}
    none = {r["l"]: r for r in customers_l_diversity(spark, SF, l_min=1).collect()}
    all_risky = {
        r["l"]: r for r in customers_l_diversity(spark, SF, l_min=10**6).collect()
    }
    assert set(base) == set(none) == set(all_risky)
    for l, r in base.items():
        assert (r["n_groups"], r["n_customers"]) == (
            none[l]["n_groups"], none[l]["n_customers"]
        )
        assert none[l]["at_risk"] == 0
        assert all_risky[l]["at_risk"] == 1


def test_l_diversity_orderless_customers_release_none(spark, tmp_path):
    """Customers with no orders release sensitive value 'NONE': a corpus
    where nobody ordered collapses every group to l = 1 (all at_risk) —
    the release-completeness edge the LEFT join exists for."""
    import pyarrow.parquet as pq

    from currency_etl_spark.queries.curation import customers_l_diversity

    cust = pd.read_parquet(f"{SF}/customer.parquet").head(40)
    cust.to_parquet(tmp_path / "customer.parquet")
    # slice(0, 0) keeps the real column types — pandas' empty head(0)
    # degrades object columns to the null type and breaks the schema
    pq.write_table(
        pq.read_table(f"{SF}/orders.parquet").slice(0, 0),
        tmp_path / "orders.parquet",
    )
    rows = customers_l_diversity(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["l"], r["at_risk"]) == (1, 1)
    assert r["n_customers"] == 40
