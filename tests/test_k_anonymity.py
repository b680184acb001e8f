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
