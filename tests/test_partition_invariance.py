"""Partition-invariance harness: every entry whose output passes through
a float-derived fold (quantized int64 sums, decimal folds, exact
percentiles) must produce BIT-IDENTICAL results when the shuffle layout
changes. This is the local stand-in for 'same answer on 32 tasks and on
2000 tasks' — the determinism property the oracle comparison relies on
and a re-run on a real cluster would exercise for free.

Mechanism: run each entry at the session default (32 shuffle partitions),
then again with spark.sql.shuffle.partitions=7 (prime, so every
hash-partitioned fold regroups differently), and compare the full result
frames value-exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest

from currency_etl_spark.catalog import load_catalog

CATALOG = load_catalog()

#: Entries with cross-partition folds of float-derived values — the ones
#: that would silently drift if a quantization step were dropped.
FOLD_ENTRIES = [
    "embeddings_dim_stats",
    "embedding_label_outliers",
    "docs_source_token_divergence",
    "events_click_attribution",
    "events_autocorrelation",
    "events_type_correlation",
    "customers_rfm_segments",
    "orders_market_basket",
    "events_transition_dwell",
    # round-6 rank rewires: the decimal-quantized range-split key and the
    # rank-weighted decimal fold must regroup identically
    "customers_spend_gini",
    "parts_revenue_pareto",
]


def _run(spark, sf_dir, name) -> pd.DataFrame:
    df = CATALOG[name].spark_fn(spark, sf_dir).toPandas()
    return (
        df[sorted(df.columns)]
        .sort_values(by=sorted(df.columns))
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("name", FOLD_ENTRIES)
def test_result_invariant_under_shuffle_relayout(name, spark, sf_dir):
    base = _run(spark, sf_dir, name)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        alt = _run(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    pd.testing.assert_frame_equal(base, alt, check_exact=True, obj=name)
