"""Bucketed co-located join: same results as the plain join, with ZERO
shuffle exchanges in the physical plan."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from currency_etl_spark.operators.bucketing import bucketed_join, write_bucketed
from currency_etl_spark.sources import table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # session warehouse dir is set by session.get_spark (static conf)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    return orders, li


def test_bucketed_join_no_shuffle(spark, bucketed):
    joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
    # force a non-broadcast join to prove bucketing (not broadcasting) kills
    # the exchange: disable auto-broadcast for this plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = joined.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"),
        )
        jvm = spark._jvm
        plan = jvm.PythonSQLUtils.explainString(joined._jdf.queryExecution(), "formatted")
        assert "SortMergeJoin" in plan
        # bucketed scan feeds the join directly — no shuffle on either side
        assert not re.search(r"Exchange hashpartitioning", plan), plan
        rows = {r["o_orderstatus"]: (r["n"], r["qty"]) for r in agg.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # equivalence with the plain path-based join
    orders, li = bucketed[0], bucketed[1]
    plain = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"),
        )
    )
    want = {r["o_orderstatus"]: (r["n"], r["qty"]) for r in plain.collect()}
    assert rows == want
