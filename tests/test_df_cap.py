"""Document-frequency cap (queries/llm_ops._cap_groups): the guard that
keeps posting-list pair generation bounded at 100 TB. Groups larger than
the cap are dropped BEFORE collect_list/pair explosion, and the window
count's hash exchange is reused by the downstream groupBy (one shuffle
total, not two)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from currency_etl_spark.queries.llm_ops import DF_CAP, _cap_groups, _ordered_pairs


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_cap_drops_hot_groups_keeps_cold(spark):
    # key 'hot' has 5 members, 'cold' has 3 — cap=3 must drop hot entirely
    rows = [("hot", i) for i in range(5)] + [("cold", i) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, doc_id int")
    kept = _cap_groups(df, ["k"], cap=3).collect()
    assert {r.k for r in kept} == {"cold"}
    assert len(kept) == 3


def test_capped_pair_count_is_bounded(spark):
    # after cap=4, no group can emit more than C(4,2)=6 pairs
    rows = [(f"g{g}", i) for g in range(3) for i in range(g + 3)]  # groups of 3,4,5
    df = spark.createDataFrame(rows, "k string, doc_id int")
    pairs = (
        _cap_groups(df, ["k"], cap=4)
        .groupBy("k")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") > 1)
        .select("k", F.explode(_ordered_pairs(F.col("docs"))).alias("p"))
    )
    per_group = {r.k: r.n for r in pairs.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert per_group == {"g0": 3, "g1": 6}  # g2 (size 5) dropped by the cap


def test_cap_window_exchange_reused_by_groupby(spark):
    # window partitionBy(k) then groupBy(k): Catalyst must plan ONE exchange
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, doc_id int")
    out = (
        _cap_groups(df, ["k"], cap=DF_CAP)
        .groupBy("k")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
    )
    p = plan_of(out)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_default_cap_is_noop_on_testdata(spark, sf_dir):
    # at every test SF the observed max group size is far below DF_CAP, so
    # the cap must not change results there (scale guard only)
    from currency_etl_spark.sources import table

    part = table(spark, sf_dir, "part")
    b = part.select("p_partkey", "p_brand", "p_size")
    assert _cap_groups(b, ["p_brand", "p_size"]).count() == b.count()
