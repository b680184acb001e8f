"""Tests for the remaining reference surface (Telegram subscriber registry,
DDL, delivery sink) and the skew-salting join utility."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from currency_etl_spark.ddl import ensure_tables
from currency_etl_spark.notify import (
    TELEGRAM_USERS_SCHEMA,
    send_report,
    subscribe,
    subscribers_table,
    unsubscribe,
)
from currency_etl_spark.operators.skew import salted_join


def _users(spark, rows):
    return spark.createDataFrame(rows, TELEGRAM_USERS_SCHEMA)


def test_subscribe_is_insert_if_absent(spark, tmp_path):
    t = subscribers_table(spark, str(tmp_path / "subs"))
    subscribe(t, _users(spark, [(1, "a", "A", None), (2, "b", "B", None)]))
    # /start again with a changed username must NOT overwrite (DO NOTHING)
    subscribe(t, _users(spark, [(1, "a_changed", "A", None), (3, "c", "C", None)]))
    rows = {r["chat_id"]: r["username"] for r in t.read().collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}

    unsubscribe(t, [2])
    assert sorted(r["chat_id"] for r in t.read().collect()) == [1, 3]


def test_send_report_driver_and_distributed(spark, tmp_path):
    t = subscribers_table(spark, str(tmp_path / "subs2"))
    subscribe(t, _users(spark, [(10, "x", None, None), (20, "y", None, None)]))
    sent = []
    n = send_report(t.read(), "rate report", lambda cid, msg: sent.append((cid, msg)))
    assert n == 2
    assert sorted(sent) == [(10, "rate report"), (20, "rate report")]
    # distributed path executes without error (side effects land on executors)
    assert send_report(t.read(), "x", lambda cid, msg: None, distributed=True) == -1


def test_ensure_tables_idempotent(spark, tmp_path):
    ensure_tables(spark, db="currency_test", base_path=str(tmp_path / "cat"))
    ensure_tables(spark, db="currency_test", base_path=str(tmp_path / "cat"))  # rerun OK
    cols = [f.name for f in spark.table("currency_test.exchange_rates").schema.fields]
    assert cols == ["cc", "txt", "rate", "rate_per_100", "exchangedate", "created_at"]
    assert spark.table("currency_test.telegram_users").count() == 0


def test_salted_join_matches_plain_join(spark):
    # skewed big side: 90% of rows share key 7
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("w")
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    salted = salted_join(big, small, "k", n_salts=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    a = {r["k"]: (r["n"], r["sv"], r["sw"]) for r in plain.collect()}
    b = {r["k"]: (r["n"], r["sv"], r["sw"]) for r in salted.collect()}
    assert a == b


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.range(0, 100).select((F.col("id") % 60).alias("k"), F.col("id").alias("v"))
    small = spark.range(0, 50).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", n_salts=4, how="left")
    assert salted.count() == plain.count()
    assert salted.filter("w IS NULL").count() == plain.filter("w IS NULL").count()


def test_salted_agg_matches_plain_groupby(spark):
    from pyspark.sql import functions as F

    from currency_etl_spark.operators.skew import salted_agg

    # one pathologically hot key + uniform tail
    rows = [(1, i, float(i % 7)) for i in range(500)] + [
        (k, 1000 + k, float(k)) for k in range(2, 40)
    ]
    df = spark.createDataFrame(rows, "k long, uid long, v double").select(
        "k", "uid", F.col("v").cast("decimal(18,4)").alias("v")
    )
    salted = salted_agg(
        df, key="k", salt_src="uid",
        aggs={"sv": (F.sum, F.sum, "v"), "n": (F.count, F.sum, "v")},
    )
    plain = df.groupBy("k").agg(F.sum("v").alias("sv"), F.count("v").alias("n"))
    a = {r["k"]: (r["sv"], r["n"]) for r in salted.collect()}
    b = {r["k"]: (r["sv"], r["n"]) for r in plain.collect()}
    assert a == b
    # determinism: re-run is identical (hash salt, not rand)
    a2 = {r["k"]: (r["sv"], r["n"]) for r in salted_agg(
        df, key="k", salt_src="uid",
        aggs={"sv": (F.sum, F.sum, "v"), "n": (F.count, F.sum, "v")},
    ).collect()}
    assert a == a2
