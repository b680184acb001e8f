"""Streaming tests: foreachBatch MERGE ingest across micro-batches
(checkpoint resume + last-write-wins), the stateful applyInPandasWithState
operator vs a batch groupBy oracle, and state carry-over across batches."""

from __future__ import annotations

import datetime as _dt

import pytest

from currency_etl_spark.sources import table
from currency_etl_spark.streaming.ingest import stream_ingest_upsert, user_running_totals
from currency_etl_spark.warehouse import ParquetUpsertTable
from tests.fixtures import START, nbu_records, rate_for, write_raw_json


def test_stream_ingest_upsert_two_batches(spark, tmp_path):
    landing = tmp_path / "landing"
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    write_raw_json(nbu_records(days=10), str(landing / "batch1.json"))
    stream_ingest_upsert(spark, str(landing), wh, ckpt)
    t = ParquetUpsertTable(spark, wh, ["cc", "exchangedate"])
    assert t.read().count() == 20  # 10 days × USD/EUR

    # batch 2: corrected rates for days 5-9 → last-write-wins on re-run
    corrected = [dict(r, rate=round(r["rate"] + 3.0, 2)) for r in nbu_records(days=10)[5 * 4 :]]
    write_raw_json(corrected, str(landing / "batch2.json"))
    stream_ingest_upsert(spark, str(landing), wh, ckpt)  # resumes from checkpoint
    cur = t.read()
    assert cur.count() == 20
    day7 = cur.filter(
        (cur.cc == "USD") & (cur.exchangedate == START + _dt.timedelta(days=7))
    ).collect()[0]
    assert day7["rate"] == pytest.approx(rate_for("USD", 7) + 3.0)


def test_stateful_running_totals_matches_batch(spark, sf_dir, tmp_path):
    events = table(spark, sf_dir, "events")
    src_dir = tmp_path / "events_stream"
    events.limit(500).write.mode("overwrite").parquet(str(src_dir))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src_dir)).schema
    ).parquet(str(src_dir))
    q = (
        user_running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("totals_out").collect()
    }
    from pyspark.sql import functions as F

    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in spark.read.parquet(str(src_dir))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0]
        assert got[uid][1] == pytest.approx(want[uid][1])
