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


def test_append_mode_watermark_emits_closed_windows(spark, tmp_path):
    """Watermark + append mode: hourly windows are emitted only once the
    watermark passes their end — late rows inside the watermark still count,
    and the emitted finals match a batch aggregation of the same data."""
    import datetime as dt

    from pyspark.sql import functions as F

    src = tmp_path / "wm_stream"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    batch1 = [(i, base + dt.timedelta(minutes=10 * i), 1.0) for i in range(6)]  # 00:00-00:50
    batch2 = [
        (100, base + dt.timedelta(minutes=55), 2.0),   # late-but-in-watermark for hour 0
        (101, base + dt.timedelta(hours=3), 5.0),      # advances watermark far past hour 0+1
        (102, base + dt.timedelta(hours=3, minutes=5), 7.0),
    ]
    schema = "event_id long, ts timestamp, value double"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b1")
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b2")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch → watermark advances between
        .parquet(str(src / "*"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = {
        str(r["win"]["start"]): (r["n"], r["v"]) for r in spark.table("wm_out").collect()
    }
    # hour-0 window closed (watermark at ~03:05-10min) and includes ALL 7 rows
    assert emitted.get("2024-01-01 00:00:00") == (7, 8.0)
    # hour-3 window is still open (watermark hasn't passed 04:00) → not emitted
    assert "2024-01-01 03:00:00" not in emitted


def test_interval_join_pairs_across_micro_batches(spark, tmp_path):
    """A click buffered in micro-batch 1 must still join a purchase that
    only arrives in micro-batch 2 — the cross-batch state behavior the
    single-file batch oracle cannot exercise."""
    import datetime as dt

    from pyspark.sql import Row

    from currency_etl_spark.streaming.jobs import interval_join_pairs

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def ev(eid, uid, typ, minutes):
        return Row(
            event_id=eid,
            ts=t0 + dt.timedelta(minutes=minutes),
            user_id=uid,
            event_type=typ,
            value=1.0,
            props="{}",
        )

    landing = tmp_path / "landing"
    landing.mkdir()
    # file 1: clicks only — user 1 in-window, user 2 too early (>1h before)
    clicks = [ev(101, 1, "click", 0), ev(102, 2, "click", 0)]
    spark.createDataFrame(clicks).coalesce(1).write.mode("append").parquet(str(landing))
    # file 2: purchases — user 1 at +30min (pair), user 2 at +2h (no pair),
    # user 3 with no click at all (no pair)
    purchases = [ev(201, 1, "purchase", 30), ev(202, 2, "purchase", 120), ev(203, 3, "purchase", 40)]
    spark.createDataFrame(purchases).coalesce(1).write.mode("append").parquet(str(landing))

    schema = spark.read.parquet(str(landing)).schema
    stream = lambda: (  # noqa: E731
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(str(landing))
    )
    q = (
        interval_join_pairs(stream(), stream())
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("interval_join_xbatch")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["purchase_id"], r["click_id"])
        for r in spark.table("interval_join_xbatch").collect()
    }
    assert got == {(1, 201, 101)}


def test_quantized_running_totals_state_across_micro_batches(spark, sf_dir, tmp_path):
    """The graded streaming_running_totals state machine (int64-quantized
    exact fold, streaming/jobs._running_totals_fn) must CARRY state across
    micro-batches: drive three single-file batches through it with
    maxFilesPerTrigger=1 and assert (a) the final per-user totals equal
    the batch aggregate of all files, and (b) a user present in several
    batches emitted strictly increasing running counts — the proof the
    second batch read the first batch's state rather than restarting."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from currency_etl_spark.streaming.jobs import (
        RUNNING_TOTALS_OUT_SCHEMA,
        RUNNING_TOTALS_SCALE,
        RUNNING_TOTALS_STATE_SCHEMA,
        _running_totals_fn,
        quantize_event_values,
    )

    src = tmp_path / "events_batches"
    events = table(spark, sf_dir, "events").select("user_id", "value").limit(300)
    # three disjoint files = three micro-batches under maxFilesPerTrigger=1
    parts = events.withColumn(
        "part", F.pmod(F.xxhash64("user_id", "value"), F.lit(3))
    )
    for i in range(3):
        parts.filter(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))

    schema = spark.read.parquet(str(src / "b0")).schema
    stream = quantize_event_values(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    q = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_TOTALS_OUT_SCHEMA,
            stateStructType=RUNNING_TOTALS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("rt_batches_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("rt_batches_out").collect()

    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in spark.read.parquet(str(src / "b*"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("value").cast("decimal(18,4)") * RUNNING_TOTALS_SCALE).cast("long")
            ).alias("t"),
        )
        .collect()
    }
    final = {}
    multi_emit = 0
    seen: dict = {}
    for r in emitted:
        seen.setdefault(r["user_id"], []).append(r["n_events"])
    for uid, counts in seen.items():
        final[uid] = max(counts)
        if len(counts) > 1:
            multi_emit += 1
            assert len(set(counts)) == len(counts)  # counts never repeat/reset across batches
    got = {
        r["user_id"]: (r["n_events"], r["total_q"])
        for r in emitted
        if r["n_events"] == final[r["user_id"]]
    }
    assert got == want
    assert multi_emit > 0  # at least one user genuinely crossed batches


def test_streaming_scd2_versions_continue_across_micro_batches(spark, sf_dir, tmp_path):
    """The SCD2 state machine must continue version numbering and change
    detection ACROSS micro-batches under the append-ordered-log contract:
    split events into two time-ordered files, drive them as separate
    batches (maxFilesPerTrigger=1, mtimes pinned so file order == time
    order), and assert the emitted history equals the batch
    events_scd2_history over the same rows — including versions that
    straddle the batch boundary, and NO duplicate (user, version) rows."""
    import os
    import time

    from pyspark.sql import functions as F
    from pyspark.sql import Window as W
    from pyspark.sql.streaming.state import GroupStateTimeout

    from currency_etl_spark.streaming.jobs import _scd2_fn

    src = tmp_path / "scd2_batches"
    events = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    cut = events.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    early = events.filter(F.unix_micros("ts") <= cut)
    late = events.filter(F.unix_micros("ts") > cut)
    early.coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))
    late.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    now = time.time()
    for i, b in enumerate(("b0", "b1")):  # file order == event-time order
        for f in (src / b).iterdir():
            os.utime(f, (now + i * 10, now + i * 10))

    schema = spark.read.parquet(str(src / "b0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src / "b*"))
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "event_type")
    )
    q = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _scd2_fn,
            outputStructType="user_id long, event_type string, valid_from_us long, version long",
            stateStructType="cur_type string, cur_from long, version long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("scd2_xbatch_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("scd2_xbatch_out").collect()
    got = {(r["user_id"], r["version"]): (r["event_type"], r["valid_from_us"]) for r in emitted}
    assert len(got) == len(emitted)  # a version is emitted exactly once

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    hist = (
        events.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .withColumn(
            "version",
            F.row_number()
            .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
            .cast("long"),
        )
        .select("user_id", "event_type", F.unix_micros("ts").alias("vf"), "version")
    )
    want = {(r["user_id"], r["version"]): (r["event_type"], r["vf"]) for r in hist.collect()}
    assert got == want


def test_sessions_append_is_closed_subset_of_batch_sessionize(spark, sf_dir):
    """The append-mode session entry is pinned row-identical to the batch
    twin: every emitted session matches the sessionize operator's
    (start, end, count) for that (user_id, session ordinal), the emitted
    set is EXACTLY the sessions closing by max(ts) - 1h (the final
    no-data batch's eviction watermark), and at least one trailing
    session is withheld (otherwise the append semantics are vacuous on
    this corpus)."""
    import datetime

    from pyspark.sql import functions as F

    from currency_etl_spark.operators.sessionize import sessionize
    from currency_etl_spark.sources import table
    from currency_etl_spark.streaming.jobs import streaming_sessions_append

    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in streaming_sessions_append(spark, sf_dir).collect()
    }

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    batch = (
        sessionize(ev, gap_s=1800)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    wm = ev.agg(F.max("ts")).first()[0] - datetime.timedelta(hours=1)
    want_all = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in batch.collect()
    }
    want_closed = {k: v for k, v in want_all.items() if k[2] <= wm}
    assert got == want_closed
    assert len(want_closed) < len(want_all)  # something was withheld


def test_landing_link_setup_is_thread_safe(tmp_path):
    """The pool's 8 builder threads all race the landing-dir symlink
    setup on a COLD start (fresh /tmp): lexists-then-symlink crashed the
    loser with FileExistsError and took the whole pool start down (first
    sf0.1 bench pass of round 15). The serialized helper must survive
    the fan-out and land exactly one correct link; a stale link (the
    regenerated-corpus armor) must retarget."""
    import os
    import threading

    from currency_etl_spark.streaming.jobs import _ensure_landing_link

    target = tmp_path / "t.parquet"
    target.write_bytes(b"x")
    for trial in range(20):
        d = tmp_path / f"land{trial}"
        errs = []

        def go():
            try:
                _ensure_landing_link(str(d), "t.parquet", str(target))
            except Exception as ex:  # pragma: no cover - the regression
                errs.append(ex)

        ts = [threading.Thread(target=go) for _ in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert errs == []
        assert os.readlink(str(d / "t.parquet")) == str(target)
    # retarget armor: a link left behind by a regenerated corpus moves
    stale = tmp_path / "stale.parquet"
    stale.write_bytes(b"y")
    d = tmp_path / "land_retarget"
    _ensure_landing_link(str(d), "t.parquet", str(stale))
    _ensure_landing_link(str(d), "t.parquet", str(target))
    assert os.readlink(str(d / "t.parquet")) == str(target)
