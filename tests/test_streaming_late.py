"""streaming_late_drop invariants beyond the oracle equality: the policy
must be non-vacuous (some late rows genuinely dropped, some genuinely
accepted) and the tail windows the watermark never closed must be absent.
The two-watermark semantics the oracle encodes (late filter lags eviction
by one batch; merge precedes evict) were decoded empirically — this file
is also their regression pin."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from currency_etl_spark.streaming.jobs import LATE_MOD, streaming_late_drop
from currency_etl_spark.sources import table


def _raw(spark, sf_dir) -> pd.DataFrame:
    pdf = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_id", "ts", "event_type")
        .toPandas()
    )
    ts = pdf["ts"]
    if getattr(ts.dtype, "tz", None) is not None:
        ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    pdf["us"] = ts.astype("datetime64[us]").astype("int64")
    pdf["win_end_us"] = (pdf["us"] // 3_600_000_000) * 3_600_000_000 + 3_600_000_000
    return pdf


def test_late_drop_is_nonvacuous_and_exact(spark, sf_dir):
    out = streaming_late_drop(spark, sf_dir).toPandas()
    pdf = _raw(spark, sf_dir)
    late = pdf[pdf["event_id"] % LATE_MOD == 0]
    ontime = pdf[pdf["event_id"] % LATE_MOD != 0]
    mid = (ontime["us"].min() + ontime["us"].max()) // 2
    wm_filter = ontime.loc[ontime["us"] <= mid, "us"].max() - 1_800_000_000
    wm_final = ontime["us"].max() - 1_800_000_000

    dropped = late[late["win_end_us"] <= wm_filter]
    accepted = late[late["win_end_us"] > wm_filter]
    assert len(dropped) > 0, "policy vacuous: no late row was ever dropped"
    assert len(accepted) > 0, "policy vacuous: every late row was dropped"

    # emitted totals == on-time-in-closed-windows + accepted-late-in-closed
    kept = pd.concat([ontime, accepted])
    expected_total = int((kept["win_end_us"] <= wm_final).sum())
    assert int(out["n_events"].sum()) == expected_total


def test_late_drop_unclosed_tail_absent(spark, sf_dir):
    """Windows the final watermark never closed (the last ~90 minutes of
    on-time event time) must not appear in the append-mode output."""
    out = streaming_late_drop(spark, sf_dir).toPandas()
    pdf = _raw(spark, sf_dir)
    ontime = pdf[pdf["event_id"] % LATE_MOD != 0]
    wm_final = ontime["us"].max() - 1_800_000_000
    starts = pd.to_datetime(out["window_start"]).astype("datetime64[us]").astype("int64")
    assert ((starts + 3_600_000_000) <= wm_final).all()
    # and at least one window exists right at the closing edge
    assert len(out) > 0


def test_staged_dir_rebuilds_on_corpus_regeneration(spark, sf_dir, tmp_path):
    """A corpus regeneration under the SAME path must invalidate the staged
    landing dir (the round-4 failure class: /tmp outlives /root/testdata)."""
    import os
    import shutil

    from currency_etl_spark.streaming.jobs import _staged_late_dir

    # copy the corpus so we can regenerate it
    my_sf = tmp_path / "sfX"
    my_sf.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), my_sf / "events.parquet")
    stage1 = _staged_late_dir(spark, str(my_sf))
    files1 = {f: os.stat(os.path.join(stage1, f)).st_mtime_ns
              for f in os.listdir(stage1) if f.endswith(".parquet")}
    # same content → cache hit (marker fingerprint matches)
    assert _staged_late_dir(spark, str(my_sf)) == stage1
    files1b = {f: os.stat(os.path.join(stage1, f)).st_mtime_ns
               for f in os.listdir(stage1) if f.endswith(".parquet")}
    # (pinned utimes make equality meaningful: rebuild would reset them)
    assert files1b == files1
    # "regenerate" the corpus: rewrite the file with a different mtime
    src = my_sf / "events.parquet"
    os.utime(src, (1800000000, 1800000000))
    # cached table plans pin the old file listing — a regenerated corpus
    # is a new application in the driver's world; clear the local cache
    from currency_etl_spark import sources

    sources._TABLE_CACHE.clear()
    stage2 = _staged_late_dir(spark, str(my_sf))
    assert stage2 == stage1  # same location...
    marker = open(os.path.join(stage2, "_SOURCE")).read()
    assert "1800000000" in marker  # ...but rebuilt against the new version
