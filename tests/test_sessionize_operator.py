"""The gap-sessionize operator (operators/sessionize.py) against a Python
reference, including the >= boundary convention (session_window parity),
same-instant ties, and per-group independence."""

from __future__ import annotations

import datetime as dt

from currency_etl_spark.operators.sessionize import sessionize

T0 = dt.datetime(2024, 6, 1)


def _ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


GAP = 60  # seconds

ROWS = [
    # user 1: gaps 59 (same session), exactly 60 (NEW — >= convention), 61 (new)
    ("u1", _ts(0), 1),
    ("u1", _ts(59), 2),
    ("u1", _ts(119), 3),   # 60s after previous -> new session
    ("u1", _ts(180), 4),   # 61s after previous -> new session
    # user 2: same-instant tie -> one session, deterministic order
    ("u2", _ts(0), 5),
    ("u2", _ts(0), 6),
    ("u2", _ts(30), 7),
    # user 3: single event
    ("u3", _ts(500), 8),
]


def _python_reference():
    sessions = {}
    by_user: dict = {}
    for u, t, i in ROWS:
        by_user.setdefault(u, []).append((t, i))
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for t, i in evs:
            if prev is None or (t - prev).total_seconds() >= GAP:
                sid += 1
            sessions[i] = sid
            prev = t
    return sessions


def test_sessionize_matches_reference(spark):
    df = spark.createDataFrame(ROWS, "user_id string, ts timestamp, event_id long")
    out = sessionize(df, gap_s=GAP)
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == _python_reference()
    # boundary pin: exactly-gap spacing opens a session (>= convention)
    assert got[3] == got[2] + 1


def test_sessionize_single_shuffle(spark):
    import re

    df = spark.createDataFrame(ROWS, "user_id string, ts timestamp, event_id long")
    out = sessionize(df, gap_s=GAP)
    p = spark._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
