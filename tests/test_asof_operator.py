"""The generalized as-of join operator (operators/asof.py) against pandas
merge_asof — the de-facto semantics reference — across both directions,
exact-match handling, tolerance, same-instant right-side ties, and
empty-group edges."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from currency_etl_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 3, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


# left: (key, ts, lid) — includes instants with no right match, exact-tie
# instants, and a key absent from the right side entirely
LEFT = [
    ("a", _ts(0), 1),
    ("a", _ts(5), 2),
    ("a", _ts(10), 3),
    ("b", _ts(3), 4),
    ("b", _ts(3), 5),     # duplicate left instants
    ("c", _ts(7), 6),     # no right rows at all
]
# right: (key, ts, seq, val) — includes a same-instant tie (seq 20/21)
RIGHT = [
    ("a", _ts(0), 10, 100.0),
    ("a", _ts(4), 11, 101.0),
    ("a", _ts(4), 12, 102.0),  # tie at minute 4
    ("a", _ts(9), 13, 103.0),
    ("b", _ts(2), 20, 200.0),
    ("b", _ts(6), 21, 201.0),
]


def _pandas_asof(direction: str, exact: bool, tol_s: float | None):
    lf = pd.DataFrame(LEFT, columns=["key", "ts", "lid"]).sort_values(["ts", "lid"])
    rf = pd.DataFrame(RIGHT, columns=["key", "ts", "seq", "val"]).sort_values(
        ["ts", "seq"]
    )
    kw = {}
    if tol_s is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tol_s)
    m = pd.merge_asof(
        lf,
        rf.rename(columns={"ts": "rts"}),
        left_on="ts",
        right_on="rts",
        by="key",
        direction=direction,
        allow_exact_matches=exact,
        **kw,
    )
    return {
        int(r.lid): (None if pd.isna(r.val) else float(r.val))
        for r in m.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("tol_s", [None, 120.0])
def test_asof_matches_pandas(spark, direction, exact, tol_s):
    lf = spark.createDataFrame(LEFT, "key string, ts timestamp, lid long")
    rf = spark.createDataFrame(RIGHT, "key string, ts timestamp, seq long, val double")
    out = asof_join(
        lf,
        rf,
        on="ts",
        by=["key"],
        value_cols=["val"],
        seq="seq",
        direction=direction,
        tolerance_s=tol_s,
        allow_exact_matches=exact,
    )
    got = {r.lid: r.val_right for r in out.collect()}
    want = _pandas_asof(direction, exact, tol_s)
    assert got == want, f"{direction} exact={exact} tol={tol_s}"


def test_asof_single_shuffle_plan(spark):
    import re

    lf = spark.createDataFrame(LEFT, "key string, ts timestamp, lid long")
    rf = spark.createDataFrame(RIGHT, "key string, ts timestamp, seq long, val double")
    out = asof_join(lf, rf, on="ts", by=["key"], value_cols=["val"], seq="seq")
    jvm = spark._jvm
    p = jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    # one hash exchange on the by key; no join operator at all
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "Join" not in p, p


def test_asof_random_large_case_matches_pandas(spark):
    """One seeded random corpus with deliberate collisions: coarse
    timestamp quantization forces many same-instant rows on both sides,
    so tie handling is exercised at volume, not just in the fixture."""
    import random

    rng = random.Random(42)
    keys = [f"k{i}" for i in range(8)]
    left = [
        (rng.choice(keys), _ts(rng.randrange(0, 240) * 5), i)
        for i in range(500)
    ]
    right = [
        (rng.choice(keys), _ts(rng.randrange(0, 240) * 5), 10_000 + i, float(i))
        for i in range(300)
    ]
    lf = spark.createDataFrame(left, "key string, ts timestamp, lid long")
    rf = spark.createDataFrame(right, "key string, ts timestamp, seq long, val double")

    for direction in ("backward", "forward"):
        out = asof_join(
            lf, rf, on="ts", by=["key"], value_cols=["val"], seq="seq",
            direction=direction,
        )
        got = {r.lid: r.val_right for r in out.collect()}

        lp = pd.DataFrame(left, columns=["key", "ts", "lid"]).sort_values(["ts", "lid"])
        rp = pd.DataFrame(right, columns=["key", "ts", "seq", "val"]).sort_values(
            ["ts", "seq"]
        )
        m = pd.merge_asof(
            lp, rp.rename(columns={"ts": "rts"}),
            left_on="ts", right_on="rts", by="key", direction=direction,
        )
        want = {
            int(r.lid): (None if pd.isna(r.val) else float(r.val))
            for r in m.itertuples()
        }
        assert got == want, direction
