"""Tie-semantics robustness for the SCD2 family: same-instant changes.

The corpus has (practically) unique (user_id, ts) pairs, so the driver's
oracle never exercises the tie-break. A dimension rebuilt from a real CDC
log WILL see same-timestamp changes (bulk imports, clock-truncated
sources); both the history builder and the bulk fact-version stamp order
on (ts, event_id), and this synthetic corpus pins that the two engines
agree under ties — two changes at the same instant, duplicate rows, and
no-change runs.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from currency_etl_spark.catalog import load_catalog
from tests.conftest import assert_matches_oracle

CATALOG = load_catalog()

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _tick(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


ROWS = [
    # (event_id, ts, user_id, event_type, value, props)
    # user 1: two different types at the SAME instant (tie -> event_id order),
    # then a later duplicate-type event (no change)
    (1, _tick(0), 1, "view", 1.0, "{}"),
    (2, _tick(0), 1, "click", 1.0, "{}"),
    (3, _tick(5), 1, "click", 1.0, "{}"),
    # user 2: single event
    (4, _tick(1), 2, "view", 1.0, "{}"),
    # user 3: A -> A -> B -> B -> A (change compression with runs)
    (5, _tick(0), 3, "view", 1.0, "{}"),
    (6, _tick(1), 3, "view", 1.0, "{}"),
    (7, _tick(2), 3, "purchase", 1.0, "{}"),
    (8, _tick(3), 3, "purchase", 1.0, "{}"),
    (9, _tick(4), 3, "view", 1.0, "{}"),
    # user 4: three changes, two at the same instant out of id order with
    # a third event between them by id but later by ts
    (12, _tick(0), 4, "view", 1.0, "{}"),
    (10, _tick(0), 4, "click", 1.0, "{}"),
    (11, _tick(9), 4, "purchase", 1.0, "{}"),
    # user 5: TWO clicks at the same instant, then a purchase — the as-of
    # tie (engine rule: highest event_id wins)
    (20, _tick(0), 5, "click", 10.0, "{}"),
    (21, _tick(0), 5, "click", 20.0, "{}"),
    (22, _tick(1), 5, "purchase", 5.0, "{}"),
]


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("scd2_ties")
    df = spark.createDataFrame(
        ROWS,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def tie_ddb(tie_dir):
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tie_dir}/events.parquet/*.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["events_scd2_history", "events_scd2_fact_version", "events_scd2_asof"]
)
def test_scd2_family_oracle_holds_under_ties(name, spark, tie_dir, tie_ddb):
    spec = CATALOG[name]
    assert_matches_oracle(spec.spark_fn(spark, tie_dir), tie_ddb, spec.oracle, name)


def test_tie_break_is_event_id_order(spark, tie_dir):
    hist = {
        (r.user_id, r.version): r
        for r in CATALOG["events_scd2_history"].spark_fn(spark, tie_dir).collect()
    }
    # user 1: version 1 is 'view' (event_id 1), version 2 'click' (event_id 2),
    # and the later duplicate click did NOT open a third version
    assert hist[(1, 1)].event_type == "view"
    assert hist[(1, 2)].event_type == "click"
    assert (1, 3) not in hist
    # same-instant intervals: v1 is [t, t) — closed by the tie sibling
    assert hist[(1, 1)].valid_to == hist[(1, 2)].valid_from
    # user 4: id order at the tied instant is 10 ('click') then 12 ('view')
    assert hist[(4, 1)].event_type == "click"
    assert hist[(4, 2)].event_type == "view"
    assert hist[(4, 3)].event_type == "purchase"
    # user 3: runs compress to 3 versions
    assert {v for (u, v) in hist if u == 3} == {1, 2, 3}


def test_fact_version_assigns_tied_events_their_own_versions(spark, tie_dir):
    facts = {
        r.event_id: r.version
        for r in CATALOG["events_scd2_fact_version"].spark_fn(spark, tie_dir).collect()
    }
    assert facts[1] == 1 and facts[2] == 2 and facts[3] == 2
    assert facts[10] == 1 and facts[12] == 2 and facts[11] == 3


def test_asof_click_tie_highest_event_id_wins(spark, tie_dir):
    """Two same-user clicks at the same instant: the as-of join must pick
    ONE deterministically (the engine rule is highest event_id). DuckDB's
    ASOF join leaves the tie unspecified, so this is pinned here rather
    than in the oracle."""
    rows = {
        r.event_id: r
        for r in CATALOG["asof_purchase_last_click"].spark_fn(spark, tie_dir).collect()
    }
    assert rows[22].click_value == 20.0  # event 21, not event 20
    assert rows[22].click_ts == T0
    # rerun → same answer (determinism, not partition-merge luck)
    again = {
        r.event_id: r.click_value
        for r in CATALOG["asof_purchase_last_click"].spark_fn(spark, tie_dir).collect()
    }
    assert again[22] == 20.0
