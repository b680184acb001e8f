"""Cross-entry consistency: independent catalog entries that measure the
same underlying quantity must agree exactly. These checks catch a
semantics drift in ONE entry that its own oracle (sharing the drifted
formulation) would not."""

from __future__ import annotations

import pytest

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.sources import table

CATALOG = load_catalog()


def test_dwell_and_transition_counts_agree(spark, sf_dir):
    dwell = (
        CATALOG["events_transition_dwell"].spark_fn(spark, sf_dir).toPandas()
        .set_index(["prev_type", "event_type"])
    )
    trans = (
        CATALOG["events_type_transitions"].spark_fn(spark, sf_dir).toPandas()
        .set_index(["prev_type", "next_type"])
    )
    assert set(dwell.index) == set(trans.index)
    for key in dwell.index:
        assert dwell.loc[key].n_transitions == trans.loc[key].n_transitions


def test_hourly_rollup_accounts_every_event(spark, sf_dir):
    hourly = CATALOG["events_hourly"].spark_fn(spark, sf_dir).toPandas()
    assert hourly.n_events.sum() == table(spark, sf_dir, "events").count()


def test_rfm_and_migration_account_same_customers(spark, sf_dir):
    rfm = CATALOG["customers_rfm_segments"].spark_fn(spark, sf_dir).toPandas()
    mig = CATALOG["customers_segment_migration"].spark_fn(spark, sf_dir).toPandas()
    assert rfm.n_customers.sum() == mig.n_customers.sum()
    orders = table(spark, sf_dir, "orders")
    assert rfm.n_customers.sum() == orders.select("o_custkey").distinct().count()
    assert rfm.n_orders.sum() == orders.count()


def test_funnel_and_protocol_audit_agree_on_signups(spark, sf_dir):
    # both entries independently count 'users with >= 1 signup event'
    funnel = CATALOG["events_funnel"].spark_fn(spark, sf_dir).toPandas()
    audit = (
        CATALOG["events_state_machine_audit"].spark_fn(spark, sf_dir).toPandas()
        .set_index("rule")
    )
    assert int(funnel.stage_signup.iloc[0]) == int(
        audit.loc["signup_not_first"].n_applicable
    )
    ev = table(spark, sf_dir, "events")
    n_purchasers = (
        ev.where("event_type = 'purchase'").select("user_id").distinct().count()
    )
    assert int(audit.loc["purchase_before_engagement"].n_applicable) == n_purchasers


def test_variant_and_json_string_paths_agree(spark, sf_dir):
    # the VARIANT extraction must reproduce the get_json_object twin's
    # numbers exactly (same rows, same k values, different decode path)
    variant = (
        CATALOG["events_props_variant"].spark_fn(spark, sf_dir).toPandas()
        .set_index("event_type")
    )
    import pyspark.sql.functions as F

    ev = table(spark, sf_dir, "events")
    legacy = (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .toPandas()
        .set_index("event_type")
    )
    for et in variant.index:
        assert variant.loc[et].sum_k == legacy.loc[et].sum_k
        assert variant.loc[et].n_events == legacy.loc[et].n


def test_time_to_convert_consistent_with_protocol_audit(spark, sf_dir):
    # signup-cohort totals must equal the audit's signup-applicable count,
    # and conversion latency stats come from a pandas re-derivation
    import pandas as pd
    import pytest as _pt

    ttc = CATALOG["events_time_to_convert"].spark_fn(spark, sf_dir).toPandas()
    audit = (
        CATALOG["events_state_machine_audit"].spark_fn(spark, sf_dir).toPandas()
        .set_index("rule")
    )
    assert ttc.n_signups.sum() == audit.loc["signup_not_first"].n_applicable
    ev = table(spark, sf_dir, "events").toPandas()
    s = ev[ev.event_type == "signup"].groupby("user_id").ts.min()
    p = ev[ev.event_type == "purchase"]
    rows = []
    for uid, s_ts in s.items():
        after = p[(p.user_id == uid) & (p.ts > s_ts)]
        if len(after):
            rows.append(
                {
                    "cohort": s_ts.strftime("%Y-%m"),
                    "tt": (after.ts.min() - s_ts).total_seconds() / 3600,
                }
            )
    ref = pd.DataFrame(rows)
    for row in ttc.itertuples():
        grp = ref[ref.cohort == row.cohort].tt if len(ref) else pd.Series(dtype=float)
        assert row.n_converted == len(grp)
        if len(grp):
            assert row.median_hours == _pt.approx(grp.quantile(0.5), abs=1e-3)
            assert row.p90_hours == _pt.approx(
                grp.quantile(0.9, interpolation="linear"), abs=1e-3
            )


def test_slo_burn_reconciles_with_raw_counts(spark, sf_dir):
    import pyspark.sql.functions as F

    got = CATALOG["events_slo_burn"].spark_fn(spark, sf_dir).toPandas()
    ev = table(spark, sf_dir, "events")
    assert got.n_events.sum() == ev.count()
    assert got.n_errors.sum() == ev.where("event_type = 'error'").count()
    # cumulative burn recomputes from the daily columns
    ce, cn = 0, 0
    for row in got.itertuples():
        ce += row.n_errors
        cn += row.n_events
        assert row.burn_ratio == round(ce / (0.01 * cn), 4)
        assert row.over_budget == (ce / (0.01 * cn) > 1.0)
