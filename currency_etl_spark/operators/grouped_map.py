"""Grouped-map Pandas UDF (applyInPandas) — the last member of the Pandas
UDF family (alongside mapInPandas in operators/multimodal.py and
applyInPandasWithState in streaming/ingest.py).

Demonstration operator: per-group z-score normalization. NOTE the built-in
window form (`zscore_builtin`) is the production path — whole-stage
codegen, no Arrow transfer; the applyInPandas twin exists to document the
API and to regression-test that the slow path agrees exactly. Use
applyInPandas only when the per-group logic genuinely needs pandas
(sklearn fit per group, pd.merge_asof, etc.)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

ZSCORE_SCHEMA = "event_id long, event_type string, value double, zscore double"


def zscore_builtin(events: DataFrame) -> DataFrame:
    """Per-type z-score via window aggregates — one shuffle, codegen'd."""
    w = W.partitionBy("event_type")
    mean = F.avg("value").over(w)
    # population std, matching pandas std(ddof=0)
    std = F.sqrt(F.avg(F.col("value") * F.col("value")).over(w) - mean * mean)
    return events.select(
        "event_id",
        "event_type",
        "value",
        ((F.col("value") - mean) / std).alias("zscore"),
    )


def zscore_grouped_map(events: DataFrame) -> DataFrame:
    """Same semantics through applyInPandas: each group arrives as one
    pandas DataFrame on an executor."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=0)
        out = pdf[["event_id", "event_type", "value"]].copy()
        out["zscore"] = (pdf["value"] - mean) / std
        return out

    return events.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        norm, schema=ZSCORE_SCHEMA
    )
