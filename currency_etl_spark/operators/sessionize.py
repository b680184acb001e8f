"""Gap-based sessionization — the library operator behind the graded
`events_sessionize` / `events_session_stats` entries and the batch oracle
of `streaming_sessions`.

A session groups consecutive same-entity events whose gaps are strictly
under `gap_s`; a gap >= gap_s opens a new session. The `>=` convention
matches Structured Streaming's `session_window` half-open [ts, ts + gap)
windows exactly, so the batch operator and the streaming one agree
row-for-row (graded against each other in the catalog).

Cost: ONE hash shuffle on the entity key feeding a lag + running-sum
window — the canonical 100 TB shape (no self-join, no per-group Python).
`seq` closes the total order so same-instant events sessionize
deterministically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(
    df: DataFrame,
    ts: str = "ts",
    by: Sequence[str] = ("user_id",),
    gap_s: int = 1800,
    seq: str = "event_id",
    out_col: str = "session_id",
) -> DataFrame:
    """Append `out_col`: a per-`by`-group session ordinal (1-based long).

    Events are ordered by (`ts`, `seq`) within each group; an event whose
    gap from its predecessor is >= `gap_s` seconds starts a new session.
    """
    gap_us = int(gap_s) * 1_000_000
    w = Window.partitionBy(*by).orderBy(ts, seq)
    us = F.unix_micros(F.col(ts))
    prev_us = F.lag(us).over(w)
    is_new = F.when(prev_us.isNull() | (us - prev_us >= gap_us), 1).otherwise(0)
    return df.withColumn(
        out_col,
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
