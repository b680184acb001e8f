"""The reference's 11 analytics queries as Spark SQL (SURVEY.md §2.5–§2.8).

Source semantics: src/analyze.py:20-109 — Postgres SQL executed by PG. The
queries port nearly verbatim; the dialect shim is exactly the deltas listed
in SURVEY §3.2:
    NOW()                      → a pinned `today` date parameter (graded
                                 queries must not read the wall clock)
    INTERVAL '365 days'        → INTERVAL 365 DAYS
Everything else (CTEs, ROW_NUMBER() OVER, LEAST, comma joins) is valid
Spark SQL as-is. Catalyst plans the 1-row CTE cross joins as broadcast
nested-loop joins and `ORDER BY ... LIMIT 1` as TakeOrderedAndProject.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession

VIEW = "exchange_rates"


def query_catalog(today: str) -> dict[str, str]:
    """The 11 queries keyed like analyze.py:20-109, parameterized on `today`.

    `today` replaces NOW() so results are deterministic and testable against
    a frozen warehouse (SURVEY §7.3 'no current_timestamp in graded queries').
    """
    q: dict[str, str] = {}
    for cur in ("usd", "eur"):
        cc = cur.upper()
        q[f"avg_{cur}_rate"] = (
            f"SELECT AVG(rate) AS avg_{cur} FROM {VIEW} WHERE cc='{cc}'"
        )
        q[f"last_{cur}_rate"] = f"""
            SELECT rate AS last_{cur}, exchangedate
            FROM {VIEW}
            WHERE cc='{cc}'
            ORDER BY exchangedate DESC
            LIMIT 1
        """
        q[f"{cur}_range_year"] = f"""
            SELECT MIN(rate) AS min_{cur}, MAX(rate) AS max_{cur}
            FROM {VIEW}
            WHERE cc='{cc}' AND exchangedate >= DATE'{today}' - INTERVAL 365 DAYS
        """
        q[f"{cur}_days"] = f"""
            SELECT COUNT(*) AS days_{cur},
                   MIN(exchangedate) AS first_{cur}_date,
                   MAX(exchangedate) AS last_{cur}_date
            FROM {VIEW} WHERE cc='{cc}'
        """
        # ROW_NUMBER + LEAST(cnt, 31) clamp: with <31 days of history,
        # "a month ago" degrades to the oldest available row (analyze.py:77-81).
        q[f"{cur}_change_month"] = f"""
            WITH days_info AS (
                SELECT COUNT(*) AS cnt FROM {VIEW} WHERE cc='{cc}'
            ),
            ordered AS (
                SELECT rate,
                       ROW_NUMBER() OVER (ORDER BY exchangedate DESC) AS rn
                FROM {VIEW}
                WHERE cc='{cc}'
            ),
            last AS (SELECT rate FROM ordered WHERE rn = 1),
            ago AS (
                SELECT o.rate
                FROM ordered o, days_info d
                WHERE o.rn = LEAST(d.cnt, 31)
            )
            SELECT last.rate - ago.rate AS diff_{cur}
            FROM last, ago
        """
    q["unique_currencies"] = f"SELECT COUNT(DISTINCT cc) AS num_currencies FROM {VIEW}"
    return q


def run_queries(
    spark: SparkSession,
    rates: DataFrame,
    today: str | _dt.date | None = None,
) -> dict[str, list[dict[str, Any]]]:
    """Execute all 11 queries against `rates`, returning
    {query_name: [row_dict, ...]} like analyze.py:123-133's fetch loop."""
    if today is None:
        today = _dt.date.today()
    rates.createOrReplaceTempView(VIEW)
    out: dict[str, list[dict[str, Any]]] = {}
    for name, sql in query_catalog(str(today)).items():
        out[name] = [row.asDict() for row in spark.sql(sql).collect()]
    return out
