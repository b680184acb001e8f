"""Notification sink + subscriber registry (SURVEY.md §2.2 K9, §2.10 T2).

Reference: a long-poll Telegram listener upserts chat_ids with
`ON CONFLICT DO NOTHING` (src/telegram_listener.py:17-52) and the DAG
POSTs the report/PNGs to every subscriber (dags/currency_etl.py:91-110).

Spark mapping:
  * the subscriber registry is a keyed table with insert-if-absent
    semantics — ParquetUpsertTable(mode="ignore");
  * delivery is I/O, not relational work: for the reference's scale the
    subscriber list collects to the driver; at scale `foreachPartition`
    fans the HTTP calls out to executors. Both paths take an injectable
    `send_fn` so tests (and air-gapped runs) record instead of POSTing.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from currency_etl_spark.warehouse import ParquetUpsertTable

TELEGRAM_USERS_SCHEMA = T.StructType(
    [
        T.StructField("chat_id", T.LongType(), False),
        T.StructField("username", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
    ]
)


def subscribers_table(spark: SparkSession, path: str) -> ParquetUpsertTable:
    return ParquetUpsertTable(spark, path, key_cols=["chat_id"])


def subscribe(table: ParquetUpsertTable, users: DataFrame) -> None:
    """/start — insert-if-absent: an existing chat_id keeps its original row
    (telegram_listener.py:27-31, ON CONFLICT DO NOTHING)."""
    table.merge_upsert(users, mode="ignore")


def unsubscribe(table: ParquetUpsertTable, chat_ids: list[int]) -> None:
    """/stop — delete by key (telegram_listener.py:44-48). Set-based
    anti-join rewrite, not a per-row DELETE."""
    current = table.read()
    remaining = current.filter(~current.chat_id.isin(chat_ids))
    table._atomic_overwrite(remaining)


def send_report(
    subscribers: DataFrame,
    message: str,
    send_fn: Callable[[int, str], None],
    distributed: bool = False,
) -> int:
    """Deliver `message` to every subscriber via `send_fn(chat_id, text)`.

    distributed=False collects the (tiny) subscriber list driver-side like
    the reference; distributed=True ships delivery to executors with
    foreachPartition — one connection per partition, the 100 TB fan-out
    shape. Returns the driver-known send count (driver mode only)."""
    if distributed:
        def deliver(rows):
            for r in rows:
                send_fn(r["chat_id"], message)

        subscribers.select("chat_id").foreachPartition(deliver)
        return -1
    chat_ids = [r["chat_id"] for r in subscribers.select("chat_id").collect()]
    for cid in chat_ids:
        send_fn(cid, message)
    return len(chat_ids)
