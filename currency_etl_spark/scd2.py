"""SCD2 history table on plain parquet: MERGE-with-history emulation.

The reference's warehouse overwrites on conflict (load.py:38-41) — current
state only, history lost. An SCD2 table keeps every version: each key's
row carries (valid_from, valid_to, is_current); applying a change closes
the open row and opens a new one. With a real table format this is
`MERGE WHEN MATCHED UPDATE SET valid_to=... WHEN NOT MATCHED INSERT`; on
bare parquet (no Delta jars in this image) it's the anti-join + union +
window emulation the Spark guide describes — one shuffle on the key.

Semantics per `apply_changes(updates, ts)`:
  * new key                → insert open row [ts, ∞)
  * changed tracked value  → close old row at ts, insert open row [ts, ∞)
  * unchanged tracked value → no-op (no version churn)
Rows never mutate in place — history is append-only, so `as_of(t)` time
travel is a filter: valid_from <= t < valid_to.

Scale notes: the rewrite unions current ∪ changes and deduplicates by
(key, valid_from) — with a partitioned layout only partitions holding
affected keys rewrite (same pruning as ParquetUpsertTable). `is_current`
as a partition column keeps the hot "latest" scan small at 100 TB.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_spark.warehouse import ParquetUpsertTable

OPEN_END = "9999-12-31 00:00:00"


class Scd2Table:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        tracked_cols: list[str],
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.tracked_cols = list(tracked_cols)
        self._store = ParquetUpsertTable(spark, path, key_cols)  # reuse atomic writes

    def exists(self) -> bool:
        return self._store.exists()

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def current(self) -> DataFrame:
        return self.read().filter(F.col("is_current"))

    def as_of(self, ts: str | _dt.datetime) -> DataFrame:
        """Time travel: the version of every key live at `ts`."""
        t = F.lit(ts).cast("timestamp")
        return self.read().filter((F.col("valid_from") <= t) & (t < F.col("valid_to")))

    def apply_changes(self, updates: DataFrame, ts: str | _dt.datetime) -> None:
        """Apply a batch of key→tracked-values changes effective at `ts`."""
        t = F.lit(ts).cast("timestamp")
        fresh = updates.select(*self.key_cols, *self.tracked_cols).dropDuplicates(self.key_cols)
        stamped = fresh.select(
            *self.key_cols,
            *self.tracked_cols,
            t.alias("valid_from"),
            F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        if not self.exists():
            self._store._atomic_overwrite(stamped)
            return

        cur = self.read()
        open_rows = cur.filter(F.col("is_current"))
        closed_rows = cur.filter(~F.col("is_current"))

        # which open rows actually change? (null-safe compare on tracked cols)
        marked = fresh.withColumn("__has_upd", F.lit(True))
        cmp = open_rows.alias("o").join(marked.alias("u"), self.key_cols, "left")
        diff = F.lit(False)
        for c in self.tracked_cols:
            diff = diff | ~F.col(f"o.{c}").eqNullSafe(F.col(f"u.{c}"))
        changed_keys = (
            cmp.filter(F.col("__has_upd").isNotNull() & diff)
            .select(*[F.col(f"o.{c}") for c in self.key_cols])
        )

        # close changed rows at ts
        closing = (
            open_rows.join(changed_keys, self.key_cols, "left_semi")
            .withColumn("valid_to", t)
            .withColumn("is_current", F.lit(False))
        )
        untouched_open = open_rows.join(changed_keys, self.key_cols, "left_anti")

        # insert new versions: changed keys + brand-new keys
        new_keys = fresh.join(open_rows, self.key_cols, "left_anti").select(*self.key_cols)
        to_insert_keys = changed_keys.unionByName(new_keys).distinct()
        inserting = stamped.join(to_insert_keys, self.key_cols, "left_semi")

        merged = closed_rows.unionByName(closing).unionByName(untouched_open).unionByName(inserting)
        self._store._atomic_overwrite(merged)
