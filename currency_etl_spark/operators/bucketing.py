"""Bucketed tables: pre-shuffled storage for co-located joins
(SURVEY.md §4.4; guide 'Partitioning & shuffle').

Writing both fact tables bucketed by the join key means later joins read
matching buckets side by side — no Exchange at query time. At 100 TB this
converts the nightly orders⋈lineitem shuffle (the single biggest data
movement in the TPC-H-shaped workload) into a storage-time cost paid once
per write. Bucketed tables must live in the session catalog (bucket
metadata has nowhere to go on a bare path)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_within: bool = True,
) -> None:
    """Save as a catalog table bucketed (and optionally sorted) by the key.
    Sorting within buckets additionally lets sort-merge joins skip their
    sort phase."""
    spark = df.sparkSession
    # the default in-memory catalog forgets tables across sessions while
    # their managed locations persist — drop both before recreating
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(wh.removeprefix("file:"), table_name.lower())
    if loc and os.path.exists(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_within:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys — planned
    without a shuffle on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
