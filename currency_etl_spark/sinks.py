"""Sinks (SURVEY.md §2.2): the medallion layout replacing the reference's
dated-directory convention.

Reference: raw JSON dumped to `raw/<date>/response.json` (K1,
extract.py:20-28) and parquet to `processed/<date>/data.parquet` (K2,
transform.py:39-43); "latest" found by sorting directory names
(transform.py:12-15). Here both layers are Hive-partitioned by
`ingest_date`, so the glob-and-sort becomes Catalyst partition pruning:
`filter(ingest_date == max)` touches one directory's files no matter how
many days exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bronze(df: DataFrame, path: str, ingest_date: str) -> None:
    """Raw landing layer (K1): verbatim records, partitioned by ingest date.
    JSON at the reference's fidelity; at 100 TB this layer is parquet too,
    but bronze-as-received keeps replayability."""
    (
        df.withColumn("ingest_date", F.lit(ingest_date))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_date")
        .json(path)
    )


def write_silver(df: DataFrame, path: str, ingest_date: str) -> None:
    """Processed columnar layer (K2): parquet, partitioned by ingest date,
    dynamic overwrite so a re-run replaces only its own partition."""
    (
        df.withColumn("ingest_date", F.lit(ingest_date))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_date")
        .parquet(path)
    )


def read_latest_silver(spark: SparkSession, path: str) -> DataFrame:
    """Latest-partition scan (S3): max(ingest_date) then an equality filter
    that Catalyst turns into partition pruning — the planner reads one
    partition's files (see PartitionFilters in .explain), replacing the
    reference's lexicographic glob sort."""
    df = spark.read.parquet(path)
    latest = df.select(F.max("ingest_date").alias("m")).collect()[0]["m"]
    return df.filter(F.col("ingest_date") == F.lit(latest))
