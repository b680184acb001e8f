"""DDL (SURVEY.md §2.2 K4): the reference runs create_tables.sql through
SQLAlchemy (src/load.py:63-66); here the same tables exist as session-
catalog parquet tables via Spark SQL DDL — `spark.table("exchange_rates")`
then replaces every JDBC scan (S5)."""

from __future__ import annotations

from pyspark.sql import SparkSession

EXCHANGE_RATES_DDL = """
    CREATE TABLE IF NOT EXISTS {db}.exchange_rates (
        cc STRING NOT NULL,
        txt STRING,
        rate DOUBLE,
        rate_per_100 DOUBLE,
        exchangedate DATE NOT NULL,
        created_at TIMESTAMP
    ) USING parquet
    {location}
"""

TELEGRAM_USERS_DDL = """
    CREATE TABLE IF NOT EXISTS {db}.telegram_users (
        chat_id BIGINT NOT NULL,
        username STRING,
        first_name STRING,
        last_name STRING,
        joined_at TIMESTAMP
    ) USING parquet
    {location}
"""


def ensure_tables(spark: SparkSession, db: str = "currency", base_path: str | None = None) -> None:
    """Idempotent CREATE IF NOT EXISTS of the warehouse tables
    (sql/create_tables.sql:1-18 parity). `base_path` pins external table
    locations; omitted → managed tables under spark.sql.warehouse.dir."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for name, ddl in (("exchange_rates", EXCHANGE_RATES_DDL), ("telegram_users", TELEGRAM_USERS_DDL)):
        loc = f"LOCATION '{base_path}/{name}'" if base_path else ""
        spark.sql(ddl.format(db=db, location=loc))
