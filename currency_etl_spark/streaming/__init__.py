"""Structured Streaming surface. Importing registers streaming catalog entries."""

from currency_etl_spark.streaming import jobs  # noqa: F401
