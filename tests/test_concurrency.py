"""Concurrent catalog execution on one shared SparkSession: queries must
not interfere through session state (the nanos-conf set, temp views,
streaming sinks). Spark schedules jobs from multiple threads FIFO-fair;
results must equal the serial runs."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from currency_etl_spark.catalog import load_catalog

NAMES = [
    "ref_avg_value",
    "ref_last_value",
    "events_hourly",
    "q1_pricing_summary",
    "top_customers",
    "dedup_exact",
    "knn_brute",
    "text_stats",
]


def test_concurrent_queries_match_serial(spark, sf_dir):
    catalog = load_catalog()

    def run(name):
        return name, catalog[name].spark_fn(spark, sf_dir).collect()

    serial = {name: rows for name, rows in map(run, NAMES)}
    with ThreadPoolExecutor(max_workers=8) as pool:
        concurrent = dict(pool.map(run, NAMES))

    for name in NAMES:
        assert sorted(map(tuple, concurrent[name])) == sorted(
            map(tuple, serial[name])
        ), f"{name}: concurrent result differs from serial"
