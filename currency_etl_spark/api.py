"""Public facade: the surface a user of the reference switches to.

    from currency_etl_spark.api import Engine

    eng = Engine(sf_dir="/root/testdata/sf0.01")      # or Engine(spark=my_spark, sf_dir=...)
    eng.sql("SELECT count(*) FROM lineitem").show()    # ad-hoc Spark SQL over the corpus
    eng.query("q1_pricing_summary").show()             # any named catalog query
    eng.list_queries()                                 # discovery

Ad-hoc SQL resolves against the corpus tables as temp views; named queries
come from the graded catalog (currency_etl_spark/catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.session import get_spark
from currency_etl_spark.sources import register_views


class Engine:
    def __init__(self, sf_dir: str, spark: SparkSession | None = None):
        self.spark = spark or get_spark("currency_etl_spark-api")
        self.sf_dir = sf_dir
        self._catalog = load_catalog()
        register_views(self.spark, sf_dir)

    def sql(self, query: str) -> DataFrame:
        """Ad-hoc Spark SQL over the registered corpus views."""
        return self.spark.sql(query)

    def query(self, name: str) -> DataFrame:
        """Run a named catalog query against this engine's sf_dir."""
        try:
            spec = self._catalog[name]
        except KeyError:
            raise KeyError(
                f"unknown query {name!r}; available: {', '.join(sorted(self._catalog))}"
            ) from None
        return spec.spark_fn(self.spark, self.sf_dir)

    def list_queries(self) -> list[str]:
        return sorted(self._catalog)

    def describe(self, name: str) -> str:
        return self._catalog[name].doc
