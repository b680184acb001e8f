"""currency_etl_spark — a PySpark-native analytics engine.

A from-scratch Spark implementation of the query and data-processing
capabilities of the reference ETL pipeline (DmytroBabarytskyi/Currency-ETL,
surveyed in SURVEY.md), generalized to a full analytic operator surface
(joins / aggregations / windows / set ops), plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing).

Design principles (SURVEY.md §7.0):
  * Everything is DataFrame / Spark SQL — Catalyst supplies predicate
    pushdown, column pruning, partition pruning, broadcast joins, AQE.
  * Zero row-at-a-time Python UDFs in hot paths; Pandas UDFs only where
    built-ins cannot express the semantics.
  * Designed for a multi-executor cluster at 100 TB (partitioning, shuffle
    minimization, broadcast of dims); tested on local[N].
"""

__version__ = "0.1.0"
