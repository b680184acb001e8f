"""Invariants for the inverted-index pair beyond the oracle equality:
the posting head really is the K smallest doc ids of the full posting,
and lookup hits really contain both query terms in the raw text."""

from __future__ import annotations

from pyspark.sql import functions as F

from currency_etl_spark.queries.llm_ops import (
    POSTING_HEAD_K,
    docs_index_lookup,
    docs_inverted_index,
)
from currency_etl_spark.sources import table


def test_posting_head_is_sorted_prefix_of_full_posting(spark, sf_dir):
    idx = docs_inverted_index(spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    postings: dict[str, list[int]] = {}
    for row in docs.itertuples():
        for term in set(row.text.split(" ")):
            postings.setdefault(term, []).append(row.doc_id)
    for row in idx.itertuples():
        full = sorted(postings[row.term])
        assert row.df == len(full)
        head = [int(x) for x in row.posting_head.split(",")]
        assert head == full[:POSTING_HEAD_K]
        assert head == sorted(head)


def test_index_lookup_hits_contain_both_terms(spark, sf_dir):
    hits = docs_index_lookup(spark, sf_dir).toPandas()
    assert len(hits) > 0
    term1, term2 = hits["term1"].iloc[0], hits["term2"].iloc[0]
    assert (hits["term1"] == term1).all() and (hits["term2"] == term2).all()
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id").isin([int(x) for x in hits["doc_id"]]))
        .toPandas()
        .set_index("doc_id")
    )
    for row in hits.itertuples():
        toks = docs.loc[row.doc_id, "text"].split(" ")
        assert toks.count(term1) == row.tf1
        assert toks.count(term2) == row.tf2
        assert row.score == row.tf1 + row.tf2


def test_index_lookup_misses_docs_with_one_term_only(spark, sf_dir):
    """Documents holding exactly one of the two query terms must NOT hit."""
    hits = docs_index_lookup(spark, sf_dir).toPandas()
    term1, term2 = hits["term1"].iloc[0], hits["term2"].iloc[0]
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    expected = {
        row.doc_id
        for row in docs.itertuples()
        if term1 in row.text.split(" ") and term2 in row.text.split(" ")
    }
    assert set(hits["doc_id"]) == expected
