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


# ---------------------------------------------------------------------------
# docs_bm25_escalate: head-depth escalation until served or exhausted
# ---------------------------------------------------------------------------


def _mk_escalate_fixture(spark):
    """A crafted corpus with one query per escalation regime: qid 100 is
    served from the base page, qid 200's only co-occurrence hides at
    posting rank 12 (exhausts the base head, served at 2x), qid 500's at
    rank 40 (served mid-ladder at 64), qid 300's at rank 301 (exhausts
    EVERY capped tier, served by the full posting), and qid 400's terms
    never co-occur (emits nothing)."""
    rows = []
    # qid 100: a&b — doc 1 carries both at head-grade impact
    rows += [(1, "a", 9), (1, "b", 7), (100, "a", 5), (100, "b", 4)]
    # qid 200: c&d — 11 high-impact docs bury doc 2 to prank 12 in c
    rows += [(500 + i, "c", 100) for i in range(11)]
    rows += [(2, "c", 1), (2, "d", 5), (200, "c", 3), (200, "d", 2)]
    # qid 300: e&f — 300 high-impact docs bury doc 3 beyond the deepest
    # stored page (prank 301 > IDX_ESC_SCHEDULE[-1])
    rows += [(600 + i, "e", 100) for i in range(300)]
    rows += [(3, "e", 1), (3, "f", 6), (300, "e", 2), (300, "f", 1)]
    # qid 500: i&j — 39 high-impact docs bury doc 6 to prank 40 in i
    rows += [(1000 + i, "i", 100) for i in range(39)]
    rows += [(6, "i", 1), (6, "j", 4), (500, "i", 2), (500, "j", 1)]
    # qid 400: g&h — never co-occur outside the query doc
    rows += [(4, "g", 2), (5, "h", 2), (400, "g", 1), (400, "h", 1)]
    # the impl contract takes pre-scored postings; the fixture uses the
    # raw term frequency as score_q (BM25 is the graded entry's choice)
    tf = spark.createDataFrame(rows, "doc_id long, term string, cnt long")
    q = spark.createDataFrame(
        [
            (100, "a", 1), (100, "b", 2),
            (200, "c", 1), (200, "d", 2),
            (300, "e", 1), (300, "f", 2),
            (400, "g", 1), (400, "h", 2),
            (500, "i", 1), (500, "j", 2),
        ],
        "qid long, term string, qrn int",
    )
    from pyspark.sql import Window as W

    from currency_etl_spark.queries.llm_ops import IDX_ESC_SCHEDULE

    heads = tf.select(
        "doc_id",
        "term",
        F.col("cnt").alias("score_q"),
        F.row_number()
        .over(W.partitionBy("term").orderBy(F.desc("cnt"), "doc_id"))
        .alias("prank"),
    ).filter(F.col("prank") <= IDX_ESC_SCHEDULE[-1])
    return q, heads, tf.select("doc_id", "term", F.col("cnt").alias("score_q"))


def test_index_escalate_cap_exhaustion_tiers(spark):
    """The cap-exhaustion fixture: each tier of the (cap, 2xcap, full)
    ladder serves exactly the query built to exhaust the tiers before
    it, and a query with an empty true intersection emits nothing."""
    from currency_etl_spark.queries.llm_ops import (
        IDX_ESC_SCHEDULE,
        _index_escalate_impl,
    )

    q, heads, tf = _mk_escalate_fixture(spark)
    got = {r.qid: r for r in _index_escalate_impl(q, heads, tf).collect()}
    assert set(got) == {100, 200, 300, 500}
    assert got[100].eff_depth == IDX_ESC_SCHEDULE[0]
    assert got[100].nn_doc_id == 1 and got[100].score_q == 9 + 7
    assert got[200].eff_depth == IDX_ESC_SCHEDULE[1]
    assert got[200].nn_doc_id == 2 and got[200].score_q == 1 + 5
    assert got[500].eff_depth == 64  # mid-ladder
    assert got[500].nn_doc_id == 6 and got[500].score_q == 1 + 4
    assert got[300].eff_depth == 0  # beyond every stored page: full posting
    assert got[300].nn_doc_id == 3 and got[300].score_q == 1 + 6
    for r in got.values():
        assert r.n_candidates == 1


def test_index_escalate_graded_corpus_exercises_every_tier(spark, sf_dir):
    """On the graded corpus the ladder is non-degenerate: its first four
    rungs each serve at least one query, every emitted depth is a
    scheduled rung (or 0 = full), and the full tier is EMPTY — every
    query serves from a stored page, the rare-path-safety-net property
    the ladder was sized for (the ANN escalation's shape)."""
    from currency_etl_spark.queries.llm_ops import (
        IDX_ESC_SCHEDULE,
        docs_bm25_escalate,
    )

    depths = {
        r.eff_depth
        for r in docs_bm25_escalate(spark, sf_dir).select("eff_depth").collect()
    }
    assert set(IDX_ESC_SCHEDULE[:4]) <= depths
    assert depths <= set(IDX_ESC_SCHEDULE)
    assert 0 not in depths
