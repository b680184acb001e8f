"""text_index_merge invariants: the merge path (stored checkpoint ∪
batch checkpoint) must equal the from-scratch rebuild — a pure-pandas
rebuild re-derivation matches bit-for-bit, the delta pages agree with
docs_inverted_index's pages on shared terms, the 'new' class fires on a
drifted fixture, and the final plan reads only checkpoints."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from currency_etl_spark.queries.llm_ops import POSTING_HEAD_K, text_index_merge

SF = "/root/testdata/sf0.001"


def _py_merge(sf: str) -> list[tuple]:
    """From-scratch rebuild, restricted to batch-touched terms — exactly
    what the entry's merge path must reproduce."""
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    postings: dict = {}
    tfs: Counter = Counter()
    stored_terms, touched = set(), set()
    for r in docs.itertuples():
        c = Counter(r.text.split(" "))
        is_batch = r.doc_id % 10 == 7
        for term, n in c.items():
            postings.setdefault(term, []).append(r.doc_id)
            tfs[term] += n
            (touched if is_batch else stored_terms).add(term)
    out = []
    for term in sorted(touched):
        ids = sorted(postings[term])
        out.append(
            (
                term,
                "grown" if term in stored_terms else "new",
                len(ids),
                tfs[term],
                ",".join(str(i) for i in ids[:POSTING_HEAD_K]),
            )
        )
    return out


def test_merge_equals_rebuild_pandas(spark):
    rows = [tuple(r) for r in text_index_merge(spark, SF).collect()]
    assert rows == _py_merge(SF)
    assert rows, "graded corpus batch touches terms"


def test_merge_pages_agree_with_inverted_index(spark):
    """Cross-entry pin: for terms in BOTH outputs, the delta page the
    merge emits is identical to the page the full index build emits —
    one page convention across build and maintenance."""
    from currency_etl_spark.queries.llm_ops import docs_inverted_index

    merge = {r["term"]: r for r in text_index_merge(spark, SF).collect()}
    full = {r["term"]: r for r in docs_inverted_index(spark, SF).collect()}
    shared = set(merge) & set(full)
    assert shared, "top-20 index terms overlap the batch vocabulary"
    for t in shared:
        assert (merge[t]["df"], merge[t]["tf"], merge[t]["posting_head"]) == (
            full[t]["df"],
            full[t]["tf"],
            full[t]["posting_head"],
        )


def test_merge_new_terms_and_head_interleave(spark, tmp_path):
    """A drifted batch introduces a brand-new term ('new' class, posting
    head holds only batch docs) and appends to an existing term whose
    merged head must interleave stored and batch doc_ids in ascending
    order — the page is re-sorted, not appended-to."""
    from currency_etl_spark.operators.ckpt import reset_memos
    from tests.fixtures import write_documents

    rows = []
    for d in range(30):
        if d % 10 == 7:
            rows.append((d, "zork alpha", "en", "web"))
        else:
            rows.append((d, "alpha beta", "en", "web"))
    d = str(tmp_path)
    write_documents(d, rows)
    reset_memos()
    try:
        got = {r["term"]: r for r in text_index_merge(spark, d).collect()}
        assert [tuple(r) for r in sorted(got.values(), key=lambda r: r["term"])] == [
            tuple(x) for x in _py_merge(d)
        ]
        assert got["zork"]["term_class"] == "new"
        assert got["zork"]["posting_head"] == "7,17,27"
        assert got["alpha"]["term_class"] == "grown"
        # ascending interleave of stored (0,1,2,...) and batch (7,17,27)
        assert got["alpha"]["posting_head"] == "0,1,2,3,4,5,6,7"
        assert got["alpha"]["df"] == 30
        assert "beta" not in got  # untouched terms emit no delta page
    finally:
        reset_memos()


def test_merge_reads_only_checkpoints(spark):
    """Plan pin: both inputs are stored artifacts — the stored side
    reads the text_tf memo, the batch side reads the shared
    _text_batch_tf checkpoint; zero parquet scans in the final plan, no
    cartesian product, no Python UDF."""
    text_index_merge(spark, SF).collect()  # memos live; re-plan
    df = text_index_merge(spark, SF)
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Scan ExistingRDD" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0, plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# text_index_compact: the DELETE verb (compaction == rebuild-from-survivors)
# ---------------------------------------------------------------------------


def _py_compact(sf: str) -> list[tuple]:
    """From-scratch rebuild over the survivors, restricted to the
    deleted docs' vocabulary — what subtracting from the stored
    artifact must reproduce."""
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    removed: Counter = Counter()
    live_post: dict = {}
    live_tf: Counter = Counter()
    for r in docs.itertuples():
        c = Counter(r.text.split(" "))
        if r.doc_id % 10 == 3:
            for term in c:
                removed[term] += 1
        else:
            for term, n in c.items():
                live_post.setdefault(term, []).append(r.doc_id)
                live_tf[term] += n
    out = []
    for term in sorted(removed):
        ids = sorted(live_post.get(term, []))
        out.append(
            (
                term,
                removed[term],
                len(ids),
                live_tf.get(term, 0),
                ",".join(str(i) for i in ids[:POSTING_HEAD_K]),
                len(ids) == 0,
            )
        )
    return out


def test_compact_equals_rebuild_pandas(spark):
    from currency_etl_spark.queries.llm_ops import text_index_compact

    rows = [tuple(r) for r in text_index_compact(spark, SF).collect()]
    assert rows == _py_compact(SF)
    assert rows, "deleted slice touches terms on the graded corpus"


def test_compact_vocab_loss_and_head_excision(spark, tmp_path):
    """A term living ONLY in deleted docs must emit a vocab_lost row
    with zeroed page (not silently vanish), and a surviving term's
    compacted head must excise exactly the deleted doc_ids."""
    from currency_etl_spark.operators.ckpt import reset_memos
    from currency_etl_spark.queries.llm_ops import text_index_compact
    from tests.fixtures import write_documents

    rows = []
    for d in range(30):
        if d % 10 == 3:  # deleted docs: exclusive term + a shared one
            rows.append((d, "zork alpha", "en", "web"))
        else:
            rows.append((d, "alpha beta", "en", "web"))
    d = str(tmp_path)
    write_documents(d, rows)
    reset_memos()
    try:
        got = {r["term"]: r for r in text_index_compact(spark, d).collect()}
        assert [tuple(r) for r in sorted(got.values(), key=lambda r: r["term"])] == [
            tuple(x) for x in _py_compact(d)
        ]
        assert got["zork"]["vocab_lost"] is True
        assert got["zork"]["df"] == 0 and got["zork"]["posting_head"] == ""
        assert got["zork"]["df_removed"] == 3
        assert got["alpha"]["vocab_lost"] is False
        # head excises 3,13,23: survivors 0,1,2,4,5,6,7,8 lead
        assert got["alpha"]["posting_head"] == "0,1,2,4,5,6,7,8"
        assert got["alpha"]["df"] == 27 and got["alpha"]["df_removed"] == 3
        assert "beta" not in got  # untouched terms emit no page rewrite
    finally:
        reset_memos()


def test_compact_reads_only_the_stored_checkpoint(spark):
    """Plan pin: compaction SUBTRACTS from the stored artifact — the
    final plan reads the text_tf checkpoint only (zero parquet scans,
    no corpus re-tokenization), no cartesian product, no Python UDF."""
    from currency_etl_spark.queries.llm_ops import text_index_compact

    text_index_compact(spark, SF).collect()  # memo live; re-plan
    df = text_index_compact(spark, SF)
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Scan ExistingRDD" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0, plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
