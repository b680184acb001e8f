"""streaming_text_oov invariants: the streaming text-drift monitor's
shared columns must be BIT-identical to text_index_staleness's (one
stored vocabulary, one OOV definition), its stream job must be
stateless (per-token stream-static membership join — no watermark, no
streaming aggregation), and a drifted fixture must surface OOV mass
through the stream exactly as the batch audit sees it."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_streaming_oov_matches_batch_audit(spark):
    """Cross-entry pin: every column the two entries share must agree —
    the stream only changes WHEN the membership checks happen, never
    their result."""
    from currency_etl_spark.queries.llm_ops import text_index_staleness
    from currency_etl_spark.streaming.jobs import streaming_text_oov

    s = streaming_text_oov(spark, SF).collect()[0]
    b = text_index_staleness(spark, SF).collect()[0]
    assert s["n_batch_docs"] == b["n_batch_docs"]
    assert s["batch_vocab"] == b["batch_vocab"]
    assert s["oov_terms"] == b["oov_terms"]
    assert s["oov_token_share"] == b["oov_token_share"]
    assert s["batch_tokens"] > 0


def test_streaming_oov_is_stateless(spark):
    """No state store: each arriving token maps to one (doc_id, term,
    oov) row via the stream-static vocabulary join; the audit rollup is
    post-processing over the sink."""
    from currency_etl_spark.streaming.jobs import STREAM_JOBS

    sdf = STREAM_JOBS["streaming_text_oov"].builder(spark, SF)
    assert sdf.isStreaming
    logical = sdf._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" not in logical
    assert "Aggregate" not in logical  # per-token row: no streaming agg


def test_streaming_oov_detects_drift(spark, tmp_path):
    """Drifted arrivals (vocabulary the stored index never saw) must
    read back through the STREAM with the exact OOV mass the batch
    audit computes — and both must agree with a hand count."""
    from currency_etl_spark.operators.ckpt import reset_memos
    from currency_etl_spark.streaming.jobs import (
        reset_stream_pool,
        streaming_text_oov,
    )
    from tests.fixtures import write_documents

    rows = []
    for d in range(30):
        if d % 10 == 7:  # 3 arriving docs: 2 OOV tokens of 3 each
            rows.append((d, "zork alpha blip", "en", "web"))
        else:
            rows.append((d, "alpha beta", "en", "web"))
    d = str(tmp_path)
    write_documents(d, rows)
    reset_memos()
    try:
        got = streaming_text_oov(spark, d).collect()[0]
        assert got["n_batch_docs"] == 3
        assert got["batch_vocab"] == 3  # zork, alpha, blip
        assert got["batch_tokens"] == 9
        assert got["oov_terms"] == 2  # zork, blip
        assert got["oov_tokens"] == 6
        assert got["oov_token_share"] == round(6 / 9, 6)
    finally:
        reset_memos()
        reset_stream_pool()
