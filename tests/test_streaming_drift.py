"""streaming_drift_psi invariants: the streaming drift monitor must be
BIT-identical to embeddings_drift_psi (they share one DuckDB oracle and
the shared assign_cells/psi_report builders), and its stream job must be
stateless — per-row assignment against the broadcast static codebook,
no watermark, no streaming aggregation."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_streaming_drift_matches_batch_twin(spark):
    """Stream == batch bit-identically: same stored codebook, same rank-1
    election, same smoothing/quantization/bar — the stream only changes
    WHEN the assignment work happens, never its result."""
    from currency_etl_spark.queries.vectors import embeddings_drift_psi
    from currency_etl_spark.streaming.jobs import streaming_drift_psi

    cols = [
        "cell", "batch_cnt", "corpus_cnt", "batch_share",
        "corpus_share", "psi_term", "psi_total", "rebuild",
    ]
    batch = [
        tuple(r[c] for c in cols) for r in embeddings_drift_psi(spark, SF).collect()
    ]
    stream = [
        tuple(r[c] for c in cols) for r in streaming_drift_psi(spark, SF).collect()
    ]
    assert stream == batch
    assert len(stream) > 0


def test_streaming_drift_is_stateless(spark):
    """The monitor's stream job must need no state store: no watermark,
    no streaming aggregation — each arriving vector maps to one
    (vec_id, cid) row against the broadcast static codebook; the
    histogram and PSI are post-processing over the sink."""
    from currency_etl_spark.streaming.jobs import STREAM_JOBS

    sdf = STREAM_JOBS["streaming_drift_psi"].builder(spark, SF)
    assert sdf.isStreaming
    logical = sdf._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" not in logical
    assert "Aggregate" not in logical  # per-row assignment: no streaming agg


def test_streaming_drift_shares_one_oracle(spark):
    """The twins are graded against ONE oracle string — drift between
    the two graded definitions is structurally impossible."""
    from currency_etl_spark.catalog import load_catalog

    cat = load_catalog()
    assert (
        cat["streaming_drift_psi"].oracle is cat["embeddings_drift_psi"].oracle
    )
