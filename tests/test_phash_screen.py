"""streaming_phash_screen invariants.

The screen's claim: arriving assets are fingerprinted with the SAME
Arrow operator the stored index was built with (single definition —
operators.multimodal.perceptual_hash), screened via stateless
stream-static joins against the OLD slice only, and the triage verdict
is exactly what the batch family's gradient-hash chain derives. Pin a
full python re-derivation (hashlib md5 + the operator's own
_gradient_hash), the stored-index read (old-slice ids only, checkpoint
scan, exactly one Arrow pass in the stream plan — for the arriving
batch), and statelessness."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

COLS = ["doc_id", "exact_dup", "n_candidates", "verdict"]


def _np_screen(sf: str):
    """Re-derive the whole screen with pandas + the operator's own
    gradient hash (bit-exact integer construction)."""
    from currency_etl_spark.operators.multimodal import _gradient_hash

    docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text"]]
    ph = {
        int(r.doc_id): _gradient_hash(r.text.encode("utf-8"))
        for r in docs.itertuples()
    }
    ck = {
        int(r.doc_id): hashlib.md5(r.text.encode("utf-8")).hexdigest()
        for r in docs.itertuples()
    }
    new = sorted(d for d in ph if d % 10 == 7)
    old = sorted(d for d in ph if d % 10 != 7)
    old_cks = {ck[d] for d in old}
    # old hash -> doc ids (bucket index)
    buckets: dict = {}
    for d in old:
        buckets.setdefault(ph[d], set()).add(d)
    out = []
    for d in new:
        probes = {ph[d]} | {ph[d] ^ (1 << i) for i in range(16)}
        near = set().union(*(buckets.get(p, set()) for p in probes))
        exact = ck[d] in old_cks
        verdict = (
            "exact" if exact else ("near_candidate" if near else "unique")
        )
        out.append((d, exact, len(near), verdict))
    return out


def test_phash_screen_matches_python_rederivation(spark):
    from currency_etl_spark.streaming.jobs import streaming_phash_screen

    want = _np_screen(SF)
    got = [
        tuple(r[c] for c in COLS)
        for r in streaming_phash_screen(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0


def test_phash_screen_candidates_come_from_the_stored_index(spark):
    """Every near-dup candidate must be an OLD-slice asset read from the
    stored fingerprint index — new x new pairing is never allowed in an
    ingest screen (the batch will be indexed once admitted)."""
    from currency_etl_spark.streaming.jobs import streaming_phash_screen

    streaming_phash_screen(spark, SF).collect()  # ensure the pool ran
    sink = spark.table("streaming_phash_screen_out")
    rows = sink.select("doc_id", "dup_of").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["doc_id"] % 10 == 7  # only arriving assets screened
        if r["dup_of"] is not None:
            assert r["dup_of"] % 10 != 7  # candidates only from the index


def test_phash_screen_agrees_with_batch_family_base(spark):
    """Cross-entry consistency with the batch family: re-deriving the
    screen from the MEMOIZED phash_base relation (the exact rows the
    batch entries grade on) must reproduce the streamed verdicts —
    the stream twin and the batch family share one fingerprint truth."""
    from currency_etl_spark.queries.multimodal import _phash_base
    from currency_etl_spark.streaming.jobs import streaming_phash_screen

    base = {
        int(r["doc_id"]): (int(r["phash"]), r["checksum"])
        for r in _phash_base(spark, SF).collect()
    }
    old = {d: v for d, v in base.items() if d % 10 != 7}
    old_cks = {c for _, c in old.values()}
    buckets: dict = {}
    for d, (h, _) in old.items():
        buckets.setdefault(h, set()).add(d)
    want = []
    for d in sorted(x for x in base if x % 10 == 7):
        h, c = base[d]
        probes = {h} | {h ^ (1 << i) for i in range(16)}
        near = set().union(*(buckets.get(p, set()) for p in probes))
        exact = c in old_cks
        want.append(
            (d, exact, len(near), "exact" if exact else ("near_candidate" if near else "unique"))
        )
    got = [
        tuple(r[c] for c in COLS)
        for r in streaming_phash_screen(spark, SF).collect()
    ]
    assert got == want


def test_phash_screen_is_stateless_and_reads_the_index(spark):
    """The stream job needs no state store (no watermark, no streaming
    aggregation) and must READ the stored index: its plan holds exactly
    ONE Arrow fingerprint pass — the arriving batch's — with the corpus
    side entering from the memoized checkpoint, never a second
    perceptual_hash over the old slice."""
    from currency_etl_spark.queries.multimodal import _phash_base
    from currency_etl_spark.streaming.jobs import STREAM_JOBS

    _phash_base(spark, SF).collect()  # memo live, as in the pooled run
    sdf = STREAM_JOBS["streaming_phash_screen"].builder(spark, SF)
    assert sdf.isStreaming
    logical = sdf._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" not in logical
    assert "Aggregate" not in logical  # per-row screen: no streaming agg
    analyzed = sdf._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("MapInPandas") == 1, analyzed
    assert "LogicalRDD" in analyzed  # the stored index checkpoint
