"""docs_dup_span_coverage invariants: an independent pandas/hashlib
re-derivation of the exact-substring coverage — rolling 60-bit gram
hashes, global duplicate detection, interval-union coverage — must
reproduce the Spark result exactly (third engine beside the DuckDB
oracle), and the structural bounds must hold."""

from __future__ import annotations

import hashlib

import pandas as pd

from currency_etl_spark.queries.llm_ops import DUP_RUN_L, docs_dup_span_coverage

SF = "/root/testdata/sf0.001"


def _pandas_coverage():
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    grams: dict = {}  # hash -> count
    per_doc: dict = {}  # doc_id -> (positions, n_tokens)
    for _, row in docs.iterrows():
        t = row.text.split(" ")
        pos_hashes = []
        for i in range(len(t) - DUP_RUN_L + 1):
            s = " ".join(t[i : i + DUP_RUN_L])
            h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            pos_hashes.append((i + 1, h))
            grams[h] = grams.get(h, 0) + 1
        per_doc[row.doc_id] = (pos_hashes, len(t))
    out = {}
    for doc_id, (pos_hashes, n_tokens) in per_doc.items():
        hits = sorted(p for p, h in pos_hashes if grams[h] > 1)
        covered = 0
        for k, p in enumerate(hits):
            nxt = hits[k + 1] if k + 1 < len(hits) else None
            covered += min(nxt - p, DUP_RUN_L) if nxt is not None else DUP_RUN_L
        out[doc_id] = (n_tokens, len(hits), covered, round(covered / n_tokens, 6))
    return out


def test_dup_span_coverage_matches_pandas(spark):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_grams"], r["covered_tokens"], r["dup_coverage"])
        for r in docs_dup_span_coverage(spark, SF).collect()
    }
    want = _pandas_coverage()
    assert set(got) == set(want)
    mism = {k: (got[k], want[k]) for k in want if got[k][:3] != want[k][:3]}
    assert not mism, dict(list(mism.items())[:5])
    for k in want:
        assert abs(got[k][3] - want[k][3]) < 1e-9, (k, got[k], want[k])
    # structural bounds: coverage never exceeds 1, covered tokens never
    # exceed the doc, and the signal actually fires on this corpus
    assert all(0 <= v[3] <= 1 for v in got.values())
    assert all(v[2] <= v[0] for v in got.values())
    assert 0 < sum(1 for v in got.values() if v[1] > 0) < len(got)
