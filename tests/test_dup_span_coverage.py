"""docs_dup_span_coverage / docs_dup_span_removal invariants: an
independent pandas/hashlib re-derivation of the exact-substring pipeline
— rolling 60-bit gram hashes, global duplicate detection, interval-union
coverage, and the span-excision cut — must reproduce the Spark results
exactly (third engine beside the DuckDB oracle), the two entries must
agree with each other (removed_tokens == covered_tokens), and the
structural bounds must hold."""

from __future__ import annotations

import hashlib

import pandas as pd

from currency_etl_spark.queries.llm_ops import (
    DUP_RUN_L,
    docs_dup_span_coverage,
    docs_dup_span_removal,
)

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


def _pandas_removal():
    """Independent cut-step re-derivation: covered positions as an explicit
    per-token boolean (no interval algebra at all — the bluntest possible
    third opinion on the islands/lambda machinery)."""
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    grams: dict = {}
    per_doc: dict = {}
    for _, row in docs.iterrows():
        t = row.text.split(" ")
        pos_hashes = []
        for i in range(len(t) - DUP_RUN_L + 1):
            s = " ".join(t[i : i + DUP_RUN_L])
            h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            pos_hashes.append((i + 1, h))
            grams[h] = grams.get(h, 0) + 1
        per_doc[row.doc_id] = (pos_hashes, t, row.text)
    out = {}
    for doc_id, (pos_hashes, t, text) in per_doc.items():
        hits = sorted(p for p, h in pos_hashes if grams[h] > 1)
        covered = [False] * len(t)
        for p in hits:
            for j in range(p - 1, min(p - 1 + DUP_RUN_L, len(t))):
                covered[j] = True
        # maximal contiguous covered runs = the merged spans
        n_spans = sum(
            1 for j in range(len(t)) if covered[j] and (j == 0 or not covered[j - 1])
        )
        kept = [tok for tok, c in zip(t, covered) if not c]
        clean = text if not hits else " ".join(kept)
        out[doc_id] = (len(t), n_spans, sum(covered), len(kept), clean)
    return out


def test_dup_span_removal_matches_pandas(spark):
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_spans"],
            r["removed_tokens"],
            r["kept_tokens"],
            r["clean_text"],
        )
        for r in docs_dup_span_removal(spark, SF).collect()
    }
    want = _pandas_removal()
    assert set(got) == set(want)
    mism = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mism, dict(list(mism.items())[:3])
    # the cut fires on this corpus but doesn't erase it
    assert 0 < sum(1 for v in got.values() if v[1] > 0) < len(got)
    assert any(v[4] == "" for v in got.values())  # fully-excised docs exist


def test_dup_span_removal_agrees_with_coverage(spark):
    """The pair is self-consistent: the removal entry cuts EXACTLY the
    tokens the coverage entry counts (removed == covered, kept + removed
    == n_tokens), and untouched docs pass through verbatim."""
    cov = {r["doc_id"]: r for r in docs_dup_span_coverage(spark, SF).collect()}
    rem = {r["doc_id"]: r for r in docs_dup_span_removal(spark, SF).collect()}
    assert set(cov) == set(rem)
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    text = dict(zip(docs.doc_id, docs.text))
    for k, c in cov.items():
        r = rem[k]
        assert r["removed_tokens"] == c["covered_tokens"], k
        assert r["kept_tokens"] + r["removed_tokens"] == r["n_tokens"], k
        assert len(r["clean_text"].split(" ")) == (
            r["kept_tokens"] if r["kept_tokens"] else 1
        ) or r["clean_text"] == "", k
        if c["n_dup_grams"] == 0:
            assert r["n_spans"] == 0 and r["clean_text"] == text[k], k
