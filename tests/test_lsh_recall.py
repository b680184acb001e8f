"""dedup_lsh_recall invariants: a pure-Python re-derivation of the whole
report — shingles, DF-caps, truth pairs, MinHash signatures, banded
candidates, integer-division binning — must match exactly (third engine
beside the DuckDB oracle), and the empirical per-decile recall must
behave like the LSH S-curve: near zero at the bottom bin, (near-)total
at the top bins.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd

from currency_etl_spark.queries.llm_ops import (
    DF_CAP,
    MINHASH_A,
    MINHASH_B,
    MINHASH_BANDS,
    MINHASH_P,
    dedup_lsh_recall,
)

SF = "/root/testdata/sf0.001"


def _python_recall():
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    sh = {}  # doc_id -> list of md5 hexes of distinct shingles
    for r in docs.itertuples():
        t = r.text.split(" ")
        grams = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)} if len(t) >= 3 else set()
        sh[r.doc_id] = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    nsh = {d: len(ms) for d, ms in sh.items()}

    # truth: pairs sharing >=1 sx (60-bit prefix), buckets over DF_CAP dropped
    sx_posting = defaultdict(list)
    for d, ms in sh.items():
        for m in ms:
            sx_posting[int(m[:15], 16)].append(d)
    common = Counter()
    for sx, ds in sx_posting.items():
        if 1 < len(ds) <= DF_CAP:
            ds = sorted(ds)
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    common[(ds[i], ds[j])] += 1

    # candidates: banded signatures, band buckets over DF_CAP dropped
    sig = {}
    for d, ms in sh.items():
        if not ms:
            continue
        xs = [int(m[:7], 16) for m in ms]
        sig[d] = tuple(min((a * x + b) % MINHASH_P for x in xs) for a, b in zip(MINHASH_A, MINHASH_B))
    buckets = defaultdict(list)
    for d, s in sig.items():
        for band in range(MINHASH_BANDS):
            key = "-".join(str(s[band * 4 + j]) for j in range(4))
            buckets[(band, key)].append(d)
    cand = set()
    for (_, _), ds in buckets.items():
        if 1 < len(ds) <= DF_CAP:
            ds = sorted(ds)
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    cand.add((ds[i], ds[j]))

    bins = defaultdict(lambda: [0, 0])  # j_bin -> [n_pairs, n_caught]
    for (a, b), nc in common.items():
        j_bin = (10 * nc) // (nsh[a] + nsh[b] - nc)
        bins[j_bin][0] += 1
        bins[j_bin][1] += (a, b) in cand
    return {
        k: (v[0], v[1], round(v[1] / v[0], 6)) for k, v in sorted(bins.items())
    }


def test_lsh_recall_matches_python(spark):
    got = {
        r["j_bin"]: (r["n_pairs"], r["n_caught"], r["recall"])
        for r in dedup_lsh_recall(spark, SF).collect()
    }
    want = _python_recall()
    assert got == want, {k: (got.get(k), want.get(k)) for k in set(got) | set(want)}


def test_lsh_recall_tracks_the_s_curve(spark):
    """P(caught | j) = 1-(1-j^4)^4 for 4 bands x 4 rows: the empirical
    decile recalls must sit on the right side of the curve's cliff —
    hub caps can only DROP candidates, so the top is 'near-total', not
    asserted exactly 1.0."""
    rows = {r["j_bin"]: r for r in dedup_lsh_recall(spark, SF).collect()}
    assert all(0 <= b <= 10 for b in rows)
    assert all(r["n_caught"] <= r["n_pairs"] for r in rows.values())
    assert 0 in rows and rows[0]["recall"] < 0.05  # the curve's floor
    high = [r for b, r in rows.items() if b >= 8]
    assert high, "no high-similarity pairs in the corpus?"
    caught = sum(r["n_caught"] for r in high)
    total = sum(r["n_pairs"] for r in high)
    assert caught / total > 0.9  # the curve's ceiling (0.972 at j=0.9)
