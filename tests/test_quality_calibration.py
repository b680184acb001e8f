"""docs_quality_calibration invariants: a pure-pandas re-derivation of
the reliability table must match exactly; the bins must partition the
training pool; and the table must actually carry calibration signal on
this corpus (the rates it reports are non-degenerate)."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from currency_etl_spark.queries.curation import (
    DECON_FLAG_THRESHOLD,
    EVAL_MOD,
    QF_MAX_AVG_LEN,
    QF_MAX_TOKENS,
    QF_MAX_TOP_SHARE,
    QF_MIN_AVG_LEN,
    QF_MIN_STOP_HITS,
    QF_MIN_TOKENS,
    QF_MIN_TTR,
    docs_quality_calibration,
)
from currency_etl_spark.queries.llm_ops import STOPWORDS

SF = "/root/testdata/sf0.001"


def _shingles(t):
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


def _dup_labels(sf: str) -> dict:
    """Near-dup labels from the docs_dedup_survivors DuckDB oracle — an
    independent engine; the election itself has its own invariant tests
    (test_dedup_saturated / test_curation_graph)."""
    import duckdb

    from currency_etl_spark.catalog import load_catalog

    sql = load_catalog()["docs_dedup_survivors"].oracle
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    return {
        int(r.doc_id): int(not r.kept) for r in con.sql(sql).df().itertuples()
    }


def _pd_table(sf: str):
    docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text"]]
    stop = set(STOPWORDS["en"])
    dup_label = _dup_labels(sf)
    eval_grams: set = set()
    for r in docs.itertuples():
        if r.doc_id % EVAL_MOD == 0:
            eval_grams |= _shingles(r.text.split(" "))
    rows = []
    for r in docs.itertuples():
        if r.doc_id % EVAL_MOD == 0:
            continue  # eval split carries no labels to calibrate on
        t = r.text.split(" ")
        n = len(t)
        counts = Counter(t)
        ok = [
            QF_MIN_TOKENS <= n <= QF_MAX_TOKENS,
            QF_MIN_AVG_LEN <= sum(map(len, t)) / n <= QF_MAX_AVG_LEN,
            len(set(t)) / n >= QF_MIN_TTR,
            max(counts.values()) / n <= QF_MAX_TOP_SHARE,
            sum(v for k, v in counts.items() if k in stop) >= QF_MIN_STOP_HITS,
        ]
        gs = [" ".join(t[i : i + 3]) for i in range(n - 2)]
        hits = sum(1 for g in gs if g in eval_grams)
        contamination = round(hits / len(gs), 6) if gs else 0.0
        flagged = bool(gs) and hits / len(gs) > DECON_FLAG_THRESHOLD
        rows.append(
            (sum(ok), dup_label[r.doc_id], int(flagged), round(contamination * 1e6))
        )
    out = {}
    for b in sorted({r[0] for r in rows}):
        sub = [r for r in rows if r[0] == b]
        nd = len(sub)
        out[b] = (
            nd,
            sum(r[1] for r in sub),
            round(sum(r[1] for r in sub) / nd, 6),
            sum(r[2] for r in sub),
            round(sum(r[2] for r in sub) / nd, 6),
            round(sum(r[3] for r in sub) / nd / 1e6, 6),
        )
    return out, len(rows)


def test_quality_calibration_matches_pandas(spark):
    want, n_train = _pd_table(SF)
    got = {
        r["rules_passed"]: (
            r["n_docs"],
            r["n_dups"],
            r["dup_rate"],
            r["n_contaminated"],
            r["contam_rate"],
            r["mean_contamination"],
        )
        for r in docs_quality_calibration(spark, SF).collect()
    }
    assert got == want
    # the bins partition the training pool exactly
    assert sum(v[0] for v in got.values()) == n_train


def test_quality_calibration_is_nondegenerate(spark):
    """The loop only evaluates anything if the table has signal: several
    score bins exist, some bin observes duplicates, and some bin observes
    contamination — otherwise the corpus can't exercise the entry."""
    rows = docs_quality_calibration(spark, SF).collect()
    assert len(rows) >= 3
    assert all(0 <= r["rules_passed"] <= 5 for r in rows)
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0 and 0.0 <= r["contam_rate"] <= 1.0
        assert r["n_dups"] <= r["n_docs"] and r["n_contaminated"] <= r["n_docs"]
        assert r["mean_contamination"] >= 0.0
    assert any(r["n_dups"] > 0 for r in rows)
    assert any(r["n_contaminated"] > 0 for r in rows)
