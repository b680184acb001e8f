"""embeddings_drift_psi invariants: a pure-python/numpy re-derivation of
the whole audit (quantize -> stored codebook -> rank-1 assignments ->
per-cell histograms -> smoothed exact-int PSI) must match bit-for-bit;
psi_bar must be a real parameter (the flag moves, the histograms never
do); the PSI identity must hold (zero iff the smoothed distributions
coincide, always non-negative); and the plan must READ the stored index
(memo checkpoints) with the embeddings parquet consumed exactly once —
inside the batch histogram's checkpoint build — so the final plan holds
zero parquet scans."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from currency_etl_spark.queries.vectors import (
    KNN_BATCH_MOD,
    KNN_BATCH_REM,
    N_CENTROIDS,
    PSI_REBUILD_BAR,
    embeddings_drift_psi,
)

SF = "/root/testdata/sf0.001"


def _np_psi(sf: str, bar: float = PSI_REBUILD_BAR) -> pd.DataFrame:
    emb = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    qv = {
        r.vec_id: np.round(np.asarray(r.embedding, dtype=np.float64) * 1e6).astype(
            np.int64
        )
        for r in emb.itertuples()
    }
    is_batch = lambda v: v % KNN_BATCH_MOD == KNN_BATCH_REM  # noqa: E731
    corpus = sorted(v for v in qv if not is_batch(v))
    batch = sorted(v for v in qv if is_batch(v))
    cents = corpus[:N_CENTROIDS]

    def d2(a, b):
        d = qv[a] - qv[b]
        return int((d * d).sum())

    assign = lambda v: min(cents, key=lambda c: (d2(v, c), c))  # noqa: E731
    b_cnt = {c: 0 for c in cents}
    c_cnt = {c: 0 for c in cents}
    for v in corpus:
        c_cnt[assign(v)] += 1
    for v in batch:
        b_cnt[assign(v)] += 1
    bt, ct = len(batch), len(corpus)
    bt_sm, ct_sm = bt + N_CENTROIDS, ct + N_CENTROIDS

    term_q = {}
    for c in cents:
        b_sm, c_sm = b_cnt[c] + 1, c_cnt[c] + 1
        diff = (b_sm * ct_sm - c_sm * bt_sm) / (bt_sm * ct_sm)
        term = diff * math.log((b_sm * ct_sm) / (c_sm * bt_sm))
        # half-away-from-zero like Spark/DuckDB round(); terms are >= 0
        term_q[c] = int(math.floor(term * 1e6 + 0.5))
    psi_q = sum(term_q.values())
    rows = [
        {
            "cell": c,
            "batch_cnt": b_cnt[c],
            "corpus_cnt": c_cnt[c],
            "batch_share": round(b_cnt[c] / max(bt, 1), 6),
            "corpus_share": round(c_cnt[c] / max(ct, 1), 6),
            "psi_term": term_q[c] / 1e6,
            "psi_total": psi_q / 1e6,
            "rebuild": int(psi_q >= int(round(bar * 1e6))),
        }
        for c in sorted(cents)
    ]
    return pd.DataFrame(rows)


def _rows(df) -> list[tuple]:
    return [tuple(r) for r in df.collect()]


def test_drift_matches_numpy(spark):
    want = _np_psi(SF)
    got = embeddings_drift_psi(spark, SF).toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False, check_exact=True
    )


def test_drift_psi_identity(spark):
    """PSI is a sum of (p-q)*ln(p/q) terms — each non-negative, zero only
    when the smoothed shares coincide; the histograms partition batch and
    corpus exactly."""
    out = embeddings_drift_psi(spark, SF).toPandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    n_batch = int((emb.vec_id % KNN_BATCH_MOD == KNN_BATCH_REM).sum())
    assert int(out.batch_cnt.sum()) == n_batch
    assert int(out.corpus_cnt.sum()) == len(emb) - n_batch
    assert (out.psi_term >= 0).all()
    assert abs(out.psi_total.iloc[0] - round(out.psi_term.sum(), 6)) < 1e-9
    bt, ct = out.batch_cnt.sum(), out.corpus_cnt.sum()
    for r in out.itertuples():
        p = (r.batch_cnt + 1) / (bt + N_CENTROIDS)
        q = (r.corpus_cnt + 1) / (ct + N_CENTROIDS)
        if r.psi_term == 0:
            assert abs(p - q) * abs(math.log(p / q)) < 5e-7
        else:
            assert p != q


def test_drift_psi_bar_is_a_real_parameter(spark):
    """The rebuild flag moves with psi_bar; nothing else does. psi_bar=0
    always fires (PSI >= 0); an absurd bar never does."""
    base = embeddings_drift_psi(spark, SF).toPandas()
    fire = embeddings_drift_psi(spark, SF, psi_bar=0.0).toPandas()
    never = embeddings_drift_psi(spark, SF, psi_bar=10**9).toPandas()
    for other in (fire, never):
        pd.testing.assert_frame_equal(
            base.drop(columns=["rebuild"]),
            other.drop(columns=["rebuild"]),
            check_dtype=False,
            check_exact=True,
        )
    assert (fire.rebuild == 1).all()
    assert (never.rebuild == 0).all()
    assert (base.rebuild == int(base.psi_total.iloc[0] >= PSI_REBUILD_BAR)).all()


def test_drift_reads_stored_index(spark):
    """Plan pin: the audit READS the persisted ivf_cents/ivf_index
    checkpoints (Scan ExistingRDD) and consumes the embeddings parquet
    exactly once — inside the batch-histogram checkpoint build — so the
    final plan holds ZERO parquet scans, zero Python eval, and no
    CartesianProduct (every cross join is against a broadcast 1-row or
    cells-sized relation)."""
    embeddings_drift_psi(spark, SF).collect()  # memos live; now re-plan
    df = embeddings_drift_psi(spark, SF)
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Scan ExistingRDD" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0, plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_PROP = settings(
    derandomize=True,
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)


@_PROP
@given(
    n_vec=st.integers(3, 40),
    dim=st.integers(2, 16),
    seed=st.integers(0, 10**6),
    data=st.data(),
)
def test_drift_property(spark, tmp_path_factory, n_vec, dim, seed, data):
    """Property form of the numpy agreement: on ARBITRARY corpora —
    random sizes/dimensions, vec_id gaps, corpora smaller than the
    codebook, empty batches, low-entropy lattices where assignment ties
    (broken by cid) genuinely occur — every column agrees bit-for-bit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from currency_etl_spark.operators.ckpt import reset_memos

    ids = sorted(
        data.draw(
            st.sets(st.integers(0, 200), min_size=n_vec, max_size=n_vec).filter(
                lambda s: any(v % KNN_BATCH_MOD != KNN_BATCH_REM for v in s)
            )
        )
    )
    rng = np.random.RandomState(seed)
    emb = [(rng.randint(0, 3, dim) / 2.0).astype(np.float32) for _ in ids]
    d = tmp_path_factory.mktemp("prop_drift")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [e.tolist() for e in emb], pa.list_(pa.float32())
                ),
                "label": pa.array([int(v % 3) for v in ids], pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    reset_memos()
    try:
        want = _np_psi(str(d))
        got = embeddings_drift_psi(spark, str(d)).toPandas()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False, check_exact=True
        )
    finally:
        reset_memos()
