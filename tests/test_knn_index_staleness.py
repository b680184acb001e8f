"""knn_index_staleness invariants: a pure-numpy re-derivation of the
whole recall curve must match exactly; the curve must be monotone in
nprobe and saturate at 1.0 / |corpus| when every cell is probed; the
bins must agree with what knn_incremental actually SERVES at the same
nprobe (the audit grades the screen, so the two may never disagree);
and the plan must READ the stored index checkpoints, scanning the
embeddings parquet exactly once — the audit evaluates the frozen index,
it never rebuilds it."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from currency_etl_spark.queries.vectors import (
    KNN_BATCH_MOD,
    KNN_BATCH_REM,
    N_CENTROIDS,
    RECALL_K,
    knn_incremental,
    knn_index_staleness,
)

SF = "/root/testdata/sf0.001"


def _np_staleness(sf: str):
    """(per-nprobe rows, true-NN map) re-derived with numpy only."""
    emb = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    qv = {
        r.vec_id: np.round(np.asarray(r.embedding, dtype=np.float64) * 1e6).astype(
            np.int64
        )
        for r in emb.itertuples()
    }
    is_batch = lambda v: v % KNN_BATCH_MOD == KNN_BATCH_REM
    corpus = sorted(v for v in qv if not is_batch(v))
    batch = sorted(v for v in qv if is_batch(v))
    cents = corpus[:N_CENTROIDS]

    def d2(a, b):
        d = qv[a] - qv[b]
        return int((d * d).sum())

    cell = {v: min(cents, key=lambda c: (d2(v, c), c)) for v in corpus}
    csize = {c: sum(1 for v in corpus if cell[v] == c) for c in cents}
    rows = []
    true_nn = {}
    # per query: sorted cell election (probe order) + exact top-K cells
    prank = {
        b: {c: i + 1 for i, c in enumerate(sorted(cents, key=lambda c: (d2(b, c), c)))}
        for b in batch
    }
    topk = {
        b: sorted(corpus, key=lambda v: (d2(b, v), v))[:RECALL_K] for b in batch
    }
    for b in batch:
        true_nn[b] = topk[b][0]
    for n in range(1, N_CENTROIDS + 1):
        h1 = sum(1 for b in batch if prank[b][cell[topk[b][0]]] <= n)
        hk = sum(
            1 for b in batch for v in topk[b] if prank[b][cell[v]] <= n
        )
        cands = sum(
            csize[c] for b in batch for c in cents if prank[b][c] <= n
        )
        nq = len(batch)
        rows.append(
            (
                n,
                nq,
                round(h1 / nq, 6),
                round(hk / (nq * RECALL_K), 6),
                round(cands / nq, 6),
            )
        )
    return rows, true_nn, len(corpus)


COLS = ["nprobe", "n_queries", "recall_at_1", "recall_at_k", "avg_candidates"]


def _rows(df):
    return [tuple(r[c] for c in COLS) for r in df.collect()]


def test_staleness_matches_numpy(spark):
    want, _, _ = _np_staleness(SF)
    got = _rows(knn_index_staleness(spark, SF))
    assert got == want


def test_staleness_curve_shape(spark):
    """Monotone recall/cost in nprobe; full probing saturates: recall 1.0
    on both axes and avg_candidates == |corpus| (every cell searched)."""
    got = _rows(knn_index_staleness(spark, SF))
    _, _, n_corpus = _np_staleness(SF)
    assert [r[0] for r in got] == list(range(1, N_CENTROIDS + 1))
    for prev, cur in zip(got, got[1:]):
        assert cur[2] >= prev[2]  # recall@1
        assert cur[3] >= prev[3]  # recall@k
        assert cur[4] >= prev[4]  # candidate cost
    last = got[-1]
    assert last[2] == 1.0 and last[3] == 1.0
    assert last[4] == float(n_corpus)
    # the audit must have something to say: recall below 1.0 somewhere
    # (otherwise the corpus is degenerate and the curve is vacuous)
    assert got[0][2] < 1.0 or got[0][3] < 1.0


def test_staleness_agrees_with_served_screen(spark):
    """recall@1 at bin n must equal the fraction of batch vectors whose
    SERVED neighbor (knn_incremental at nprobe=n) is the exact true NN —
    the audit and the screen it audits can never disagree."""
    _, true_nn, _ = _np_staleness(SF)
    curve = {r[0]: r[2] for r in _rows(knn_index_staleness(spark, SF))}
    for n in (1, 2, N_CENTROIDS):
        served = {
            r["vec_id"]: r["nn_vec_id"]
            for r in knn_incremental(spark, SF, nprobe=n).collect()
        }
        assert set(served) == set(true_nn)
        frac = round(
            sum(1 for v, nn in served.items() if nn == true_nn[v]) / len(served), 6
        )
        assert curve[n] == frac, n


def test_staleness_reads_stored_index(spark):
    """Plan pin: the audit READS the persisted ivf_cents/ivf_index
    checkpoints (Scan ExistingRDD) and scans the embeddings parquet
    exactly ONCE per session — at the memoized probe base's build
    (stale_probes, shared with knn_index_rebuild since r17); the final
    plan therefore holds ZERO parquet scans — evaluating staleness must
    not itself rebuild the index it is judging. Ground truth runs as
    ONE Arrow cogroup tile stage (exact int64 matmul per cell), paid
    inside the memoized stale_truth base's build (also shared with the
    rebuild) — so the SERVED plan holds no Python stage at all."""
    knn_index_staleness(spark, SF).collect()  # memos live; now re-plan
    df = knn_index_staleness(spark, SF)
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Scan ExistingRDD" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0, plan
    assert "FlatMapCoGroupsInPandas" not in plan
    assert "BatchEvalPython" not in plan


from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_PROP = settings(derandomize=True, max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))


@_PROP
@given(
    n_vec=st.integers(3, 40),
    dim=st.integers(2, 16),
    seed=st.integers(0, 10**6),
    data=st.data(),
)
def test_staleness_property(spark, tmp_path_factory, n_vec, dim, seed, data):
    """Property form of the numpy agreement: on ARBITRARY corpora —
    random sizes/dimensions, vec_id gaps, corpora smaller than the
    codebook or than RECALL_K, low-entropy lattices where distance ties
    (broken by vec_id) genuinely occur — the whole recall curve equals
    the pure-python derivation bit-for-bit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from currency_etl_spark.operators.ckpt import reset_memos
    from currency_etl_spark.queries.vectors import knn_index_staleness

    ids = sorted(
        data.draw(
            st.sets(st.integers(0, 200), min_size=n_vec, max_size=n_vec).filter(
                lambda s: any(v % KNN_BATCH_MOD == KNN_BATCH_REM for v in s)
                and any(v % KNN_BATCH_MOD != KNN_BATCH_REM for v in s)
            )
        )
    )
    rng = np.random.RandomState(seed)
    emb = [(rng.randint(0, 3, dim) / 2.0).astype(np.float32) for _ in ids]
    d = tmp_path_factory.mktemp("prop_staleness")
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
        want, _, _ = _np_staleness(str(d))
        got = _rows(knn_index_staleness(spark, str(d)))
        assert got == want
    finally:
        reset_memos()


# ---------------------------------------------------------------------------
# knn_index_rebuild: the retrain ACTION the audit decides on
# ---------------------------------------------------------------------------


def test_rebuild_before_curve_equals_staleness_audit(spark):
    """Cross-entry pin: knn_index_rebuild's recall_before is the SAME
    containment-recall@K the staleness audit reports (truth neighbor's
    stored cell probed at nprobe n), and its cands_before is the audit's
    avg_candidates — the rebuild grades itself against exactly the
    curve that triggered it, so the decision and the action can never
    disagree about the 'before' state."""
    from currency_etl_spark.queries.vectors import knn_index_rebuild

    audit = {
        r["nprobe"]: r
        for r in knn_index_staleness(spark, SF).collect()
    }
    for r in knn_index_rebuild(spark, SF).collect():
        assert r["recall_before"] == audit[r["nprobe"]]["recall_at_k"]
        assert r["cands_before"] == audit[r["nprobe"]]["avg_candidates"]


def test_rebuild_curve_shape(spark):
    """Both recall curves are monotone in nprobe and saturate at exactly
    1.0 at full depth (containment over all cells is total on both the
    stored and the retrained index); the delta is their exact difference;
    and the rebuild must PAY somewhere below full depth (a retrain that
    buys nothing anywhere would mean the drift monitors triggered on a
    corpus the codebook already fits — degenerate for the graded data)."""
    from currency_etl_spark.queries.vectors import knn_index_rebuild

    rows = sorted(knn_index_rebuild(spark, SF).collect(), key=lambda r: r["nprobe"])
    assert [r["nprobe"] for r in rows] == list(range(1, N_CENTROIDS + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert cur["recall_before"] >= prev["recall_before"]
        assert cur["recall_after"] >= prev["recall_after"]
        assert cur["cands_before"] >= prev["cands_before"]
        assert cur["cands_after"] >= prev["cands_after"]
    last = rows[-1]
    assert last["recall_before"] == 1.0 and last["recall_after"] == 1.0
    assert last["recall_delta"] == 0.0
    for r in rows:
        assert r["recall_delta"] == round(r["recall_after"] - r["recall_before"], 6)
    assert any(r["recall_delta"] > 0 for r in rows[:-1])
