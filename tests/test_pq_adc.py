"""knn_pq_adc invariants: an independent numpy re-derivation of the whole
IVF-PQ/ADC pipeline on the shared 1e6 integer lattice must reproduce the
Spark top-N exactly (third engine beside the DuckDB oracle), and the ADC
structure must hold: every candidate lies in a probed cell, adc is the
sum of query-table entries selected by the vector's codes, and ADC
approximates (never equals corpus-wide, on this data) the true distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from currency_etl_spark.queries.vectors import (
    ADC_TOP_N,
    IVF_NPROBE,
    N_CENTROIDS,
    PQ_DSUB,
    PQ_K,
    PQ_M,
)

SF = "/root/testdata/sf0.001"


def _numpy_adc():
    df = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    ids = df.vec_id.to_numpy()
    lab = dict(zip(df.vec_id, df.label))
    qv = np.rint(np.stack(df.embedding.to_numpy()).astype(np.float64) * 1e6).astype(
        np.int64
    )
    by_id = {i: qv[k] for k, i in enumerate(ids)}
    cents = np.stack([by_id[i] for i in range(N_CENTROIDS)])
    d2c = ((qv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # exact in int64
    cell = d2c.argmin(axis=1)  # ties: first index = lowest cid, same as (d, cid) min
    q_idx = int(np.where(ids == 0)[0][0])
    qcells = set(np.lexsort((np.arange(N_CENTROIDS), d2c[q_idx]))[:IVF_NPROBE])
    cb = np.stack([by_id[i] for i in range(PQ_K)])
    # per-vector, per-subspace distances to each PQ centroid
    sub = qv.reshape(len(ids), PQ_M, PQ_DSUB)
    csub = cb.reshape(PQ_K, PQ_M, PQ_DSUB)
    dm = ((sub[:, None, :, :] - csub[None, :, :, :]) ** 2).sum(axis=3)  # (n, K, M)
    codes = dm.argmin(axis=1)  # (n, M), first-min tie-break
    dtab = dm[q_idx]  # (K, M): query's table
    rows = []
    for k, i in enumerate(ids):
        if i == 0 or cell[k] not in qcells:
            continue
        adc = int(sum(dtab[codes[k, m], m] for m in range(PQ_M)))
        td = int(((qv[k] - qv[q_idx]) ** 2).sum())
        rows.append((int(i), lab[i], int(cell[k]), adc, td))
    rows.sort(key=lambda r: (r[3], r[0]))
    return rows[:ADC_TOP_N], qcells


def test_pq_adc_matches_numpy(spark):
    from currency_etl_spark.queries.vectors import knn_pq_adc

    got = knn_pq_adc(spark, SF).collect()
    want, qcells = _numpy_adc()
    assert len(got) == len(want) == ADC_TOP_N
    for g, w in zip(got, want):
        assert (g["vec_id"], g["label"], g["cid"]) == w[:3], (g, w)
        assert abs(g["adc_dist"] - round(w[3] / 1e12, 6)) < 1e-9, (g, w)
        assert abs(g["true_dist"] - round(w[4] / 1e12, 6)) < 1e-9, (g, w)
        assert abs(g["adc_err"] - round((w[3] - w[4]) / 1e12, 6)) < 1e-9, (g, w)
    # structure: candidates come only from the probed cells, distances
    # are non-negative, and the list is ADC-ordered
    assert {g["cid"] for g in got} <= qcells
    assert all(g["adc_dist"] >= 0 and g["true_dist"] >= 0 for g in got)
    adcs = [g["adc_dist"] for g in got]
    assert adcs == sorted(adcs)
    # ADC is an approximation: it must differ from the true distance
    # somewhere in the top-N (identical everywhere would mean the codes
    # are secretly the full vectors)
    assert any(abs(g["adc_err"]) > 0 for g in got)
