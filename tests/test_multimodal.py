"""Multimodal plumbing tests: blob/metadata construction, Arrow batch shape
through mapInPandas, the deterministic stub features vs a pure-Python
oracle, frame sampling edges, size-balanced repartitioning, and the stubbed
real codec contract."""

from __future__ import annotations

import hashlib

import pytest

from currency_etl_spark.operators.multimodal import (
    N_HIST_BINS,
    _byte_histogram,
    attach_blob,
    decode_image,
    extract_features,
    frame_sample,
    size_balanced,
)
from currency_etl_spark.sources import table


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    return attach_blob(table(spark, sf_dir, "documents"))


def test_blob_and_metadata(blobs):
    row = blobs.orderBy("doc_id").first()
    assert isinstance(row["blob"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["blob"])
    assert row["meta"]["checksum"] == hashlib.md5(bytes(row["blob"])).hexdigest()
    assert row["meta"]["mime"] == "application/octet-stream"


def test_features_match_python_oracle(blobs):
    got = {r["doc_id"]: r for r in extract_features(blobs).collect()}
    src = {r["doc_id"]: bytes(r["blob"]) for r in blobs.collect()}
    assert set(got) == set(src)
    for doc_id, b in list(src.items())[:50]:
        r = got[doc_id]
        assert r["n_bytes"] == len(b)
        assert r["checksum"] == hashlib.md5(b).hexdigest()
        assert r["features"] == pytest.approx(_byte_histogram(b))
        assert len(r["features"]) == N_HIST_BINS
        assert sum(r["features"]) == pytest.approx(1.0)


def test_frame_sample_slices(blobs, spark):
    frames = frame_sample(blobs.select("doc_id", "blob"), frame_bytes=64, every=4)
    src = {r["doc_id"]: bytes(r["blob"]) for r in blobs.collect()}
    rows = frames.collect()
    assert rows, "expected at least one frame"
    for r in rows[:100]:
        b = src[r["doc_id"]]
        i = r["frame_idx"]
        assert i % 4 == 0
        assert bytes(r["frame"]) == b[i * 64 : i * 64 + 64]
    # tiny blob (< one frame) yields no rows and no descending-sequence error
    tiny = spark.createDataFrame([(1, b"short")], "doc_id long, blob binary")
    assert frame_sample(tiny, frame_bytes=64).count() == 0


def test_size_balanced_partitions(blobs):
    out = size_balanced(blobs.select("doc_id", "blob"), target_mb=1)
    assert out.rdd.getNumPartitions() >= 1
    assert out.count() == blobs.count()


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_storage_quota_greedy_invariants(spark, sf_dir):
    """The quota keeps a largest-first prefix: every kept asset is >= every
    dropped asset within its language, kept bytes never exceed the budget,
    and adding the next-largest dropped asset would break it."""
    from currency_etl_spark.catalog import load_catalog
    from currency_etl_spark.queries.multimodal import QUOTA_DEN, QUOTA_NUM
    from currency_etl_spark.sources import table as _table

    got = (
        load_catalog()["multimodal_storage_quota"]
        .spark_fn(spark, sf_dir)
        .toPandas()
        .set_index("lang")
    )
    docs = _table(spark, sf_dir, "documents").toPandas()
    docs["n_bytes"] = docs.text.str.len()  # ASCII corpus: chars == bytes
    for lang, grp in docs.groupby("lang"):
        sizes = grp.sort_values(["n_bytes", "doc_id"], ascending=[False, True]).n_bytes.tolist()
        total = sum(sizes)
        cum, kept_bytes, n_kept = 0, 0, 0
        for s in sizes:
            cum += s
            if cum * QUOTA_DEN <= total * QUOTA_NUM:
                kept_bytes, n_kept = cum, n_kept + 1
            else:
                break
        row = got.loc[lang]
        assert row.n_assets == len(sizes)
        assert row.total_bytes == total
        assert row.n_kept == n_kept
        assert row.kept_bytes == kept_bytes
        assert row.kept_bytes * QUOTA_DEN <= total * QUOTA_NUM
        if n_kept < len(sizes):
            assert (kept_bytes + sizes[n_kept]) * QUOTA_DEN > total * QUOTA_NUM
