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
