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


def test_grid_resize_nearest_neighbor_exact(spark):
    """grid_resize must reproduce the classic floor-sampling NN kernel
    exactly: output pixel (j, i) = input pixel (j*h//out_h, i*w//out_w).
    Verified against a per-pixel pure-Python oracle on asymmetric grids,
    identity resize must return the original buffer, and truncated blobs
    (len < h*w) are dropped."""
    import numpy as np

    from currency_etl_spark.operators.multimodal import grid_resize, resize_image

    grids = {
        1: (6, 8),   # downsample source
        2: (3, 4),   # identity target
        3: (2, 2),   # truncated (blob shorter than h*w)
    }
    rows = []
    for doc_id, (h, w) in grids.items():
        size = h * w if doc_id != 3 else h * w - 1
        rows.append(
            (doc_id, bytes(((doc_id * 37 + k * 11) % 256) for k in range(size)), h, w)
        )
    df = spark.createDataFrame(rows, "doc_id long, blob binary, h int, w int")
    out = {r["doc_id"]: r for r in grid_resize(df, 3, 4).collect()}

    assert set(out) == {1, 2}  # truncated doc 3 dropped
    for doc_id in (1, 2):
        h, w = grids[doc_id]
        src = dict((r[0], r[1]) for r in rows)[doc_id]
        arr = np.frombuffer(src[: h * w], dtype=np.uint8).reshape(h, w)
        want = bytes(
            arr[(j * h) // 3, (i * w) // 4] for j in range(3) for i in range(4)
        )
        got = bytes(out[doc_id]["blob"])
        assert got == want, doc_id
        assert (out[doc_id]["out_h"], out[doc_id]["out_w"]) == (3, 4)
    # identity resize of an exact-size grid returns the original bytes
    assert bytes(out[2]["blob"]) == rows[1][1]

    with pytest.raises(NotImplementedError):
        resize_image(b"x", 1, 1)


def test_grid_resize_int32_dim_product_does_not_wrap(spark):
    """h and w arrive as int32; h*w for a 50000x50000 declaration wraps
    negative in int32, which would let a tiny truncated blob through the
    length guard and crash the task on reshape. The guard must widen to
    int64 BEFORE multiplying: the truncated row is dropped, valid rows in
    the same batch survive."""
    from currency_etl_spark.operators.multimodal import grid_resize

    rows = [
        (1, bytes(range(12)), 3, 4),          # valid 3x4 grid
        (2, b"\x01\x02\x03", 50000, 50000),   # h*w wraps int32 negative
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary, h int, w int")
    out = {r["doc_id"] for r in grid_resize(df, 2, 2).collect()}
    assert out == {1}


def test_perceptual_hash_gradient_kernel_exact(spark):
    """perceptual_hash must reproduce the cyclic gradient hash exactly:
    bit i set iff hist16[i] > hist16[(i+1) % 16]. Verified against a
    per-bit pure-Python oracle on crafted payloads (uniform histogram →
    phash 0, single-byte payload, empty blob → phash 0), plus checksum
    parity and the single-Arrow-pass schema contract."""
    from currency_etl_spark.operators.multimodal import (
        _gradient_hash,
        perceptual_hash,
        phash_image,
    )

    payloads = {
        1: bytes(range(256)),            # perfectly uniform histogram
        2: b"\x00",                      # one byte: bin 0 beats bin 1 only... and bin 15 vs 0
        3: b"",                          # empty blob
        4: b"abcabcabc-mixed payload!",  # arbitrary text-like bytes
        5: bytes(range(256)) + b"\x05" * 7,  # mild perturbation of 1
    }

    def py_phash(b: bytes) -> int:
        hist = [0] * 16
        for byte in b:
            hist[byte % 16] += 1
        return sum(
            (1 << i) for i in range(16) if hist[i] > hist[(i + 1) % 16]
        )

    df = spark.createDataFrame(
        sorted(payloads.items()), "doc_id long, blob binary"
    )
    out = {r["doc_id"]: r for r in perceptual_hash(df).collect()}
    assert set(out) == set(payloads)
    for doc_id, b in payloads.items():
        assert out[doc_id]["phash"] == py_phash(b) == _gradient_hash(b), doc_id
        assert out[doc_id]["checksum"] == hashlib.md5(b).hexdigest()
    # uniform histogram and empty blob both hash to 0 (no strict gradients)
    assert out[1]["phash"] == 0 and out[3]["phash"] == 0
    # identical distribution shape collides; the perturbed copy differs in
    # exactly the bins the extra bytes tipped (still a valid 16-bit value)
    assert 0 <= out[5]["phash"] < (1 << 16)
    # single-byte payload: only bin 0 is nonzero → bit 0 set, bit 15 unset
    assert out[2]["phash"] == 1

    with pytest.raises(NotImplementedError):
        phash_image(b"\x89PNG...")


def test_asset_gc_agrees_with_dedup_plan(spark, sf_dir):
    """Cross-entry pin: the GC action and the dedup plan describe the
    same address space — identical reference counts per checksum, the
    same canonical election whenever the dedup canonical is still live,
    collected exactly when no live reference remains, and the GC
    reclaims at least the dedup plan's waste (it additionally collects
    addresses whose last reference died)."""
    from currency_etl_spark.catalog import load_catalog

    cat = load_catalog()
    gc = {r["checksum"]: r for r in cat["multimodal_asset_gc"].spark_fn(spark, sf_dir).collect()}
    dd = {r["checksum"]: r for r in cat["multimodal_dedup_assets"].spark_fn(spark, sf_dir).collect()}
    assert set(gc) == set(dd)
    some_collected = False
    for ck, g in gc.items():
        d = dd[ck]
        assert g["n_refs"] == d["n_copies"]
        assert 0 <= g["n_live_refs"] <= g["n_refs"]
        assert g["collected"] == (g["n_live_refs"] == 0)
        if g["collected"]:
            some_collected = True
            assert g["canonical_doc"] == -1
            assert g["bytes_reclaimed"] == g["n_refs"] * g["n_bytes"]
        else:
            assert g["canonical_doc"] >= 0 and g["canonical_doc"] % 10 != 3
            if d["canonical_doc"] % 10 != 3:
                assert g["canonical_doc"] == d["canonical_doc"]
            assert g["bytes_reclaimed"] == (g["n_refs"] - 1) * g["n_bytes"]
    assert some_collected, "the tombstone cohort collected nothing — degenerate"
    assert sum(g["bytes_reclaimed"] for g in gc.values()) >= sum(
        d["wasted_bytes"] for d in dd.values()
    )
