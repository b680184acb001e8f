"""Multimodal columns: opaque binary payloads + typed metadata, processed
with Arrow-batched `mapInPandas` (SURVEY.md §7.2.7 / north-star).

Model: an image/audio/video asset is a `binary` column plus a metadata
struct (mime, n_bytes, checksum). The Spark-side plumbing — schema,
partition sizing, UDF signatures, Arrow batch shapes — is real and tested;
the codec itself is STUBBED: `decode_image` raises NotImplementedError
(image/audio libs aren't in this container), and `fake_decode_features`
is the deterministic stand-in used by tests, computing a 16-bin byte
histogram per blob so the whole path has verifiable output.

Scale design:
  * blobs stay opaque bytes end-to-end — no JVM<->Python row serde; Arrow
    moves them to pandas in columnar batches (`mapInPandas`);
  * decode parallelism is partition-level: `repartition` by a size budget
    so one executor core handles ~`target_mb` of blobs per task;
  * metadata lives in a separate narrow struct column, so metadata-only
    queries (counts, mime filters) never touch the bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HIST_BINS = 16

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, features array<double>"
)


def attach_blob(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, blob: binary, meta: struct).

    In production the blob is the raw image/audio bytes from the lake; here
    it is the UTF-8 payload of `text` (deterministic, real binary column).
    """
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.md5(blob).alias("checksum"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def size_balanced(blobs: DataFrame, target_mb: int = 128) -> DataFrame:
    """Repartition so each decode task handles ~target_mb of blob bytes —
    the knob that keeps 100 TB of mixed-size assets from skewing a few
    executors. One metadata aggregation (sum of n_bytes, no blob read
    thanks to column pruning) sizes the shuffle."""
    total = blobs.agg(F.sum(F.octet_length("blob")).alias("b")).collect()[0]["b"] or 0
    parts = max(1, int(total // (target_mb * 1024 * 1024)) + 1)
    return blobs.repartition(parts)

def decode_image(blob: bytes) -> "object":
    """Real image decode — requires PIL/cv2, not present in this container.

    The Spark plumbing around this stub (attach_blob → mapInPandas →
    FEATURE_SCHEMA) is the deliverable; swap this function for a real codec
    on a cluster with the libs installed.
    """
    raise NotImplementedError("image codec not available in this environment")


def _byte_histogram(b: bytes) -> list[float]:
    """Deterministic fake 'feature extractor': 16-bin histogram of byte
    values, L1-normalized. Stands in for embedding/decoding output.

    Vectorized with numpy — a per-byte Python loop here was the slowest
    catalog entry (~10 s @ sf0.1); np.bincount over the raw buffer is the
    same output bit-for-bit at ~10× less CPU, and models how a real
    decoder wrapper should treat the buffer (array ops, not byte loops).
    """
    arr = np.frombuffer(b, dtype=np.uint8)
    counts = np.bincount(arr % N_HIST_BINS, minlength=N_HIST_BINS)
    total = float(len(b)) or 1.0
    return (counts / total).tolist()


def fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch of (doc_id, blob, meta) → features.

    Shape contract: each incoming batch is a pandas DataFrame whose `blob`
    column holds Python bytes; output conforms to FEATURE_SCHEMA.
    """
    import hashlib

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["blob"].map(len).astype("int64"),
                "checksum": pdf["blob"].map(lambda b: hashlib.md5(b).hexdigest()),
                "features": pdf["blob"].map(_byte_histogram),
            }
        )


def extract_features(
    blobs: DataFrame,
    fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]] = fake_decode_features,
) -> DataFrame:
    """Run the (stub) decoder over the blob column in Arrow batches."""
    return blobs.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample(blobs: DataFrame, frame_bytes: int = 64, every: int = 4) -> DataFrame:
    """'Video' frame sampling as deterministic binary slicing: treat the blob
    as fixed-size frames, keep every k-th — pure built-ins (substring on
    binary), no Python. Output one row per kept frame."""
    n_frames = F.floor(F.octet_length("blob") / F.lit(frame_bytes)).cast("int")
    # guard: sequence(0, -1) would generate a DESCENDING range, not empty
    frames = F.when(n_frames >= 1, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.expr("CAST(array() AS ARRAY<INT>)")
    )
    return (
        blobs.select("doc_id", "blob", F.explode(frames).alias("f"))
        .filter(F.col("f") % every == 0)
        .select(
            "doc_id",
            F.col("f").cast("long").alias("frame_idx"),
            F.substring(F.col("blob"), F.col("f") * frame_bytes + 1, frame_bytes).alias("frame"),
        )
    )


PHASH_SCHEMA = "doc_id long, phash long, checksum string"


def phash_image(blob: bytes) -> int:
    """Real perceptual hash (DCT over decoded, downscaled pixels — the
    pHash/dHash family) — requires an image codec, not present in this
    container. Same contract as decode_image/resize_image: the Spark
    plumbing around this stub (perceptual_hash's Arrow batching,
    PHASH_SCHEMA, the phash groupBy downstream) is the deliverable; swap
    this for a real pHash on a cluster with the libs installed."""
    raise NotImplementedError("image codec not available in this environment")


def _gradient_hash(b: bytes) -> int:
    """Deterministic codec-free pHash stand-in with verifiable output:
    cyclic gradient hash over the 16-bin byte histogram — bit i is set
    iff count[i] > count[(i+1) % 16]. Exactly dHash's construction
    ('is this cell brighter than its neighbor?') applied to the byte
    distribution instead of downscaled pixels, so byte-identical copies
    AND lightly perturbed payloads with the same distribution shape
    collide, while different content spreads across the 16-bit space.
    Integer count comparisons only — no float thresholds to drift."""
    arr = np.frombuffer(b, dtype=np.uint8)
    counts = np.bincount(arr % N_HIST_BINS, minlength=N_HIST_BINS).astype(np.int64)
    bits = (counts > np.roll(counts, -1)).astype(np.int64)
    return int((bits << np.arange(N_HIST_BINS, dtype=np.int64)).sum())


def perceptual_hash(blobs: DataFrame) -> DataFrame:
    """(doc_id, blob) → (doc_id, phash, checksum) in ONE Arrow pass —
    the fingerprint verb of the multimodal family. Both the perceptual
    fingerprint and the exact checksum come out of the same mapInPandas
    scan so near-dup detection never reads the blob column twice;
    downstream is a narrow 24-byte-per-asset relation whatever the asset
    size. Real codec path is phash_image (stubbed); _gradient_hash is
    the deterministic stand-in, mirrored exactly by the DuckDB oracle of
    multimodal_phash_dedup."""
    import hashlib

    def _ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": pd.Series(
                        [_gradient_hash(b) for b in pdf["blob"]],
                        dtype="int64",
                        index=pdf.index,
                    ),
                    "checksum": pdf["blob"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return blobs.mapInPandas(_ph, schema=PHASH_SCHEMA)


#: 16-bit fingerprint width of _gradient_hash — the Hamming-probe fanout
#: below is its bit count + 1.
PHASH_BITS = 16


def hamming1_probes(phash: str = "phash"):
    """The Hamming-1 multiprobe bucket array over a 16-bit perceptual
    hash column: the hash itself plus each single-bit flip — 17 probe
    keys whose equi-join against the stored fingerprint index finds
    every neighbor within Hamming distance 1 without ever forming
    asset x asset pairs. SINGLE definition of the bucket scheme: the
    batch entry (queries/multimodal.py:multimodal_phash_near) and the
    streaming screen (streaming/jobs.py:_phash_screen_stream) both plan
    exactly this expression, so batch and stream can never drift."""
    return F.array(
        F.col(phash), *[F.expr(f"{phash} ^ {1 << i}") for i in range(PHASH_BITS)]
    )


RESIZE_SCHEMA = "doc_id long, out_h int, out_w int, blob binary"


def resize_image(blob: bytes, out_w: int, out_h: int) -> bytes:
    """Real image resize — requires PIL/cv2, not present in this container.
    Same contract as decode_image: the Spark plumbing (grid_resize's
    Arrow batching, RESIZE_SCHEMA, size_balanced partitioning) is the
    deliverable; swap this for `PIL.Image.resize` on a cluster with the
    libs installed."""
    raise NotImplementedError("image codec not available in this environment")


def _nn_resize(b: bytes, h: int, w: int, out_h: int, out_w: int) -> bytes:
    """Deterministic nearest-neighbor resize of a raw h×w byte grid —
    the codec-free stand-in with verifiable output: output pixel (j, i)
    is input pixel (j*h//out_h, i*w//out_w) (floor sampling, the classic
    NN kernel). Vectorized: one np.ix_ gather over the reshaped buffer,
    no per-pixel Python."""
    arr = np.frombuffer(b[: h * w], dtype=np.uint8).reshape(h, w)
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[np.ix_(rows, cols)].tobytes()


def grid_resize(blobs: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Batch resize over (doc_id, blob, h, w) rows via mapInPandas — the
    'resize' verb of the multimodal family (decode / feature-extract /
    resize / frame-sample). Arrow moves blobs columnar; each task
    resizes its batch with vectorized numpy; downstream size budgeting
    is size_balanced's job, exactly as for decoding. Rows whose blob is
    shorter than h*w are dropped (a real decoder rejects truncated
    buffers; deterministic here so tests can pin the behavior)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # widen BEFORE multiplying: h and w arrive as int32, and an
            # int32 product wraps for large declared dims (h=w=50000),
            # letting a truncated blob through to a reshape failure
            need = pdf["h"].astype("int64") * pdf["w"].astype("int64")
            ok = pdf[pdf["blob"].map(len) >= need]
            yield pd.DataFrame(
                {
                    "doc_id": ok["doc_id"],
                    "out_h": out_h,
                    "out_w": out_w,
                    "blob": [
                        _nn_resize(b, int(h), int(w), out_h, out_w)
                        for b, h, w in zip(ok["blob"], ok["h"], ok["w"])
                    ],
                }
            )

    return blobs.mapInPandas(_resize, schema=RESIZE_SCHEMA)
