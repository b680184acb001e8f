"""Catalog entries for the multimodal column plumbing
(currency_etl_spark/operators/multimodal.py).

`multimodal_meta_stats`, `multimodal_frame_sample`, and
`multimodal_dedup_assets` are fully oracle'd — blob construction, metadata
structs, binary frame slicing, and checksum grouping are exact in both
engines. `multimodal_features` runs the Arrow-batched mapInPandas
decode path with the deterministic stub extractor; its output is checked
rows-only by the driver (the real codec is a NotImplementedError stub —
operators/multimodal.py:decode_image) and value-checked in
tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_spark.catalog import register
from currency_etl_spark.operators.multimodal import (
    attach_blob,
    extract_features,
    frame_sample,
    hamming1_probes,
)
from currency_etl_spark.sources import table


@register(
    "multimodal_meta_stats",
    oracle="""
        SELECT lang,
               count(*) AS n_assets,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
               count(DISTINCT md5(text)) AS n_distinct_payloads
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("llm", "multimodal"),
    doc=(
        "Metadata-only rollup over binary assets: counts/sizes/distinct "
        "checksums per language, grouped on the metadata struct. The blob "
        "column is never read (column pruning) — at 100 TB this runs at "
        "footer/metadata speed."
    ),
)
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = attach_blob(table(spark, sf_dir, "documents"))
    return (
        blobs.groupBy(F.col("meta.lang").alias("lang"))
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.max("meta.n_bytes").alias("max_bytes"),
            F.countDistinct("meta.checksum").alias("n_distinct_payloads"),
        )
    )


@register(
    "multimodal_frame_sample",
    oracle="""
        -- DuckDB substring() has no BLOB overload; the corpus text is pure
        -- ASCII (verified octet_length == length at every SF), so VARCHAR
        -- character slicing is byte-identical to Spark's binary slicing.
        WITH f AS (
            SELECT doc_id, text,
                   unnest(generate_series(0, CAST(floor(octet_length(encode(text)) / 64) AS INTEGER) - 1)) AS fi
            FROM documents
            WHERE octet_length(encode(text)) >= 64
        )
        SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
               md5(substring(text, fi * 64 + 1, 64)) AS frame_digest
        FROM f
        WHERE fi % 4 = 0
        ORDER BY doc_id, frame_idx
    """,
    tags=("llm", "multimodal"),
    doc=(
        "Deterministic 'video' frame sampling: slice each blob into 64-byte "
        "frames, keep every 4th (emitted as md5 digests for a compact "
        "compare). Pure built-ins — binary substring + explode — no Python."
    ),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = attach_blob(table(spark, sf_dir, "documents")).select("doc_id", "blob")
    return (
        frame_sample(blobs, frame_bytes=64, every=4)
        .select("doc_id", "frame_idx", F.md5("frame").alias("frame_digest"))
    )


@register(
    "multimodal_features",
    oracle="""
        -- DuckDB twin of the stub decoder: 16-bin byte histogram, L1-
        -- normalized. Corpus text is pure ASCII (octet_length == length at
        -- every SF), so ord() over character positions IS the byte value.
        -- value = count/total is IEEE double division of exact ints in both
        -- engines → bit-identical without rounding. Zero-count bins are
        -- emitted explicitly (grid LEFT JOIN), matching the Python
        -- histogram's dense 16-element output.
        WITH d AS (
            SELECT doc_id, text, octet_length(encode(text)) AS total
            FROM documents
        ),
        pos AS (
            SELECT doc_id, text, unnest(generate_series(1, total)) AS i
            FROM d
        ),
        counts AS (
            SELECT doc_id, ord(substring(text, i, 1)) % 16 AS bin_idx,
                   count(*) AS c
            FROM pos GROUP BY doc_id, ord(substring(text, i, 1)) % 16
        ),
        grid AS (
            SELECT d.doc_id, d.total, g.bin_idx
            FROM d, (SELECT unnest(generate_series(0, 15)) AS bin_idx) g
        )
        SELECT g.doc_id,
               CAST(g.bin_idx AS BIGINT) AS bin_idx,
               CAST(coalesce(c.c, 0) AS DOUBLE)
                   / (CASE WHEN g.total = 0 THEN 1.0 ELSE CAST(g.total AS DOUBLE) END)
                   AS value
        FROM grid g
        LEFT JOIN counts c ON c.doc_id = g.doc_id AND c.bin_idx = g.bin_idx
        ORDER BY g.doc_id, g.bin_idx
    """,
    tags=("llm", "multimodal", "pandas-udf"),
    doc=(
        "Arrow-batched feature extraction over the blob column via "
        "mapInPandas with the deterministic stub decoder (16-bin byte "
        "histogram). The real image codec is stubbed (NotImplementedError) — "
        "the schema/batching/partition plumbing is the deliverable. The "
        "graded output explodes the histogram to one (doc_id, bin_idx, "
        "value) row per bin: scalar columns only, so the driver's "
        "order-insensitive canonicalizer can sort/hash them (an "
        "array<double> column is unhashable in pandas — CORRECTNESS_r02)."
    ),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from currency_etl_spark.sources import spread

    # spread: an under-split local scan would run the Arrow decode on one
    # core; production-scale scans have enough splits that this is a no-op
    # (coarse sibling of size_balanced, which targets byte-skew instead)
    blobs = spread(attach_blob(table(spark, sf_dir, "documents")).select("doc_id", "blob"))
    feats = extract_features(blobs)
    return feats.select("doc_id", F.posexplode("features").alias("bin_idx", "value")).select(
        "doc_id", F.col("bin_idx").cast("long").alias("bin_idx"), "value"
    )


@register(
    "multimodal_dedup_assets",
    oracle="""
        WITH addressed AS (
            SELECT doc_id, md5(text) AS checksum,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        )
        SELECT checksum,
               CAST(count(*) AS BIGINT) AS n_copies,
               min(doc_id) AS canonical_doc,
               CAST((count(*) - 1) * min(n_bytes) AS BIGINT) AS wasted_bytes
        FROM addressed
        GROUP BY checksum
        ORDER BY checksum
    """,
    tags=("llm", "multimodal", "dedup"),
    doc=(
        "Content-addressed asset dedup — the multimodal twin of dedup_exact "
        "and the storage layout every large asset lake uses: group blobs by "
        "their checksum (already carried in the metadata struct), elect the "
        "lowest doc_id as canonical, and report each address's copy count "
        "and the bytes reclaimable by deduplication (downstream keeps only "
        "canonical_doc per address). Only (checksum, doc_id, n_bytes) cross "
        "the wire — 48 bytes per asset whatever the asset size, and the "
        "blob column never leaves the scan (pruned; same property "
        "plan-asserted for meta_stats). Copies of one checksum share a "
        "byte size by construction, so min(n_bytes) is exact."
    ),
)
def multimodal_dedup_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = attach_blob(table(spark, sf_dir, "documents"))
    return (
        blobs.select(
            "doc_id",
            F.col("meta.checksum").alias("checksum"),
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("checksum")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc"),
            ((F.count("*") - 1) * F.min("n_bytes")).cast("long").alias("wasted_bytes"),
        )
        .orderBy("checksum")
    )


def _phash_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized (doc_id, phash, checksum) fingerprint relation — ONE
    Arrow pass over the blob column per session per (sf_dir), shared by
    multimodal_phash_dedup (exact-bucket grouping) and
    multimodal_phash_near (Hamming-1 multiprobe): the stored fingerprint
    index of a production near-dup stage. spread: under-split local
    scans would run the Arrow pass on one core (same rationale as
    multimodal_features)."""
    from currency_etl_spark.operators.ckpt import memo_checkpoint

    return memo_checkpoint(
        "phash_base", sf_dir, lambda: _phash_build(spark, sf_dir)
    )


def _phash_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-materialized fingerprint pipeline — split out so the plan
    test can assert its single-Arrow-pass / pruned-scan properties (the
    entries themselves plan as ExistingRDD reads of the checkpoint)."""
    from currency_etl_spark.operators.multimodal import perceptual_hash
    from currency_etl_spark.sources import spread

    blobs = spread(
        attach_blob(table(spark, sf_dir, "documents")).select("doc_id", "blob")
    )
    return perceptual_hash(blobs)


@register(
    "multimodal_phash_dedup",
    oracle="""
        -- DuckDB twin of the codec-free pHash stand-in (cyclic gradient
        -- hash over the 16-bin byte histogram; operators/multimodal.py
        -- _gradient_hash): integer count comparisons + bit shifts only,
        -- so both engines agree exactly. Corpus text is pure ASCII
        -- (octet_length == length at every SF), so ord() over character
        -- positions IS the byte value — same device as the
        -- multimodal_features oracle.
        WITH d AS (
            SELECT doc_id, text, md5(text) AS checksum,
                   octet_length(encode(text)) AS total
            FROM documents
        ),
        pos AS (
            SELECT doc_id, text, unnest(generate_series(1, total)) AS i
            FROM d
        ),
        counts AS (
            SELECT doc_id, ord(substring(text, i, 1)) % 16 AS bin, count(*) AS c
            FROM pos GROUP BY doc_id, ord(substring(text, i, 1)) % 16
        ),
        grid AS (
            SELECT d.doc_id, g.bin
            FROM d, (SELECT unnest(generate_series(0, 15)) AS bin) g
        ),
        dense AS (
            SELECT g.doc_id, g.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c
            FROM grid g
            LEFT JOIN counts c ON c.doc_id = g.doc_id AND c.bin = g.bin
        ),
        ph AS (
            SELECT a.doc_id,
                   CAST(coalesce(sum(CASE WHEN a.c > b.c
                        THEN (CAST(1 AS BIGINT) << a.bin) END), 0) AS BIGINT)
                       AS phash
            FROM dense a
            JOIN dense b ON b.doc_id = a.doc_id AND b.bin = (a.bin + 1) % 16
            GROUP BY a.doc_id
        )
        SELECT ph.phash,
               count(*) AS n_assets,
               count(DISTINCT d.checksum) AS n_payloads,
               min(ph.doc_id) AS canonical_doc
        FROM ph JOIN d ON d.doc_id = ph.doc_id
        GROUP BY ph.phash
        ORDER BY ph.phash
    """,
    tags=("llm", "multimodal", "dedup", "pandas-udf"),
    doc=(
        "Perceptual near-dup detection — the missing third rung of the "
        "multimodal dedup ladder: checksum dedup (multimodal_dedup_assets) "
        "catches byte-identical copies only; this entry fingerprints each "
        "blob with a pHash-family perceptual hash and groups assets whose "
        "CONTENT is near-identical even when bytes differ (re-encoded, "
        "metadata-stripped, lightly perturbed copies — the dominant "
        "duplicate class in scraped image corpora). Real codec path is "
        "the stubbed DCT pHash (operators/multimodal.py:phash_image); the "
        "graded stand-in is the cyclic gradient hash over the byte "
        "histogram, bit-for-bit mirrored by the oracle. Per phash "
        "cluster: asset count, DISTINCT payload count (n_payloads > 1 = "
        "true near-dups, invisible to checksum dedup), canonical "
        "(min-doc_id) survivor. Scale shape: fingerprint + checksum come "
        "out of ONE Arrow mapInPandas pass over the blob column (no "
        "second blob scan, no join back — PHASH_SCHEMA carries both), "
        "then everything downstream is a 24-byte-per-asset groupBy on a "
        "64-bit key — no all-pairs comparison anywhere, the same "
        "bucket-don't-compare discipline as dedup_minhash_lsh. Hamming-"
        "neighbor probing (17 bucket probes per asset, as in "
        "knn_lsh_multiprobe) is the documented extension for radius-1 "
        "matches."
    ),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ph = _phash_base(spark, sf_dir)
    return (
        ph.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.countDistinct("checksum").alias("n_payloads"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .orderBy("phash")
    )


@register(
    "multimodal_phash_near",
    oracle="""
        -- same phash CTE chain as multimodal_phash_dedup (cyclic
        -- gradient hash over the 16-bin byte histogram — integer-exact
        -- in both engines), extended with the Hamming-1 multiprobe:
        -- every asset probes 17 buckets (its own hash + each single-bit
        -- flip), so an equi-join on the bucket key finds every neighbor
        -- at Hamming distance <= 1 without any all-pairs comparison.
        WITH d AS (
            SELECT doc_id, text,
                   octet_length(encode(text)) AS total
            FROM documents
        ),
        pos AS (
            SELECT doc_id, text, unnest(generate_series(1, total)) AS i
            FROM d
        ),
        counts AS (
            SELECT doc_id, ord(substring(text, i, 1)) % 16 AS bin, count(*) AS c
            FROM pos GROUP BY doc_id, ord(substring(text, i, 1)) % 16
        ),
        grid AS (
            SELECT d.doc_id, g.bin
            FROM d, (SELECT unnest(generate_series(0, 15)) AS bin) g
        ),
        dense AS (
            SELECT g.doc_id, g.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c
            FROM grid g
            LEFT JOIN counts c ON c.doc_id = g.doc_id AND c.bin = g.bin
        ),
        ph AS (
            SELECT a.doc_id,
                   CAST(coalesce(sum(CASE WHEN a.c > b.c
                        THEN (CAST(1 AS BIGINT) << a.bin) END), 0) AS BIGINT)
                       AS phash
            FROM dense a
            JOIN dense b ON b.doc_id = a.doc_id AND b.bin = (a.bin + 1) % 16
            GROUP BY a.doc_id
        ),
        probes AS (
            SELECT doc_id, phash,
                   CASE WHEN f.i = 16 THEN phash
                        ELSE xor(phash, CAST(1 AS BIGINT) << f.i) END AS probe
            FROM ph, (SELECT unnest(generate_series(0, 16)) AS i) f
        ),
        pairs AS (
            SELECT p.doc_id, p.phash, b.doc_id AS nbr_id, b.phash AS nbr_hash
            FROM probes p
            JOIN ph b ON b.phash = p.probe AND b.doc_id <> p.doc_id
        ),
        deg AS (
            SELECT ph.doc_id,
                   CAST(count(pairs.nbr_id) AS BIGINT) AS n_near,
                   CAST(count(*) FILTER (pairs.nbr_hash = ph.phash) AS BIGINT)
                       AS n_exact
            FROM ph LEFT JOIN pairs ON pairs.doc_id = ph.doc_id
            GROUP BY ph.doc_id
        )
        SELECT n_near,
               count(*) AS n_docs,
               count(*) FILTER (n_exact > 0) AS n_with_exact
        FROM deg
        GROUP BY n_near
        ORDER BY n_near
    """,
    tags=("llm", "multimodal", "dedup", "multiprobe", "pandas-udf"),
    doc=(
        "Radius-1 perceptual near-dup audit — the Hamming-multiprobe rung "
        "above multimodal_phash_dedup's exact-bucket grouping: a lightly "
        "perturbed copy whose fingerprint differs by ONE bit lands in a "
        "different phash bucket and is invisible to the exact groupBy; "
        "this entry catches it with the knn_lsh_multiprobe device — every "
        "asset probes 17 buckets (its own 16-bit hash plus each single-"
        "bit flip), an equi-join on the probed bucket key finds every "
        "neighbor at Hamming distance <= 1, and the per-asset neighbor "
        "degree rolls up into a near-dup degree histogram (n_near -> how "
        "many assets, and how many of those also have an exact-hash "
        "twin). Scale shape: ONE Arrow blob pass (perceptual_hash, "
        "checkpointed so the probe fanout and the bucket side share it), "
        "a bounded 17x fanout of 16-byte rows, hash equi-joins only — "
        "never an all-pairs comparison, the same bucket-don't-compare "
        "discipline as dedup_minhash_lsh. Real codec path swaps in via "
        "operators/multimodal.py:phash_image exactly as documented there."
    ),
)
def multimodal_phash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the memoized fingerprint index (one Arrow blob pass, shared with
    # multimodal_phash_dedup); the probe fanout and the bucket
    # (neighbor) side both read the same materialization
    ph = _phash_base(spark, sf_dir).select("doc_id", "phash")
    probes = ph.select(
        "doc_id",
        "phash",
        F.explode(hamming1_probes("phash")).alias("probe"),
    )
    nbrs = ph.select(F.col("doc_id").alias("nbr_id"), F.col("phash").alias("nbr_hash"))
    pairs = probes.join(nbrs, probes["probe"] == nbrs["nbr_hash"]).filter(
        F.col("doc_id") != F.col("nbr_id")
    )
    agg = pairs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_near"),
        F.sum((F.col("nbr_hash") == F.col("phash")).cast("long")).alias("n_exact"),
    )
    deg = (
        ph.select("doc_id")
        .join(agg, "doc_id", "left")
        .fillna({"n_near": 0, "n_exact": 0})
    )
    return (
        deg.groupBy("n_near")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_exact") > 0).cast("long")).alias("n_with_exact"),
        )
        .orderBy("n_near")
    )


#: Per-language storage budget for the quota audit, as a rational share
#: (4/10 = keep the largest assets until 40% of the language's bytes).
#: Integer cross-multiplication keeps the cut exact in both engines.
QUOTA_NUM, QUOTA_DEN = 4, 10


@register(
    "multimodal_storage_quota",
    oracle=f"""
        WITH assets AS (
            SELECT doc_id, lang,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, lang, n_bytes,
                   sum(n_bytes) OVER (PARTITION BY lang
                                      ORDER BY n_bytes DESC, doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum_bytes,
                   sum(n_bytes) OVER (PARTITION BY lang) AS total_bytes
            FROM assets
        )
        SELECT lang,
               count(*) AS n_assets,
               CAST(max(total_bytes) AS BIGINT) AS total_bytes,
               count(*) FILTER (cum_bytes * {QUOTA_DEN}
                                <= total_bytes * {QUOTA_NUM}) AS n_kept,
               CAST(coalesce(sum(n_bytes) FILTER (cum_bytes * {QUOTA_DEN}
                                <= total_bytes * {QUOTA_NUM}), 0) AS BIGINT)
                   AS kept_bytes,
               round(CAST(coalesce(sum(n_bytes) FILTER (cum_bytes * {QUOTA_DEN}
                                <= total_bytes * {QUOTA_NUM}), 0) AS DOUBLE)
                     / max(total_bytes), 6) AS kept_share
        FROM ranked
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("llm", "multimodal", "quota", "window"),
    doc=(
        "Storage-quota curation audit: per language, greedily keep the "
        "LARGEST assets while the running total stays within 40% of the "
        "language's bytes — the tiering/retention dry-run a multimodal "
        "lake runs before demoting blobs to cold storage (largest-first "
        "keeps the fewest, most valuable decode targets hot; the "
        "byte-budget twin of docs_domain_cap's doc-count quota). The "
        "blob column never loads — only metadata byte counts flow; the "
        "cumulative window partitions per language; the budget cut is "
        "integer cross-multiplication (cum*10 <= total*4), never a "
        "float threshold, so both engines cut identically. At 100 TB "
        "this runs on the asset-catalog table, not the blobs."
    ),
)
def multimodal_storage_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    assets = docs.select(
        "doc_id", "lang", F.octet_length("text").cast("long").alias("n_bytes")
    )
    w_order = (
        W.partitionBy("lang")
        .orderBy(F.desc("n_bytes"), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = assets.select(
        "lang",
        "n_bytes",
        F.sum("n_bytes").over(w_order).alias("cum_bytes"),
        F.sum("n_bytes").over(W.partitionBy("lang")).alias("total_bytes"),
    )
    kept = F.col("cum_bytes") * QUOTA_DEN <= F.col("total_bytes") * QUOTA_NUM
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.max("total_bytes").alias("total_bytes"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("n_bytes"))), F.lit(0)).alias(
                "kept_bytes"
            ),
            F.round(
                F.coalesce(F.sum(F.when(kept, F.col("n_bytes"))), F.lit(0)).cast(
                    "double"
                )
                / F.max("total_bytes"),
                6,
            ).alias("kept_share"),
        )
        .orderBy("lang")
    )


@register(
    "multimodal_asset_gc",
    oracle="""
        WITH addressed AS (
            SELECT doc_id, md5(text) AS checksum,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        ),
        g AS (
            SELECT checksum,
                   CAST(count(*) AS BIGINT) AS n_refs,
                   CAST(sum(CASE WHEN doc_id % 10 <> 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_live_refs,
                   min(CASE WHEN doc_id % 10 <> 3 THEN doc_id END)
                       AS canon,
                   min(n_bytes) AS n_bytes
            FROM addressed
            GROUP BY checksum
        )
        SELECT checksum, n_refs, n_live_refs,
               COALESCE(canon, -1) AS canonical_doc,
               (n_live_refs = 0) AS collected,
               n_bytes,
               CAST(n_refs * n_bytes
                    - CASE WHEN n_live_refs = 0 THEN 0 ELSE n_bytes END
                    AS BIGINT) AS bytes_reclaimed
        FROM g
        ORDER BY checksum
    """,
    tags=("llm", "multimodal", "dedup", "action"),
    doc=(
        "Asset-store garbage collection — the ACTION "
        "multimodal_dedup_assets plans and the multimodal DELETE verb "
        "(the family mirror of knn_index_compact / text_index_compact): "
        "the raw lake (one blob per document) rewrites to a "
        "content-addressed store holding ONE blob per checksum that "
        "still has a LIVE reference, where the deleted slice is the "
        "repo's shared tombstone cohort (doc_id % 10 = 3 — the same "
        "slice the index families tombstone and the erasure cascade "
        "audits). Per address: total and LIVE reference counts, the "
        "canonical surviving document (lowest live doc_id; -1 when the "
        "address collected — never a silent NULL), the collected flag "
        "(the last live reference died, the blob itself is garbage), "
        "the per-copy byte size (copies of one checksum share it by "
        "construction), and the exact bytes the rewrite reclaims "
        "(every raw copy minus the single surviving store blob; a "
        "collected address reclaims all of them). Scale shape: GC runs "
        "at METADATA speed — only (doc_id, checksum, n_bytes) cross "
        "the wire, 48 bytes per asset whatever the asset size, one "
        "checksum-keyed shuffle with map-side combine, and the blob "
        "column never leaves the scan (the meta_stats pruning "
        "property); the physical rewrite a production store performs "
        "from this relation is a partitioned-by-address copy of "
        "surviving blobs, exactly knn_index_compact's write-back "
        "shape. Every output is an exact integer."
    ),
)
def multimodal_asset_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = attach_blob(table(spark, sf_dir, "documents"))
    live = F.col("doc_id") % 10 != 3
    g = (
        blobs.select(
            "doc_id",
            F.col("meta.checksum").alias("checksum"),
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("checksum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_refs"),
            F.sum(live.cast("long")).cast("long").alias("n_live_refs"),
            F.min(F.when(live, F.col("doc_id"))).alias("canon"),
            F.min("n_bytes").alias("n_bytes"),
        )
    )
    collected = F.col("n_live_refs") == 0
    return g.select(
        "checksum",
        "n_refs",
        "n_live_refs",
        F.coalesce("canon", F.lit(-1)).cast("long").alias("canonical_doc"),
        collected.alias("collected"),
        "n_bytes",
        (
            F.col("n_refs") * F.col("n_bytes")
            - F.when(collected, F.lit(0)).otherwise(F.col("n_bytes"))
        )
        .cast("long")
        .alias("bytes_reclaimed"),
    ).orderBy("checksum")

#: The gradient-phash CTE chain shared by the two index-lifecycle
#: oracles below (the same chain multimodal_phash_dedup /
#: multimodal_phash_near inline verbatim — kept as one constant here so
#: a third and fourth copy don't drift; ``ph`` is (doc_id, phash) and
#: ``d`` additionally carries the md5 checksum for payload counting).
_PH_SQL = """
        d AS (
            SELECT doc_id, text, md5(text) AS checksum,
                   octet_length(encode(text)) AS total
            FROM documents
        ),
        pos AS (
            SELECT doc_id, text, unnest(generate_series(1, total)) AS i
            FROM d
        ),
        counts AS (
            SELECT doc_id, ord(substring(text, i, 1)) % 16 AS bin, count(*) AS c
            FROM pos GROUP BY doc_id, ord(substring(text, i, 1)) % 16
        ),
        grid AS (
            SELECT d.doc_id, g.bin
            FROM d, (SELECT unnest(generate_series(0, 15)) AS bin) g
        ),
        dense AS (
            SELECT g.doc_id, g.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c
            FROM grid g
            LEFT JOIN counts c ON c.doc_id = g.doc_id AND c.bin = g.bin
        ),
        ph AS (
            SELECT a.doc_id,
                   CAST(coalesce(sum(CASE WHEN a.c > b.c
                        THEN (CAST(1 AS BIGINT) << a.bin) END), 0) AS BIGINT)
                       AS phash
            FROM dense a
            JOIN dense b ON b.doc_id = a.doc_id AND b.bin = (a.bin + 1) % 16
            GROUP BY a.doc_id
        )"""


@register(
    "multimodal_phash_staleness",
    oracle=f"""
        WITH {_PH_SQL},
        stored AS (SELECT * FROM ph WHERE doc_id % 10 <> 7),
        batch AS (SELECT * FROM ph WHERE doc_id % 10 = 7),
        sb AS (SELECT DISTINCT phash FROM stored),
        probes AS (
            SELECT b.doc_id, b.phash,
                   CASE WHEN f.i = 16 THEN b.phash
                        ELSE xor(b.phash, CAST(1 AS BIGINT) << f.i) END AS probe
            FROM batch b, (SELECT unnest(generate_series(0, 16)) AS i) f
        ),
        per AS (
            SELECT p.doc_id,
                   max(CASE WHEN sb.phash IS NOT NULL AND p.probe = p.phash
                            THEN 1 ELSE 0 END) AS hit,
                   max(CASE WHEN sb.phash IS NOT NULL THEN 1 ELSE 0 END)
                       AS any_hit
            FROM probes p LEFT JOIN sb ON sb.phash = p.probe
            GROUP BY p.doc_id
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS nb,
                   CAST(sum(hit) AS BIGINT) AS h,
                   CAST(sum(any_hit) AS BIGINT) AS ah
            FROM per
        ),
        sc AS (
            SELECT CAST(count(*) AS BIGINT) AS n_index_assets,
                   CAST(count(DISTINCT phash) AS BIGINT) AS index_buckets
            FROM stored
        ),
        bc AS (
            SELECT CAST(count(DISTINCT phash) AS BIGINT) AS batch_buckets
            FROM batch
        )
        SELECT sc.n_index_assets,
               sc.index_buckets,
               s.nb AS n_batch_assets,
               bc.batch_buckets,
               s.h AS hit_assets,
               s.ah - s.h AS rescued_assets,
               s.nb - s.ah AS novel_assets,
               round(CAST(s.nb - s.h AS DOUBLE) / s.nb, 6) AS exact_miss_share,
               round(CAST(s.nb - s.ah AS DOUBLE) / s.nb, 6) AS novel_share,
               ((s.nb - s.h) * 2 > s.nb OR (s.nb - s.ah) * 4 > s.nb) AS rebuild
        FROM s, sc, bc
    """,
    tags=("llm", "multimodal", "dedup", "index", "incremental", "eval"),
    doc=(
        "Perceptual-index staleness audit — the multimodal rung of the "
        "decision layer text_index_staleness and knn_index_staleness "
        "give their modalities, completing the screen → staleness → "
        "rewrite verb set for the third (perceptual) index family: the "
        "ARRIVING asset slice (doc_id % 10 = 7, the shared maintenance "
        "batch) is fingerprinted and held against the STORED bucket "
        "index (the old-slice rows of the memoized phash_base "
        "checkpoint — the same frozen artifact streaming_phash_screen "
        "serves from), and the audit reports how the bucket structure "
        "is eroding: per arriving asset, does its EXACT phash bucket "
        "exist in the index (hit — the cheap groupBy layer still "
        "catches it), does only a Hamming-1 flip probe land (rescued — "
        "the 17x multiprobe is compensating, at 17x the join fanout), "
        "or does nothing land (novel — invisible even to radius-1 "
        "probing)? One summary row: index/batch asset and bucket "
        "counts, the hit/rescued/novel split, the exact-miss and "
        "novel shares, and the integer-exact rebuild flag — retrain "
        "when the exact layer misses over half the arrivals "
        "((nb-h)*2 > nb) or radius-1 probing misses over a quarter "
        "((nb-ah)*4 > nb); cross-multiplication, never a float "
        "threshold. The screen answers per-asset 'is this a dup'; "
        "this audit answers the MAINTENANCE question 'is the stored "
        "bucket index still shaped like the traffic' — exactly the "
        "division of labor between streaming_knn_screen and "
        "knn_index_staleness. Cross-entry pin: hit+rescued == the "
        "screen's n_candidates>0 count (same probes, same stored "
        "side). Scale shape: both sides read the ONE memoized Arrow "
        "fingerprint pass (zero parquet scans in the final plan — "
        "plan-pinned), the probe fanout is a bounded 17x of 16-byte "
        "rows, and everything downstream is hash equi-joins and "
        "map-side-combinable counts over 64-bit keys; at 100 TB the "
        "audit costs one distinct over the stored index plus "
        "17·|batch| probe rows — no pairs, no blob bytes past the "
        "scan."
    ),
)
def multimodal_phash_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from currency_etl_spark.queries.multimodal import _phash_base

    ph = _phash_base(spark, sf_dir).select("doc_id", "phash")
    stored = ph.filter(F.col("doc_id") % 10 != 7)
    batch = ph.filter(F.col("doc_id") % 10 == 7)
    sb = stored.select("phash").distinct().withColumnRenamed("phash", "sbk")
    probes = batch.select(
        "doc_id", "phash", F.explode(hamming1_probes("phash")).alias("probe")
    )
    per = (
        probes.join(sb, probes["probe"] == sb["sbk"], "left")
        .groupBy("doc_id")
        .agg(
            F.max(
                (F.col("sbk").isNotNull() & (F.col("probe") == F.col("phash")))
                .cast("long")
            ).alias("hit"),
            F.max(F.col("sbk").isNotNull().cast("long")).alias("any_hit"),
        )
    )
    s = per.agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("hit").cast("long").alias("h"),
        F.sum("any_hit").cast("long").alias("ah"),
    )
    sc = stored.agg(
        F.count(F.lit(1)).cast("long").alias("n_index_assets"),
        F.countDistinct("phash").alias("index_buckets"),
    )
    bc = batch.agg(F.countDistinct("phash").alias("batch_buckets"))
    return (
        s.crossJoin(F.broadcast(sc))
        .crossJoin(F.broadcast(bc))
        .select(
            "n_index_assets",
            "index_buckets",
            F.col("nb").alias("n_batch_assets"),
            "batch_buckets",
            F.col("h").alias("hit_assets"),
            (F.col("ah") - F.col("h")).alias("rescued_assets"),
            (F.col("nb") - F.col("ah")).alias("novel_assets"),
            F.round(
                (F.col("nb") - F.col("h")).cast("double") / F.col("nb"), 6
            ).alias("exact_miss_share"),
            F.round(
                (F.col("nb") - F.col("ah")).cast("double") / F.col("nb"), 6
            ).alias("novel_share"),
            (
                ((F.col("nb") - F.col("h")) * 2 > F.col("nb"))
                | ((F.col("nb") - F.col("ah")) * 4 > F.col("nb"))
            ).alias("rebuild"),
        )
    )


@register(
    "multimodal_phash_rebuild",
    oracle=f"""
        WITH {_PH_SQL},
        ph2 AS (
            SELECT ph.doc_id, ph.phash, d.checksum
            FROM ph JOIN d ON d.doc_id = ph.doc_id
        ),
        g AS (
            SELECT phash,
                   CAST(sum(CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_removed,
                   CAST(sum(CASE WHEN doc_id % 10 <> 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_live,
                   min(CASE WHEN doc_id % 10 <> 3 THEN doc_id END) AS canon,
                   CAST(count(DISTINCT CASE WHEN doc_id % 10 <> 3
                                            THEN checksum END)
                        AS BIGINT) AS n_payloads_live
            FROM ph2 GROUP BY phash
        )
        SELECT phash, n_removed, n_live,
               COALESCE(canon, -1) AS canonical_doc,
               n_payloads_live,
               (n_live = 0) AS bucket_dropped
        FROM g
        WHERE n_removed > 0
        ORDER BY phash
    """,
    tags=("llm", "multimodal", "dedup", "index", "action"),
    doc=(
        "Perceptual-index rewrite — the ACTION the staleness audit and "
        "the tombstone cohort decide on, giving the phash family the "
        "same delete-rewrite verb the other two index modalities have "
        "(knn_index_compact / text_index_compact; same shared tombstone "
        "slice, doc_id % 10 = 3 — the cohort multimodal_asset_gc "
        "collects and the erasure cascade audits): every bucket PAGE "
        "the deletion touches is rewritten from the stored fingerprint "
        "index by masking the tombstoned members and re-deriving the "
        "page stats — removed/live member counts, the new canonical "
        "(min live doc_id; -1 when the bucket dropped, never a silent "
        "NULL), the live DISTINCT-payload count (the n_payloads "
        "semantics of multimodal_phash_dedup, post-delete), and the "
        "dropped flag (last member died — the bucket leaves the "
        "index). THE ORACLE IS THE CONTRACT: the Spark side rewrites "
        "pages by masking the ONE memoized fingerprint checkpoint "
        "(zero parquet scans in the final plan, zero blob re-decodes — "
        "deletion is METADATA-speed, the asset_gc property), while the "
        "DuckDB side re-derives the same pages from a from-scratch "
        "REBUILD over the survivors; the driver's exact hash compare "
        "is the deletion-equals-rebuild proof, the invariant every "
        "index maintainer must hold (the knn_index_compact / "
        "customers_erasure_execute contract). Untouched buckets are "
        "not emitted (the touched-page convention of "
        "text_index_merge); a cross-entry test pins every untouched "
        "bucket's census row to multimodal_phash_dedup's. Scale "
        "shape: one groupBy over 24-byte fingerprint rows with "
        "map-side combine — no pairs, no blob bytes, output bounded "
        "by the touched-bucket count."
    ),
)
def multimodal_phash_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    from currency_etl_spark.queries.multimodal import _phash_base

    ph = _phash_base(spark, sf_dir)
    tomb = F.col("doc_id") % 10 == 3
    g = ph.groupBy("phash").agg(
        F.sum(tomb.cast("long")).cast("long").alias("n_removed"),
        F.sum((~tomb).cast("long")).cast("long").alias("n_live"),
        F.min(F.when(~tomb, F.col("doc_id"))).alias("canon"),
        F.countDistinct(F.when(~tomb, F.col("checksum"))).alias(
            "n_payloads_live"
        ),
    )
    return (
        g.filter(F.col("n_removed") > 0)
        .select(
            "phash",
            "n_removed",
            "n_live",
            F.coalesce("canon", F.lit(-1)).cast("long").alias("canonical_doc"),
            "n_payloads_live",
            (F.col("n_live") == 0).alias("bucket_dropped"),
        )
        .orderBy("phash")
    )
