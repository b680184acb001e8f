"""End-to-end training-corpus pipeline: the north-star use case
(BASELINE.json) composed from the engine's operator families as ONE lazy
plan per stage, writing a partitioned corpus + a stats report.

Stages (each a catalog-tested operator family):
  1. quality gate + normalization       (docs_clean_corpus semantics),
     optionally including the duplicate-3-gram repetition gate
     (docs_repetition_score semantics, max_rep_ratio)
  2. optional PII scrub                  (docs_pii_scrub patterns — mask
     emails/long digit runs in the surviving text)
  3. near-dup clustering + canonical pick (dedup_minhash_lsh → components →
     keep the lowest doc_id per cluster)
  4. language allow-list filter          (lang_id family)
  5. deterministic token-budget sampling (content-hash modulus, stable
     across runs/engines/cluster sizes — docs_deterministic_sample)
  6. partitioned write (lang) + one-pass profile of the result

Scale: stages communicate by DataFrame lineage (no intermediate
materialization except the clustering fixpoint); every shuffle carries
digests/ids, never text; the output is lang-partitioned so downstream
training jobs prune to their language mix.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_spark.queries.llm_ops import dedup_clusters
from currency_etl_spark.sources import table


@dataclass
class CorpusStats:
    n_input: int
    n_after_quality: int
    n_after_dedup: int
    n_after_lang: int
    n_final: int
    total_tokens: int


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    langs: tuple[str, ...] = ("en", "de", "fr"),
    min_tokens: int = 10,
    max_tokens: int = 2000,
    sample_mod: int = 1,  # keep 1/sample_mod of eligible docs (1 = all)
    max_rep_ratio: float | None = None,  # drop docs above this duplicate-
    # 3-gram ratio (docs_repetition_score semantics); None = no gate
    scrub_pii: bool = False,  # mask emails/long digit runs in the output
) -> CorpusStats:
    docs = table(spark, sf_dir, "documents")
    n_input = docs.count()

    t = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(t).cast("long").alias("n_tokens"),
    )
    quality = scored.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)
    )
    if max_rep_ratio is not None:
        from currency_etl_spark.queries.llm_ops import _shingles

        shl = _shingles(F.split(F.col("text"), " "))
        nsh = F.size(shl)
        rep = F.when(nsh == 0, F.lit(0.0)).otherwise(
            (nsh - F.size(F.array_distinct(shl))) / nsh.cast("double")
        )
        quality = quality.filter(rep <= max_rep_ratio)
    if scrub_pii:
        from currency_etl_spark.queries.llm_ops import PII_EMAIL, PII_LONGNUM

        quality = quality.withColumn(
            "text",
            F.regexp_replace(
                F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
                PII_LONGNUM,
                "<NUM>",
            ),
        )
    n_quality = quality.count()

    # near-dup clusters over the LSH candidate graph; docs absent from the
    # graph are their own cluster. Keep the lowest doc_id per cluster.
    clusters = dedup_clusters(spark, sf_dir)  # (doc_id, cluster_id)
    labeled = quality.join(clusters, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("doc_id"))
    )
    keep = labeled.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    deduped = labeled.join(keep.select("doc_id"), "doc_id", "left_semi")
    n_dedup = deduped.count()

    lang_kept = deduped.filter(F.col("lang").isin(*langs))
    n_lang = lang_kept.count()

    sampled = lang_kept.filter(
        (F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("long") % sample_mod) == 0
    ) if sample_mod > 1 else lang_kept

    (
        sampled.select("doc_id", "lang", "source", "n_tokens", "text")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out_path)
    )

    out = spark.read.parquet(out_path)
    agg = out.agg(
        F.count("*").alias("n"), F.sum("n_tokens").cast("long").alias("tok")
    ).collect()[0]
    return CorpusStats(
        n_input=n_input,
        n_after_quality=n_quality,
        n_after_dedup=n_dedup,
        n_after_lang=n_lang,
        n_final=agg["n"],
        total_tokens=agg["tok"],
    )
