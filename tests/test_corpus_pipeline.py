"""End-to-end training-corpus pipeline: funnel counts, dedup canonicality,
lang partitioning on disk, sampling determinism, and rerun stability."""

from __future__ import annotations

import glob

import pytest

from currency_etl_spark.corpus_pipeline import build_training_corpus


def test_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    stats = build_training_corpus(spark, sf_dir, out, langs=("en", "de", "fr"))
    # funnel is monotonically non-increasing
    assert (
        stats.n_input
        >= stats.n_after_quality
        >= stats.n_after_dedup
        >= stats.n_after_lang
        >= stats.n_final
        > 0
    )
    assert stats.total_tokens > 0
    # lang-partitioned layout on disk
    parts = sorted(p.split("lang=")[-1] for p in glob.glob(f"{out}/lang=*"))
    assert set(parts).issubset({"en", "de", "fr"}) and parts

    df = spark.read.parquet(out)
    assert df.count() == stats.n_final
    assert df.select("doc_id").distinct().count() == stats.n_final  # no dups survived


def test_corpus_pipeline_rerun_identical(spark, sf_dir, tmp_path):
    out1, out2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    s1 = build_training_corpus(spark, sf_dir, out1)
    s2 = build_training_corpus(spark, sf_dir, out2)
    assert s1 == s2
    a = sorted(r["doc_id"] for r in spark.read.parquet(out1).collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(out2).collect())
    assert a == b  # fully deterministic selection


def test_corpus_pipeline_sampling(spark, sf_dir, tmp_path):
    full = build_training_corpus(spark, sf_dir, str(tmp_path / "full"))
    sampled = build_training_corpus(
        spark, sf_dir, str(tmp_path / "samp"), sample_mod=3
    )
    assert 0 < sampled.n_final < full.n_final
    # sampled set is a subset of the full set (stable hash selection)
    f = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "full")).collect()}
    s = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "samp")).collect()}
    assert s <= f


def test_corpus_pipeline_quality_gates(spark, sf_dir, tmp_path):
    base = build_training_corpus(spark, sf_dir, str(tmp_path / "base"))
    gated = build_training_corpus(
        spark, sf_dir, str(tmp_path / "gated"), max_rep_ratio=0.5, scrub_pii=True
    )
    # the repetition gate can only shrink the funnel
    assert gated.n_after_quality <= base.n_after_quality
    assert gated.n_final <= base.n_final
    # scrubbed output contains no long digit runs or emails
    import re

    texts = [r["text"] for r in spark.read.parquet(str(tmp_path / "gated")).collect()]
    assert texts
    for tx in texts[:200]:
        assert not re.search(r"[0-9]{6,}", tx)
        assert not re.search(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", tx)
