"""Dedup family under HIGH duplication: the driver corpus is mostly
unique, so the dedup entries usually see sparse candidate sets. A real
crawl snapshot is the opposite — here every document has an exact twin
(doc_id shifted by an offset), which saturates every LSH bucket with
pairs and exercises the cap/pair-gen machinery under load it never sees
on the graded corpus.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.sources import table

CATALOG = load_catalog()

OFFSET = 1_000_000


@pytest.fixture(scope="module")
def twin_dir(tmp_path_factory, spark, sf_dir):
    d = tmp_path_factory.mktemp("twin_corpus")
    docs = table(spark, sf_dir, "documents")
    twins = docs.withColumn("doc_id", F.col("doc_id") + OFFSET)
    docs.unionByName(twins).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_exact_dedup_finds_every_twin(spark, twin_dir, sf_dir):
    con = duckdb.connect()
    n_unique = con.sql(
        f"SELECT count(DISTINCT md5(lower(trim(text)))) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    rows = CATALOG["dedup_exact"].spark_fn(spark, twin_dir).collect()
    # one group per distinct text, every group an even copy count >= 2
    assert len(rows) == n_unique
    assert all(r.n_copies >= 2 and r.n_copies % 2 == 0 for r in rows)
    # the kept doc is always an original (originals have the lower ids)
    assert all(r.kept_doc_id < OFFSET for r in rows)


def test_lsh_pairs_include_every_twin_pair(spark, twin_dir):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in CATALOG["dedup_minhash_lsh"].spark_fn(spark, twin_dir).collect()
    }
    originals = {
        r.doc_id
        for r in CATALOG["dedup_minhash_lsh"]
        .spark_fn(spark, twin_dir)
        .sparkSession.read.parquet(f"{twin_dir}/documents.parquet")
        .filter(F.col("doc_id") < OFFSET)
        .select("doc_id")
        .collect()
    }
    # identical texts share all 16 minhashes → all 4 bands → must pair,
    # UNLESS the shared bucket overflowed the df-cap (drop is the designed
    # behavior; assert the overwhelming majority survived)
    missing = [i for i in originals if (i, i + OFFSET) not in pairs]
    assert len(missing) <= len(originals) // 20, missing[:10]


def test_clusters_group_twins_together(spark, twin_dir):
    labels = {
        r.doc_id: r.cluster_id
        for r in CATALOG["dedup_clusters"].spark_fn(spark, twin_dir).collect()
    }
    joined = 0
    for i, c in labels.items():
        if i < OFFSET and (i + OFFSET) in labels:
            if labels[i + OFFSET] == c:
                joined += 1
    # every twin pair that survived candidate generation must share a label
    assert joined > 0
    pairs = {
        (r.doc_a, r.doc_b)
        for r in CATALOG["dedup_minhash_lsh"].spark_fn(spark, twin_dir).collect()
    }
    for a, b in pairs:
        assert labels.get(a) is not None and labels.get(b) is not None
        assert labels[a] == labels[b], (a, b)
