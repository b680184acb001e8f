"""dedup_canonical invariants: the synthetic corpus has no formatting
variants (its canonical groups are singletons — asserted), so the merge
behavior is demonstrated on synthesized case/punctuation/digit variants
run through the same registered builder, plus a Spark-vs-Python regex
parity check on edge inputs."""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from currency_etl_spark.queries.llm_ops import dedup_canonical

SF = "/root/testdata/sf0.001"


def test_canonical_groups_are_singletons_on_corpus(spark):
    """The synthetic corpus carries no case/punct/digit variants: every
    canonical group must be a single raw digest (this is the documented
    honesty note — if a regenerated corpus ever plants variants, this
    flips and the doc note should too)."""
    rows = dedup_canonical(spark, SF).collect()
    assert sum(r["n_copies"] for r in rows) == 500
    assert all(r["n_raw_variants"] == 1 for r in rows)


def test_canonical_merges_synthesized_variants(spark, tmp_path):
    """The merge behavior itself, on planted variants: casing, digit
    runs, punctuation, and whitespace differences fold into one
    canonical key with the correct variant count; a genuinely different
    text stays separate. Runs the REGISTERED builder against a corpus
    dir shaped like the real one."""
    base = "the quick brown fox jumps over 17 lazy dogs"
    variants = [
        base,
        "The QUICK brown fox jumps over 17 lazy dogs",  # casing
        "the quick brown fox jumps over 9000 lazy dogs",  # digit run
        "the quick, brown fox! jumps over 17 lazy dogs.",  # punctuation
        "the  quick   brown fox jumps over 17 lazy dogs",  # whitespace
    ]
    other = "a completely different document body"
    pd.DataFrame(
        {
            "doc_id": list(range(len(variants))) + [99],
            "text": variants + [other],
            "lang": ["en"] * (len(variants) + 1),
            "source": ["s"] * (len(variants) + 1),
            "n_chars": [len(t) for t in variants + [other]],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {r["kept_doc_id"]: r for r in dedup_canonical(spark, str(tmp_path)).collect()}
    assert set(rows) == {0, 99}
    g = rows[0]
    assert g["n_copies"] == len(variants)
    # the raw layer already folds pure-casing copies (raw key lowercases),
    # so 4 distinct raw digests remain — all folded into ONE canonical group
    raw = {hashlib.md5(v.lower().strip().encode()).hexdigest() for v in variants}
    assert g["n_raw_variants"] == len(raw) == 4
    assert rows[99]["n_copies"] == 1 and rows[99]["n_raw_variants"] == 1


def test_canonical_regex_matches_python_reference(spark):
    """Cross-engine regex sanity: the Spark/DuckDB-shared character-class
    regexes agree with a plain Python re reference on edge inputs."""
    from pyspark.sql import functions as F

    from currency_etl_spark.queries.llm_ops import (
        _CANON_DIGITS,
        _CANON_KEEP,
        _CANON_WS,
    )

    def ref(s):
        s = s.lower()
        s = re.sub("[0-9]+", "0", s)
        s = re.sub("[^a-z0 ]", "", s)
        return re.sub(" +", " ", s).strip()

    cases = [
        "", "   ", "ABC123def", "a-b_c.d", "1 22 333", "é ü ñ", "a  b\tc",
        "MiXeD CaSe 42!", "0a0b0", "no digits here",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = [
        r["c"]
        for r in df.select(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(F.lower(F.col("text")), _CANON_DIGITS, "0"),
                        _CANON_KEEP,
                        "",
                    ),
                    _CANON_WS,
                    " ",
                )
            ).alias("c")
        ).collect()
    ]
    assert got == [ref(c) for c in cases]


def test_canonical_partition_coarsens_raw_partition(spark):
    """Cross-entry consistency with dedup_exact: canonicalization can
    only MERGE raw groups, never split one — every raw content key must
    map into exactly one canonical group, and the canonical copy counts
    must be the sums of their raw groups' counts."""
    from collections import defaultdict

    from currency_etl_spark.queries.llm_ops import dedup_exact

    raw = {r["content_key"]: r for r in dedup_exact(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    # map every doc to its raw and canonical keys via the same digests
    import re as _re

    def canon_key(s):
        s = s.lower()
        s = _re.sub("[0-9]+", "0", s)
        s = _re.sub("[^a-z0 ]", "", s)
        s = _re.sub(" +", " ", s).strip()
        return hashlib.md5(s.encode()).hexdigest()

    raw_to_canon = defaultdict(set)
    canon_copies = defaultdict(int)
    for r in docs.itertuples():
        rk = hashlib.md5(r.text.lower().strip().encode()).hexdigest()
        ck = canon_key(r.text)
        raw_to_canon[rk].add(ck)
        canon_copies[ck] += 1
    assert all(len(cs) == 1 for cs in raw_to_canon.values())  # coarsening
    from currency_etl_spark.queries.llm_ops import dedup_canonical

    got = {r["content_key"]: r for r in dedup_canonical(spark, SF).collect()}
    assert set(got) == set(canon_copies)
    for ck, n in canon_copies.items():
        assert got[ck]["n_copies"] == n, ck
    assert sum(r["n_copies"] for r in raw.values()) == sum(
        r["n_copies"] for r in got.values()
    )
