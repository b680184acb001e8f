"""docs_skipgram_pairs: UDTF-route extraction must match a direct Python
skip-gram count (the oracle covers SQL parity; this pins the window/bounds
semantics against an independent reference)."""

from __future__ import annotations

from collections import Counter

from currency_etl_spark.queries.llm_ops import docs_skipgram_pairs
from currency_etl_spark.sources import table


def test_skipgram_top_pairs_match_python_reference(spark, sf_dir):
    got = docs_skipgram_pairs(spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents").select("text").toPandas()
    counts: Counter = Counter()
    for text in docs["text"]:
        t = text.split(" ")
        n = len(t)
        for i in range(n):
            for o in (-2, -1, 1, 2):
                if 0 <= i + o < n:
                    counts[(t[i], t[i + o])] += 1
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:20]
    assert len(got) == 20
    for rnk, ((center, context), n) in enumerate(expected, start=1):
        row = got[got["rnk"] == rnk].iloc[0]
        assert (row["center"], row["context"], row["n"]) == (center, context, n)


def test_skipgram_symmetry(spark, sf_dir):
    """±window extraction is symmetric: count(a,b) == count(b,a)."""
    got = docs_skipgram_pairs(spark, sf_dir).toPandas()
    pairs = {(r["center"], r["context"]): r["n"] for _, r in got.iterrows()}
    for (a, b), n in pairs.items():
        if (b, a) in pairs:
            assert pairs[(b, a)] == n
