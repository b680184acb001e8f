"""Catalog-wide invariants: guard rails that keep every graded query
deterministic and contract-compliant, independent of its specific logic.

These catch the regressions the per-query oracle tests can't see coming:
someone adds current_date() to a new query and it passes today's oracle
run but diverges the day the driver re-runs it."""

from __future__ import annotations

import re

import pytest

from currency_etl_spark.catalog import load_catalog

CATALOG = load_catalog()

#: expressions that make results time- or randomness-dependent
FORBIDDEN_PLAN_TOKENS = (
    "current_timestamp",
    "current_date",
    "now()",
    "rand(",
    "randn(",
    "uuid(",
    "shuffle(",  # array shuffle — nondeterministic order
)

# streaming queries build sinks eagerly; analyzed-plan text is checked for
# the batch queries where the logical plan is cheap to render
_PLAN_CHECKED = [
    name for name, spec in CATALOG.items() if "streaming" not in (spec.tags or ())
]


@pytest.mark.parametrize("name", sorted(_PLAN_CHECKED))
def test_no_nondeterministic_expressions(name, spark, sf_dir):
    df = CATALOG[name].spark_fn(spark, sf_dir)
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "extended").lower()
    for token in FORBIDDEN_PLAN_TOKENS:
        assert token not in plan, f"{name}: nondeterministic expression {token!r} in plan"


def test_oracles_reference_only_corpus_tables():
    corpus = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for name, spec in CATALOG.items():
        if spec.oracle is None:
            continue
        # FROM/JOIN targets must be corpus views or inline subqueries
        for tbl in re.findall(r"(?:FROM|JOIN)\s+([a-zA-Z_][a-zA-Z0-9_]*)", spec.oracle):
            assert tbl.lower() in corpus or tbl.lower() in {"", "r"} or tbl in (
                # CTE names are fine — they must be defined in the same query
                # (optionally with a recursive column list: name(a, b) AS ()
                *re.findall(r"(\w+)\s*(?:\([^)]*\))?\s+AS\s*\(", spec.oracle),
            ), f"{name}: oracle references unknown table {tbl!r}"


def test_every_query_has_doc_and_tags():
    for name, spec in CATALOG.items():
        assert spec.doc and len(spec.doc) > 30, f"{name}: missing doc"
        assert spec.tags, f"{name}: missing tags"


def test_catalog_size_monotonic():
    # round-3 floor: future rounds must not silently drop operators
    assert len(CATALOG) >= 93
    # as of round 3 EVERY entry is hash-graded against a DuckDB oracle —
    # no rows-only checks remain; keep it that way
    assert all(s.oracle for s in CATALOG.values())


def test_priority_order_fits_grading_window():
    """The driver records correctness rows for the leading GRADING_WINDOW
    catalog entries (50 in rounds 1-2). PRIORITY_ORDER must reference only
    real entries, contain no duplicates, and fit inside the window — else
    rotation silently stops covering what it claims to cover."""
    from currency_etl_spark.catalog import GRADING_WINDOW, PRIORITY_ORDER

    assert len(PRIORITY_ORDER) == len(set(PRIORITY_ORDER)), "duplicate priority entries"
    unknown = [n for n in PRIORITY_ORDER if n not in CATALOG]
    assert not unknown, f"priority entries not in catalog: {unknown}"
    assert len(PRIORITY_ORDER) <= GRADING_WINDOW


def test_make_window_agrees_with_priority_order():
    """tools/make_window.py mechanizes the rotation policy: its proposed
    window must contain exactly PRIORITY_ORDER's entries (ordering may
    differ only where a round note applies a documented nuance, e.g. the
    ceded-tail-first convention), and its NEW-entry detection must match
    the entries with no recorded driver row."""
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    try:
        import make_window
    finally:
        sys.path.pop(0)

    from currency_etl_spark.catalog import GRADING_WINDOW, PRIORITY_ORDER, load_catalog

    cat = list(load_catalog())
    newest = make_window.newest_rows(root)
    new_entries = [n for n in cat if n not in newest]
    stale = sorted((n for n in cat if n in newest), key=lambda n: newest[n])
    window = (new_entries + stale)[:GRADING_WINDOW]
    assert set(window) == set(PRIORITY_ORDER), (
        sorted(set(window) ^ set(PRIORITY_ORDER))
    )
    assert PRIORITY_ORDER[: len(new_entries)] == new_entries
