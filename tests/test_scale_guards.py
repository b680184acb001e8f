"""Repo-wide scale guards: every catalog entry's physical plan is swept
for the patterns that kill a plan at 100 TB —

  * ``CartesianProduct`` (a non-broadcast cross join; every deliberate
    scalar/centroid/codebook fanout in this repo is ``F.broadcast`` and
    plans as BroadcastNestedLoopJoin, so the count must be ZERO),
  * ``BatchEvalPython`` (a row-at-a-time Python UDF on the hot path —
    Arrow-batched operators are the only allowed Python data path), and
  * an unpartitioned ``ORDER BY`` window over an unbounded relation
    (one task sorts everything). The repo's rule: per-row windows over
    fact/document/customer-scale relations go through the __pid
    range-split machinery (distributed_global_rank / distributed_ntile);
    a global window is legitimate ONLY over a relation whose size is
    bounded by something other than the data volume (vocab caps, days,
    months, tile counts). Those are enumerated below WITH their bound —
    a new entry that global-sorts an unbounded relation fails here
    until it's either rewritten or its bound is argued in this table.

This is the executable form of the round-5 verdict's anti-pattern sweep
(which found exactly the three ntile entries this round's rewiring
cleared)."""

from __future__ import annotations

import re

import pytest

from currency_etl_spark.catalog import load_catalog

#: entry → (bounding relation, why the global window is safe at 100 TB).
ALLOWED_GLOBAL_WINDOWS = {
    "bpe_pair_merge": (
        "adjacent-symbol pair counts",
        "relation is vocab²-bounded and pre-truncated to top-15 by "
        "sort-limit (TakeOrderedAndProject) before the ranking window",
    ),
    "docs_bpe_encode": (
        "post-encoding token census head",
        "the rank label orders the BPE_TOP_TOKENS-row (20) relation "
        "already truncated by sort-limit (TakeOrderedAndProject) — the "
        "window never sees the vocab-sized census",
    ),
    "streaming_bpe_encode": (
        "ingest-census head (batch rollup of the memory sink)",
        "same shape as docs_bpe_encode: the rank label orders the "
        "BPE_TOP_TOKENS-row (20) relation already truncated by "
        "sort-limit — the window never sees the batch-vocab census",
    ),
    "docs_hybrid_search_rrf": (
        "per-arm top-10 ranked lists",
        "both ranking windows order arm_n-row (10) relations already "
        "truncated by sort-limit (TakeOrderedAndProject) — the window "
        "never sees a data-sized relation",
    ),
    # docs_hybrid_eval carried this allowlist entry until its arm
    # relations were checkpointed (each arm now executes once, inside
    # its checkpoint build) — the graded plan reads the k-row
    # checkpoints and holds no global window at all.
    "docs_index_lookup": (
        "per-term document frequencies",
        "vocab-bounded (DF-capped posting lists); the window ranks "
        "terms, not postings",
    ),
    "docs_skipgram_pairs": (
        "skipgram pair counts",
        "vocab²-bounded co-occurrence relation, rank-capped output",
    ),
    "events_ewma_revenue": (
        "daily revenue series",
        "days-sized relation; EWMA's ordered prefix fold is inherently "
        "sequential in time and the series length is |days|, not |events|",
    ),
    "events_slo_burn": (
        "daily error-rate series",
        "days-sized relation (one row per day)",
    ),
    "orders_monthly_growth": (
        "monthly order rollup",
        "months-sized relation (one row per month)",
    ),
    "order_value_deciles": (
        "per-decile rollup",
        "the telescoped sum_steps lag runs on the ≤10-row decile curve; "
        "the order ranking itself goes through distributed_global_rank "
        "(no orders-sized window or self-join remains — r8 rewire)",
    ),
    "parts_revenue_pareto": (
        "per-decile revenue rollup",
        "cumulative-share window runs on the 10-row decile curve; the "
        "part-revenue ranking itself goes through "
        "distributed_global_rank (no parts-sized window remains)",
    ),
}

_CATALOG = load_catalog()


def _plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    """One plan per catalog entry. Streaming entries run their pooled
    stream at build time (batch post-processing is what's planned); the
    module scope pays that once."""
    out = {}
    for name, spec in _CATALOG.items():
        out[name] = _plan_of(spec.spark_fn(spark, sf_dir))
    return out


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], (
        f"non-broadcast cross join in {offenders}: broadcast the small "
        "side or rewrite the join"
    )


def test_global_windows_are_enumerated_and_bounded(plans):
    offenders = {}
    for name, p in plans.items():
        bad = set()
        for s in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
            head = s.split(",")[0]
            # partitioned windows put partition cols first; an ORDER BY
            # column leads only when the spec is unpartitioned. __pid is
            # the range-split machinery's own (legitimate) 32-row cumsum.
            if (" ASC" in head or " DESC" in head) and "__pid" not in head:
                bad.add(head.strip())
        if bad and name not in ALLOWED_GLOBAL_WINDOWS:
            offenders[name] = sorted(bad)
    assert offenders == {}, (
        f"unpartitioned ORDER BY windows outside the justified allowlist: "
        f"{offenders} — route through distributed_global_rank/"
        "distributed_ntile or add the entry's size bound to "
        "ALLOWED_GLOBAL_WINDOWS"
    )


#: entry → (bounding relation, why an UNORDERED whole-relation window is
#: safe). These are windowspecdefinition(specifiedwindowframe(...)) specs —
#: no partition, no order — which funnel their input through one task just
#: like an ordered global window; the only difference is Spark skips the
#: sort. The rank helper's own sum(__n) over the ≤33-row offset relation is
#: exempted structurally (matched by function argument, not entry name).
ALLOWED_WHOLE_RELATION_WINDOWS = {
    "docs_curation_pipeline": (
        "per-language kept-corpus rollup",
        "the doc_share denominator sums n_docs over the languages-sized "
        "relation (|langs| rows)",
    ),
    "orders_weekday_seasonality": (
        "ISO-weekday rollup",
        "the order_share denominator sums over the 7-row weekday relation",
    ),
    "orders_benford": (
        "first-digit counts",
        "the share denominator sums over the 9-row digit relation",
    ),
}

_WHOLE_REL = re.compile(
    # function call allowing one level of nested parens (sum(cast(x as
    # bigint)) etc.) so wrapped aggregates can't slip past the sweep
    r"(\w+\((?:[^()]|\([^()]*\))*\)) windowspecdefinition\(specifiedwindowframe"
)


def _whole_relation_windows(plan: str) -> "list[str]":
    """Window functions whose spec has no partition and no order — every
    row lands in one task. The rank helper's internal total over the
    offset relation (sum of __n) is structural machinery, not a leak."""
    return [f for f in _WHOLE_REL.findall(plan) if "__n#" not in f]


def test_whole_relation_windows_are_enumerated_and_bounded(plans):
    offenders = {
        name: fns
        for name, p in plans.items()
        if (fns := _whole_relation_windows(p))
        and name not in ALLOWED_WHOLE_RELATION_WINDOWS
    }
    assert offenders == {}, (
        f"unordered whole-relation windows outside the justified "
        f"allowlist: {offenders} — these single-task the relation exactly "
        "like an ordered global window; replace with a 1-row aggregate "
        "broadcast back (crossJoin(F.broadcast(...))) or add a size bound "
        "to ALLOWED_WHOLE_RELATION_WINDOWS"
    )


def test_whole_relation_allowlist_does_not_rot(plans):
    stale = [
        name
        for name in ALLOWED_WHOLE_RELATION_WINDOWS
        if not _whole_relation_windows(plans[name])
    ]
    assert stale == [], (
        f"whole-relation allowlist entries without such windows: {stale}"
    )


def test_allowlist_entries_still_use_global_windows(plans):
    """The allowlist must not rot: an entry that no longer has any
    unpartitioned window should be removed from the table."""
    stale = []
    for name in ALLOWED_GLOBAL_WINDOWS:
        p = plans[name]
        has = any(
            (" ASC" in s.split(",")[0] or " DESC" in s.split(",")[0])
            and "__pid" not in s.split(",")[0]
            for s in re.findall(r"windowspecdefinition\(([^)]*)\)", p)
        )
        if not has:
            stale.append(name)
    assert stale == [], f"allowlist entries without global windows: {stale}"


def test_no_row_at_a_time_python_udfs(plans):
    """Python may touch data only through Arrow-batched operators
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas...); a
    BatchEvalPython node is a row-at-a-time UDF — serialize-per-row on
    the hot path, the documented forbidden form."""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == [], (
        f"row-at-a-time Python UDF in {offenders}: use built-ins or an "
        "Arrow-batched pandas form"
    )
