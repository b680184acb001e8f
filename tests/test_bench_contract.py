"""The bench CLI is a judged artifact: a crash or malformed output zeroes
the round's BENCH record (round 4 died exactly this way, via an events
loader error surfaced through bench's table warmup). Lock the contract:
warmup names resolve, and a real subprocess run emits the one-JSON-line
summary the driver parses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import bench as bench_mod

from currency_etl_spark.catalog import load_catalog


def test_warmup_names_resolve():
    cat = load_catalog()
    for name in bench_mod.WARMUP_TIMED_SF + bench_mod.WARMUP_TINY_SF:
        assert name in cat, f"bench warmup references unknown entry {name!r}"


#: Every memo tag a bench run may observe (the family-sum report keys on
#: these). A NEW memo_checkpoint tag must be added here deliberately —
#: the family report is a judged artifact and silent tag growth would
#: mean unreviewed shared state. "stream_pool" is the pooled-stream
#: analog: the entry that starts the pool pays the family's startup.
KNOWN_MEMO_TAGS = frozenset(
    {"minhash_sh", "minhash_sig", "minhash_pairs", "cc_map", "rfm_base",
     "phash_base", "stream_pool", "dup_hits", "ivf_cents", "ivf_index",
     "surp_base", "text_tf", "text_df", "text_batch_tf",
     "bpe_enc", "bpe_enc_stream", "affinity_edges",
     "text_posting_heads", "minhash_overlap", "text_dls",
     "stale_probes", "stale_truth"}
)


def test_bench_subprocess_contract():
    """Run the real CLI on a 4-query subset (two plain entries + two
    MinHash-family siblings) at the smallest SF and parse its output
    exactly like the driver does (last line must be complete JSON with
    the agreed keys; the detailed line must carry the memo-family sums
    with build attribution — round-7 verdict item 3)."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_BUDGET="120",
    )
    out = subprocess.run(
        [
            sys.executable,
            "bench.py",
            "ref_avg_value",
            "top_customers",
            "dedup_minhash_lsh",
            "minhash_jaccard_est",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) >= 2  # detailed line + short summary line
    summary = json.loads(lines[-1])
    assert summary["metric"] == "catalog_total_runtime"
    assert summary["unit"] == "sec" and summary["value"] > 0
    assert summary["sf"] == 0.001 and summary["n_queries"] == 4
    detailed = json.loads(lines[-2])
    assert set(detailed["queries"]) == {
        "ref_avg_value", "top_customers", "dedup_minhash_lsh", "minhash_jaccard_est",
    }
    fams = detailed["families"]
    assert set(fams) <= KNOWN_MEMO_TAGS, f"undeclared memo tags: {set(fams)}"
    # the shared signature/pair bases: built by the alphabetically-first
    # consumer, read warm by the sibling — both appear as members, and
    # since round 9 the build cost is its OWN line (subtracted from the
    # payer's per-entry time, round-8 verdict item 3)
    for tag in ("minhash_sig", "minhash_pairs"):
        assert fams[tag]["paid_by"] == "dedup_minhash_lsh", fams[tag]
        assert set(fams[tag]["entries"]) == {
            "dedup_minhash_lsh", "minhash_jaccard_est",
        }, fams[tag]
        assert fams[tag]["sec"] >= 0
        assert fams[tag]["build_sec"] > 0, fams[tag]
        assert f"memo_build:{tag}" in detailed["overheads"]
    # no entry may report exactly 0.0 (round-9 verdict item 3): an
    # all-cost-in-build payer clamps to the 1 ms floor instead of reading
    # as a free operator
    assert all(v >= 0.001 for v in detailed["queries"].values()), detailed["queries"]
    # total = per-entry work + separately-reported shared-base costs
    assert detailed["overhead_sec"] == round(sum(detailed["overheads"].values()), 3)
    assert (
        abs(
            detailed["value"]
            - (sum(detailed["queries"].values()) + detailed["overhead_sec"])
        )
        < 0.05
    )


def test_bench_subtracts_shared_base_costs():
    """Source pin for the round-8 item-3 contract: bench.main must
    subtract each memo build's wall time and the stream-pool startup from
    the paying entry's dt BEFORE the min-of-passes fold, so per-entry
    numbers are stable whether or not the entry is its family's
    alphabetical payer."""
    import inspect

    src = inspect.getsource(bench_mod.main)
    assert "dt -= bsec" in src, "memo build cost no longer subtracted"
    assert "dt -= ps[1]" in src, "stream-pool startup no longer subtracted"
    fold_at = src.find("times[name] = min(")
    assert fold_at != -1
    assert src.find("dt -= bsec") < fold_at and src.find("dt -= ps[1]") < fold_at, (
        "subtraction must happen before the min-of-passes fold"
    )
    # round-9 item 3: the post-subtraction marginal clamps to 1 ms so a
    # shared-build payer can never report exactly 0.0
    assert "max(dt, 0.001)" in src, "no-free-operator floor removed"


def test_bench_marks_stream_family_primary():
    """Round-13 verdict item 7: per-entry streaming rows are
    attribution-shifted since the parallel pool start, so the dump must
    mark the stream_pool family row as the PRIMARY streaming signal —
    round-over-round adjudication compares family sec + startup_sec,
    never individual stream-entry rows."""
    import inspect

    src = inspect.getsource(bench_mod.main)
    assert '"primary": True' in src, "stream_pool primary marker removed"
    assert "attribution-shifted" in src, "stream_pool adjudication note removed"


def test_subset_run_does_not_clobber_full_dump():
    """A subset or off-SF CLI run must leave bench_queries_r{N}.json
    untouched — the file is the round's machine-diffable full-catalog
    sf0.1 artifact, and a 2-query spot-check (or an sf0.001 contract
    check) overwriting it silently destroys the comparison baseline
    (this happened: the subprocess-contract test above replaced the
    182-entry dump with its own 2 queries)."""
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dumps = [f for f in os.listdir(here) if re.match(r"bench_queries_r\d+\.json$", f)]
    if not dumps:  # fresh checkout before the first full run
        return
    newest = max(dumps)
    with open(os.path.join(here, newest)) as fh:
        n_before = len(json.load(fh)["queries"])
    # the subprocess-contract test already ran a real subset invocation
    # in this same checkout; assert the artifact still holds a full
    # catalog's worth of queries (subset runs skip the dump write)
    assert n_before > 2, (
        f"{newest} holds only {n_before} queries — a subset bench run "
        "overwrote the full-catalog dump"
    )


def test_bench_resets_shared_memos_between_passes():
    """Measurement-honesty guard: each timed pass must rebuild every
    memoized cross-entry checkpoint (the shared RFM / MinHash / phash /
    cluster-map bases) inside a timed region. Losing the reset_memos()
    call next to reset_stream_pool() would let pass 2 serve pass 1's
    materializations and the per-query min would under-report the work."""
    import inspect

    src = inspect.getsource(bench_mod.main)
    pool_at = src.find("reset_stream_pool()")
    memo_at = src.find("reset_memos()")
    assert pool_at != -1 and memo_at != -1, (
        "bench.main must reset both the stream pool and the shared memos "
        "at every pass boundary"
    )
    # Position, not mere presence (round-7 advice): both resets must sit
    # INSIDE the pass loop and BEFORE the pass timer starts — a refactor
    # moving either outside the loop (pass 2 served warm bases) or after
    # pass_t0 (reset cost mis-billed to the pass) must fail here.
    loop_at = src.find("for _ in range(2):")
    timer_at = src.find("pass_t0 = time.perf_counter()")
    assert loop_at != -1 and timer_at != -1, "bench.main pass-loop landmarks moved"
    assert loop_at < pool_at < timer_at, (
        "reset_stream_pool() must run inside the pass loop, before pass_t0"
    )
    assert loop_at < memo_at < timer_at, (
        "reset_memos() must run inside the pass loop, before pass_t0"
    )
