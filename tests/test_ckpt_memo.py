"""memo_checkpoint contract: cross-entry reuse is keyed — the SAME
(tag, key) hands back the live checkpoint without rebuilding, a key
change (the oracle tests hop sf_dirs) always rebuilds, and reset_memos
(bench.py's pass boundary) forces the next call to rebuild inside the
caller's timed region. A stale-reuse bug here would silently serve one
SF's materialization to another SF's query — the worst kind of wrong."""

from __future__ import annotations

from currency_etl_spark.operators.ckpt import memo_checkpoint, reset_memos


def test_memo_reuses_then_rebuilds_on_key_change(spark):
    calls = []

    def build_a():
        calls.append("a")
        return spark.range(3)

    def build_b():
        calls.append("b")
        return spark.range(5)

    got1 = memo_checkpoint("t_memo", "sfA", build_a)
    got2 = memo_checkpoint("t_memo", "sfA", build_a)
    assert calls == ["a"], "same (tag, key) must not rebuild"
    assert got2 is got1
    assert got2.count() == 3

    got3 = memo_checkpoint("t_memo", "sfB", build_b)
    assert calls == ["a", "b"], "key change must rebuild"
    assert got3.count() == 5


def test_reset_memos_forces_rebuild(spark):
    calls = []

    def build():
        calls.append(1)
        return spark.range(2)

    memo_checkpoint("t_reset", "k", build)
    reset_memos()
    memo_checkpoint("t_reset", "k", build)
    assert len(calls) == 2, "reset_memos must invalidate every memo key"


def test_memoized_entries_hop_sf_dirs_correctly(spark):
    """Integration form of the key contract: run a memoized dedup-family
    entry and the shared-base RFM entry at one SF, then at another, then
    back — each hop must serve THAT directory's data, never the previous
    materialization. Counts pin it: the corpus sizes differ by 10x."""
    from currency_etl_spark.queries.extras import customer_rfm
    from currency_etl_spark.queries.llm_ops import _sh_base

    tiny, small = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    n_tiny = _sh_base(spark, tiny).count()
    n_small = _sh_base(spark, small).count()
    # both tiny corpora hold 500 docs of DIFFERENT content — equal
    # distinct-shingle counts across the hop would mean the memo served
    # the previous directory's materialization
    assert n_tiny > 0 and n_small > 0 and n_small != n_tiny
    assert _sh_base(spark, tiny).count() == n_tiny  # hop back rebuilds
    r_tiny = customer_rfm(spark, tiny).collect()
    r_small = customer_rfm(spark, small).collect()
    # the segment rollup differs between corpora; identical output would
    # mean the memo served sf0.001's base to the sf0.01 query
    assert sorted(map(tuple, r_tiny)) != sorted(map(tuple, r_small))


def test_plain_swap_invalidates_memo(spark):
    """swap_checkpoint under the same tag replaces the content, so a
    later memo_checkpoint with the old key must NOT serve the swapped-in
    dataframe as if it were the memoized build."""
    from currency_etl_spark.operators.ckpt import swap_checkpoint

    calls = []

    def build():
        calls.append(1)
        return spark.range(4)

    memo_checkpoint("t_swap", "k", build)
    swap_checkpoint("t_swap", spark.range(9))
    got = memo_checkpoint("t_swap", "k", build)
    assert len(calls) == 2
    assert got.count() == 4
