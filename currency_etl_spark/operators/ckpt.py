"""One-live-checkpoint-per-tag release discipline (round-5 advice,
generalized in round 6 from supplier_reach_bfs to every eager
localCheckpoint in the catalog).

Eager ``localCheckpoint`` blocks are never freed by Spark until the
session ends, so a long session invoking checkpointing entries
repeatedly (the bench's min-of-2 passes, a notebook user re-running a
query) accumulates storage memory without bound. These helpers keep at
most ONE live checkpoint per tag:

* :func:`swap_checkpoint` — release the previous checkpoint under the
  tag, then materialize the new one. For independent re-builds: the new
  plan derives from source tables, never from the previous checkpoint.
* :func:`chain_checkpoint` — materialize FIRST, then release. For
  iteration chains (connected components' label propagation) where the
  new plan READS the previous checkpoint's blocks — releasing first
  would free lineage-truncated data the in-flight materialization still
  needs.

Contract (same as the BFS/rfm pattern this generalizes): the checkpoint
handed out stays live until the SAME tag is checkpointed again, so a
consumer must execute its plan before re-invoking the entry family that
owns the tag. The driver, bench, and oracle tests all run entries
serially with immediate execution; concurrent same-tag builders in one
session race benignly only because they compute identical data.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

_LIVE: dict = {}
_KEYS: dict = {}


def swap_checkpoint(tag: str, df: DataFrame) -> DataFrame:
    prev = _LIVE.get(tag)
    if prev is not None:
        prev.unpersist()
    out = df.localCheckpoint(eager=True)
    _LIVE[tag] = out
    _KEYS.pop(tag, None)
    return out


def memo_checkpoint(tag: str, key, build: Callable[[], DataFrame]) -> DataFrame:
    """swap_checkpoint with cross-entry reuse: if the live checkpoint
    under ``tag`` was built for the same ``key`` (the caller passes
    everything the content depends on — e.g. the sf_dir), hand it back
    without recomputing; otherwise build and swap. Lets sibling entries
    that need the SAME materialized relation (customer_rfm /
    customers_rfm_segments share one customers-sized RFM aggregate) pay
    its build once per session instead of once per entry, while a
    different sf_dir — the oracle tests hop between SFs — always
    rebuilds. Same one-live-per-tag release discipline."""
    got = _LIVE.get(tag)
    if got is not None and _KEYS.get(tag) == key:
        return got
    out = swap_checkpoint(tag, build())
    _KEYS[tag] = key
    return out


def reset_memos() -> None:
    """Forget every memo key (bench pass boundary — the honesty guard
    mirroring reset_stream_pool): the next memo_checkpoint under each tag
    rebuilds inside its caller's timed region, and the swap releases the
    previous pass's blocks. Already-handed-out checkpoints stay valid for
    plans still holding them."""
    _KEYS.clear()


def chain_checkpoint(tag: str, df: DataFrame) -> DataFrame:
    out = df.localCheckpoint(eager=True)
    prev = _LIVE.get(tag)
    if prev is not None:
        prev.unpersist()
    _LIVE[tag] = out
    return out
