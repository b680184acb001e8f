#!/usr/bin/env python
"""Compute the next round's grading-window composition from the recorded
CORRECTNESS_r*.json files — the mechanical form of the rotation policy
documented at catalog.py PRIORITY_ORDER:

  * NEW entries (no driver row in any recorded round) lead, in catalog
    registration order;
  * then every STALE standing green, oldest recorded round first, within
    a round in that round's window order (the CORRECTNESS file's key
    order IS the window order);
  * the window truncates at GRADING_WINDOW (50).

Prints the python-list body ready to paste into PRIORITY_ORDER, plus the
staleness ledger the window-header comment states. Purely advisory — the
committed PRIORITY_ORDER stays the source of truth (the human-readable
justification comment is part of the audit artifact).

Usage: python tools/make_window.py [repo_root] [--through-round N]

``--through-round N`` ignores CORRECTNESS files newer than round N — use
catalog.PRIORITY_ORDER_BASIS_ROUND to reproduce the committed window even
after the driver writes the current round's own file.
"""

from __future__ import annotations

import json
import os
import re
import sys


def newest_rows(root: str, through_round: "int | None" = None) -> "dict[str, tuple[int, int]]":
    """entry -> (newest round with a driver row, position in that window).

    ``through_round`` caps the CORRECTNESS files considered: a committed
    PRIORITY_ORDER is authored against the rounds recorded at commit time
    (catalog.PRIORITY_ORDER_BASIS_ROUND), and the driver writes the
    current round's own file AFTER the commit — without the cap, that
    file would silently advance the proposal by one round and any pin
    against the committed window would self-rot at round end.
    """
    newest: dict = {}
    for f in sorted(os.listdir(root)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        if through_round is not None and rnd > through_round:
            continue
        with open(os.path.join(root, f)) as fh:
            names = list(json.load(fh))
        for pos, n in enumerate(names):
            if n not in newest or newest[n][0] < rnd:
                newest[n] = (rnd, pos)
    return newest


def main() -> int:
    argv = list(sys.argv[1:])
    through_round = None
    if "--through-round" in argv:
        i = argv.index("--through-round")
        if i + 1 >= len(argv):
            print("usage: make_window.py [repo_root] [--through-round N]", file=sys.stderr)
            print("error: --through-round requires an integer value", file=sys.stderr)
            return 2
        try:
            through_round = int(argv[i + 1])
        except ValueError:
            print("usage: make_window.py [repo_root] [--through-round N]", file=sys.stderr)
            print(f"error: --through-round expects an integer, got {argv[i + 1]!r}", file=sys.stderr)
            return 2
        del argv[i : i + 2]
    root = argv[0] if argv else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    sys.path.insert(0, root)
    from currency_etl_spark.catalog import GRADING_WINDOW, load_catalog

    cat = list(load_catalog())
    newest = newest_rows(root, through_round=through_round)
    new_entries = [n for n in cat if n not in newest]
    stale = sorted(
        (n for n in cat if n in newest),
        key=lambda n: newest[n],
    )
    window = (new_entries + stale)[:GRADING_WINDOW]
    ledger: dict = {}
    for n in cat:
        rnd = newest.get(n, (None,))[0]
        ledger[rnd] = ledger.get(rnd, 0) + 1
    print(f"# proposed next window ({len(window)} of {len(cat)} entries):")
    if new_entries:
        print("# --- never driver-graded (lead) ---")
    for n in window:
        tag = "" if n in newest else "  # NEW"
        print(f'    "{n}",{tag}')
    print("# staleness ledger (newest driver row -> entries):")
    for rnd in sorted(ledger, key=lambda r: (r is None, r)):
        label = "never" if rnd is None else f"r{rnd}"
        print(f"#   {label}: {ledger[rnd]}")
    refreshed = set(window)
    oldest_left = min(
        (newest[n][0] for n in cat if n in newest and n not in refreshed),
        default=None,
    )
    label = "none" if oldest_left is None else f"r{oldest_left}"
    print(f"# oldest row left un-refreshed by this window: {label}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # `| head` is a normal way to read this
        sys.exit(0)
