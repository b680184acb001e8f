"""Generalized as-of join — the library operator behind the graded
`asof_purchase_last_click` / `asof_click_within_1h` entries
(queries/corpus.py), exposed as a reusable API the way kdb's `aj` /
pandas' `merge_asof` are.

Spark has no native as-of join, and the naive encodings are scale
killers: a range join explodes O(|L| x matches), a per-group
`applyInPandas` drags every row through Python. The union-sort encoding
used here costs ONE hash shuffle of L ∪ R on the `by` key plus a
per-partition sort — the same shape as any windowed aggregate, which is
exactly how a 100 TB as-of must run (reference capability: SURVEY.md §2.4
as-of row; no reference implementation exists to port — the reference
delegates to pandas merge_asof-style host code).

Semantics (pandas merge_asof parity):
  * direction="backward": latest right row with r.on <= l.on
  * direction="forward":  earliest right row with r.on >= l.on
  * tolerance (seconds): the match must additionally satisfy
    |l.on - r.on| <= tolerance, else the value columns are NULL
  * allow_exact_matches=False excludes r.on == l.on
  * ties WITHIN the right side at one instant: highest `seq` wins for
    backward, lowest for forward — `seq` (any unique column) closes the
    total order so results never depend on partition merge order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    seq: str,
    direction: str = "backward",
    tolerance_s: float | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join `left` to `right` on ordering column `on` (timestamp)
    within `by` groups, carrying `value_cols` from the matched right row.

    Returns all `left` columns plus `<on><suffix>` (the matched right
    ordering value) and each value column as `<name><suffix>`.
    `seq` names a unique-per-row right column used only to break
    same-instant ties deterministically.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    matched_on = f"{on}{suffix}"
    carried = [matched_on, *[f"{c}{suffix}" for c in value_cols]]

    # Tag and union. side orders the exact-instant interleave: in the
    # scan order (either direction) the left row's frame ends at itself,
    # so a same-instant right row is visible iff it sorts BEFORE the left
    # row — i.e. exactly when exact matches are allowed.
    r_side, l_side = (0, 1) if allow_exact_matches else (1, 0)

    r = right.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(r_side).alias("__side"),
        F.col(seq).cast("long").alias("__seq"),
        F.col(on).alias(matched_on),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    l_cols = left.columns
    l = left.select(
        *l_cols,
        F.col(on).alias("__on"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast("long").alias("__seq"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in carried],
    )
    # align column sets (left payload columns are NULL on the right side)
    for c in l_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    r = r.select(*l.columns)

    merged = l.unionByName(r)

    if direction == "backward":
        order = [F.col("__on").asc(), F.col("__side").asc(), F.col("__seq").asc()]
    else:
        # forward = backward over reversed time: latest-preceding in
        # reverse order is earliest-following in real order
        order = [F.col("__on").desc(), F.col("__side").asc(), F.col("__seq").desc()]

    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried_exprs = [F.last(c, ignorenulls=True).over(w).alias(c) for c in carried]

    out = merged.select(
        *[c for c in l_cols], "__side", *[e for e in carried_exprs]
    ).filter(F.col("__side") == l_side).drop("__side")

    if tolerance_s is not None:
        tol_us = int(tolerance_s * 1_000_000)
        gap = F.abs(F.unix_micros(F.col(on)) - F.unix_micros(F.col(matched_on)))
        ok = F.col(matched_on).isNotNull() & (gap <= tol_us)
        out = out.select(
            *l_cols,
            F.when(ok, F.col(matched_on)).alias(matched_on),
            *[F.when(ok, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}") for c in value_cols],
        )
    return out
