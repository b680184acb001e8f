"""Broadcast Bloom-filter join prefilter (guide 'Partitioning & shuffle').

The explicit form of Spark's runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``): when a join's
build side is selective (a filtered dimension), ship a Bloom filter of
its join keys to the probe side's SCAN and drop non-matching fact rows
BEFORE they pay the shuffle. At 100 TB the win is shuffle volume — a 1%
selective dimension turns a full-fact-table exchange into a ~1% exchange
(plus the filter's false positives, bounded below) for the cost of one
tiny bitmap broadcast.

Spark-first mechanics — everything stays JVM-side, no UDFs:

* **Build** is a distributed aggregate over the dimension keys:
  ``k`` hash positions per key (``xxhash64(key, seed_i) pmod m``),
  exploded and OR-folded into 64-bit words with ``bit_or``. Only the
  finished ``m/64``-word bitmap is collected — a driver-side scalar of a
  few KB regardless of dimension size (same contract as collecting
  k-means centroids), then re-broadcast as an array literal.
* **Probe** is a narrow scan-stage predicate: for each of the ``k``
  seeds, ``getbit(bitmap[pos div 64], pos mod 64)`` — whole-stage-codegen
  arithmetic on a broadcast literal, evaluated before any exchange.
* **No false negatives**: every inserted key sets all its bits, so the
  prefilter is semantically transparent for the downstream join — the
  join itself removes false positives. ``prefiltered_join`` therefore
  equals the plain join bit-for-bit (the property the graded catalog
  entry proves against a plain-SQL oracle).

False-positive rate ≈ (1 - e^(-k·n/m))^k; the default 16 bits/key with
k=4 gives ~0.24%. Size ``num_bits`` to the build side: at 10⁸ dimension
keys, 16 bits/key is a 200 MB bitmap — at that point hand the job back
to Spark's builtin runtime bloom filter (which builds per-executor) or
raise the selectivity threshold; this operator targets the 10³–10⁷-key
dimensions where the bitmap is kilobytes to megabytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default sizing: 16 bits/key at k=4 → ~0.24% false positives.
DEFAULT_BITS_PER_KEY = 16
DEFAULT_NUM_HASHES = 4


def build_bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> list[int]:
    """Aggregate the distinct values of ``keys[key_col]`` into a Bloom
    bitmap of ``num_bits`` bits, returned as ``num_bits // 64`` int64
    words (little-endian bit order within each word).

    The heavy lifting (hashing, dedup, OR-fold) runs distributed; the
    driver only materializes the finished fixed-size bitmap.
    """
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    # No .distinct() on the exploded positions (r17, guide §2.4): bit_or
    # is idempotent, so duplicate positions fold to the same word for
    # free in the groupBy's map-side partial aggregate — the distinct
    # only added a full extra Exchange on `pos` (measured: one of the two
    # shuffles in the build job, for a bit-identical bitmap).
    positions = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits))
                    for i in range(num_hashes)
                ]
            )
        ).alias("pos")
    )
    words = (
        positions.select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            # call_function: the F.shiftleft wrapper only takes a Python int
            # for numBits; the SQL function itself accepts a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod(F.col("pos"), F.lit(64)).cast("int")
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for row in words:
        bitmap[row["word_idx"]] = row["word"]
    return bitmap


def bloom_might_contain(
    bitmap: list[int],
    col: Column,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Membership predicate against a bitmap from :func:`build_bloom_bitmap`.

    Pure built-in arithmetic over a broadcast array literal — runs inside
    whole-stage codegen at the probe side's scan stage. NULL keys hash
    like any value under ``xxhash64`` (NULL input leaves the seed
    untouched), so the predicate never returns NULL and filters
    deterministically.
    """
    num_bits = len(bitmap) * 64
    words = F.array(*[F.lit(w).cast("long") for w in bitmap])
    cond = F.lit(True)
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        cond = cond & (F.getbit(word, F.pmod(pos, F.lit(64)).cast("int")) == 1)
    return cond


def prefiltered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """``fact ⋈ dim`` with a Bloom prefilter on the fact side.

    Semantically identical to ``fact.join(dim, fact[fact_key] ==
    dim[dim_key], how)`` for ``how`` in {inner, left_semi}: the bloom
    admits every true match (no false negatives) and the join discards
    the false positives. The dimension is joined broadcast — the
    prefilter's job is cutting fact rows before ANY exchange, not
    changing the join strategy.
    """
    # Size the bitmap from a plain row count, not distinct().count()
    # (r17, guide §1.2): sizing only needs an UPPER BOUND on the key
    # cardinality — over-sizing lowers the false-positive rate, never
    # breaks correctness (no false negatives either way, and the join
    # removes false positives regardless). count() is a scan + partial
    # counts with no exchange; the distinct count paid a full shuffle of
    # the keys as a separate driver-blocking job before the build even
    # started. For a dimension with unique keys (every catalog caller)
    # the two are equal and the bitmap is bit-identical.
    n_keys = max(dim.count(), 1)
    num_bits = max(((n_keys * bits_per_key + 63) // 64) * 64, 64)
    bitmap = build_bloom_bitmap(dim, dim_key, num_bits, num_hashes)
    pref = fact.filter(bloom_might_contain(bitmap, F.col(fact_key), num_hashes))
    return pref.join(F.broadcast(dim), pref[fact_key] == dim[dim_key], how)
