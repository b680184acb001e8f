"""Graph analytics over the corpus: PageRank on the part–supplier graph.

Complements the dedup family's connected components (queries/llm_ops.py:
dedup_clusters) with the other canonical iterative graph computation —
power iteration. The same Spark shape serves both: materialize the edge
set once (it is graph-sized, far smaller than the fact table it derives
from), then run join+aggregate message-passing rounds over co-partitioned
edges and ranks.

Determinism: PageRank is float-fragile under distributed summation (the
per-node contribution sum has no fixed order), so the ENTIRE algorithm
runs in integer arithmetic — ranks are int64 billionths, per-edge
contributions use integer division, and the damping update is an integer
expression. Integer sums are exact in any order, so Spark and DuckDB agree
bit-for-bit. Truncating division is part of the algorithm definition,
mirrored verbatim in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_spark.catalog import register
from currency_etl_spark.sources import table

#: Fixed power-iteration count (unrolled in the oracle CTE chain).
PR_ITERS = 3
#: Rank scale: int64 billionths.
PR_SCALE = 1_000_000_000
#: Damping factor 0.85 as integer percentages: the update is
#: rank' = (PR_TELEPORT_PCT * SCALE) div 100 + (PR_DAMP_PCT * incoming) div 100.
PR_DAMP_PCT = 85
PR_TELEPORT_PCT = 100 - PR_DAMP_PCT
#: Rows emitted (top-k by final rank).
PR_TOPK = 20


def _sql_pr_iter(prev: str, it: int) -> str:
    """One integer power-iteration round (DuckDB). `//` is truncating
    integer division, matching Spark's `div`."""
    return f"""
        inc{it} AS (
            SELECT e.dst AS node,
                   CAST(sum({prev}.rank_q // d.deg) AS BIGINT) AS inc
            FROM edges e
            JOIN {prev} ON e.src = {prev}.node
            JOIN deg d ON d.node = e.src
            GROUP BY e.dst
        ),
        r{it} AS (
            SELECT n.node,
                   {PR_TELEPORT_PCT * PR_SCALE // 100} + ({PR_DAMP_PCT} * coalesce(i.inc, CAST(0 AS BIGINT))) // 100 AS rank_q
            FROM nodes n LEFT JOIN inc{it} i ON n.node = i.node
        )"""


@register(
    "graph_pagerank_bipartite",
    oracle=f"""
        WITH pairs AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        edges AS (
            SELECT p * 2 AS src, s * 2 + 1 AS dst FROM pairs
            UNION ALL
            SELECT s * 2 + 1 AS src, p * 2 AS dst FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
        r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank_q FROM nodes),
        {",".join(_sql_pr_iter(f"r{i}", i + 1) for i in range(PR_ITERS))}
        SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
               node // 2 AS node_key,
               round(CAST(rank_q AS DOUBLE) / {PR_SCALE}, 6) AS rank
        FROM r{PR_ITERS}
        ORDER BY rank_q DESC, node
        LIMIT {PR_TOPK}
    """,
    tags=("graph", "iterative"),
    doc=(
        "PageRank (3 fixed power iterations, damping 0.85) over the "
        "bipartite part–supplier graph derived from lineitem — 'which "
        "parts/suppliers sit at the center of the supply network'. Scale "
        "design: the DISTINCT edge list is graph-sized (≪ fact table) and "
        "localCheckpoints once; each iteration is ONE join + integer-sum "
        "shuffle over edges co-partitioned with ranks on the join key; "
        "rank mass is int64 billionths so distributed summation is exact "
        "in any order (the float version would be run-to-run "
        "nondeterministic). Top-20 plans as TakeOrderedAndProject."
    ),
)
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    edges = (
        pairs.select((F.col("p") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst"))
        .unionByName(
            pairs.select((F.col("s") * 2 + 1).alias("src"), (F.col("p") * 2).alias("dst"))
        )
    )
    # the out-degree rides each edge via a window on src — one shuffle, no
    # separate degree aggregation + join — and the (src, dst, deg) list
    # materializes ONCE for every iteration to read, already partitioned
    # by the key each round's join uses
    from pyspark.sql import Window as W

    from currency_etl_spark.operators.ckpt import swap_checkpoint

    ed = swap_checkpoint(
        "pr_edges",
        edges.withColumn("deg", F.count(F.lit(1)).over(W.partitionBy("src"))),
    )
    # node list: tiny (|parts| + |suppliers|) but referenced every round —
    # materialize it too, or each iteration re-runs the distinct over edges
    nodes = swap_checkpoint(
        "pr_nodes", ed.select(F.col("src").alias("node")).distinct()
    )
    ranks = nodes.withColumn("rank_q", F.lit(PR_SCALE).cast("long"))
    for _ in range(PR_ITERS):
        inc = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("rank_q div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = (
            nodes.join(inc, nodes.node == inc.dst, "left")
            .select("node", F.coalesce("inc", F.lit(0)).alias("__inc"))
            .select(
                "node",
                (
                    F.lit(PR_TELEPORT_PCT * PR_SCALE // 100).cast("long")
                    + F.expr(f"(CAST({PR_DAMP_PCT} AS BIGINT) * __inc) div 100")
                ).alias("rank_q"),
            )
        )
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, "part").otherwise("supplier").alias("node_type"),
            F.expr("node div 2").alias("node_key"),
            F.round(F.col("rank_q").cast("double") / PR_SCALE, 6).alias("rank"),
            "rank_q",
            "node",
        )
        .orderBy(F.desc("rank_q"), "node")
        .limit(PR_TOPK)
        .select("node_type", "node_key", "rank")
    )
