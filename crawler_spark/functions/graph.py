"""Link-graph analytics: PageRank-style host ranking for crawl
prioritization (the score a production frontier joins against its
priority column — SURVEY.md F1/F5; the reference's static two-level
priority is the degenerate case).

Integer fixed-point throughout: ranks are micro-units (1e6 = 1.0) and
every step is floor-divided, so the result is bit-identical across
engines and across partitionings — no float summation order anywhere.
This is the property that makes an *iterative* Spark job
oracle-checkable: the DuckDB twin unrolls the same iterations as chained
CTEs and must match hash-for-hash.

Scale shape: each iteration is one join edges⋈ranks on src (ranks is the
small side early on — broadcastable; AQE decides) plus one groupBy dst
with map-side partial sums.  Lineage grows linearly with iterations;
``checkpoint_every`` truncates it with localCheckpoint so 50-iteration
runs don't replan O(n²) DAGs.  Dangling mass is dropped (simplified
PageRank), matching the unrolled oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_MICRO = 1_000_000


def pagerank_micro(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-point PageRank over ``edges (src, dst)``.  Returns
    ``(node, rank_micro)`` for every node appearing as src or dst.

    Per iteration, in integers only:
        contrib(e)  = floor(rank(src) / out_deg(src))
        rank'(n)    = floor((100-d)*1e6 / 100)
                      + floor(d * sum(contrib over in-edges) / 100)
    """
    edges = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    teleport = (100 - damping_pct) * BASE_MICRO // 100

    ranks = nodes.withColumn("rank_micro", F.lit(BASE_MICRO).cast("long"))
    for i in range(iterations):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank_micro") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.floor(
                    F.lit(damping_pct) * F.coalesce(F.col("csum"), F.lit(0)) / 100
                )
            ).cast("long").alias("rank_micro"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
