"""Link-graph ranking: GSE's backlink rank done right, plus PageRank.

The reference intended a backlink-weighted rank
(reference crawler/src/api/main.go:97-111):
``rank(p) = 0.85 * (1 + sum_b relevance(b) / backlinkCount(b))`` over
the pages linking to p — but its Go map was keyed wrong, so every page
got a near-identical rank (SURVEY.md R6), and nothing ever populated
the backlinks table. Here the same semantics are two joins and an
aggregation; the N+1 per-candidate edge queries (api/main.go:74-83)
collapse into one shuffle.

Scale: edges join on src/dst keys; out-degree is a groupBy; a damped
K-iteration PageRank is K rounds of (join + agg) over the same edge
partitioning — Spark reuses the shuffle partitioning across
iterations when the key stays stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85  # rankerConstant, api/main.go:99
RATING = 1.0    # ratingFactor, api/main.go:98


def backlink_counts(edges: DataFrame) -> DataFrame:
    """In-degree per destination — GSE's backlink hash count
    (api/main.go:74-83) as one aggregation."""
    return edges.groupBy("dst").agg(F.count("*").alias("n_backlinks"))


def gse_link_rank(edges: DataFrame, scores: DataFrame,
                  damping: float = DAMPING,
                  rating: float = RATING) -> DataFrame:
    """One damped pass: rank(dst) = d * (rating + sum_src score/outdeg).

    ``edges``: (src, dst); ``scores``: (src, score) — the 'relevance'
    of each linking node. Returns (dst, rank)."""
    outd = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    return (
        edges.join(outd, "src")
        .join(scores, "src")
        .groupBy("dst")
        .agg(
            F.round(
                damping * (rating + F.sum(F.col("score") / F.col("outdeg"))),
                6,
            ).alias("rank")
        )
    )


def pagerank(edges: DataFrame, iterations: int = 10,
             damping: float = DAMPING) -> DataFrame:
    """Classic damped PageRank over (src, dst) edges, K iterations.

    Dangling nodes (no out-edges) redistribute uniformly. Returns
    (node, rank) summing to ~n_nodes."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    outd = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # pre-partition edges by src once; every iteration joins on src
    ranked_edges = edges.join(outd, "src").persist()

    ranks = nodes.withColumn("rank", F.lit(1.0))
    for it in range(iterations):
        if it and it % 3 == 0:
            # truncate lineage: without this the plan deepens linearly
            # (every iteration re-derives all previous ones) and 10+
            # iterations on a big graph re-execute the whole chain
            ranks = ranks.localCheckpoint()
        contribs = (
            ranked_edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        dangling = (
            ranks.join(outd, ranks.node == outd.src, "left_anti")
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        ranks = (
            nodes.join(
                contribs.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node",
                (
                    F.lit(1 - damping)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0))
                       + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
    return ranks
