"""Graph operators over edge DataFrames.

Corpus curation meets graphs in two places: duplicate clusters
(``dedup.connected_components``) and LINK-BASED QUALITY WEIGHTING — the
CommonCrawl lineage of "a page many reputable pages link to is likelier
to be worth training on" (PageRank; Page et al. 1999). This module adds
the latter as a Spark-native power iteration.

Scale shape per iteration: ONE join (edges ⋈ ranks, both pre-partitioned
on src) + one ``groupBy(dst)`` — two hash shuffles over the edge list,
nothing ever quadratic. Ranks/degrees are node-sized frames. Each
iteration ``localCheckpoint``s to truncate lineage (iteration i must not
re-execute i-1). Dangling nodes (no out-edges) redistribute their mass
uniformly — the standard stochastic-matrix fix, without which rank mass
leaks and the vector no longer sums to n. The dangling mass rides the
rank-update job as a broadcast one-row aggregate (never a separate
``.collect()`` round-trip): with ``tol=None`` each iteration is a single
driver action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float | None = 1e-6,
) -> DataFrame:
    """PageRank over a directed edge list; returns (id, rank) with ranks
    normalized to sum to the node count (the classic convention: a
    rank of 1.0 = "averagely linked").

    Iterates ``rank' = (1-d) + d * (M^T rank + dangling_mass / n)`` until
    ``max_iterations`` or the L1 delta falls under ``tol`` (the delta
    check is one tiny aggregate per round; pass ``tol=None`` to skip it
    and always run the fixed iteration count — cheaper when the round
    count is tuned already)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("t").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # edges annotated once with the source out-degree; reused every round
    contrib_edges = e.join(out_deg, "s").localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0)).localCheckpoint()

    for _ in range(max_iterations):
        with_rank = contrib_edges.join(
            ranks.withColumnRenamed("id", "s"), "s"
        ).select("t", (F.col("rank") / F.col("deg")).alias("c"))
        inbound = with_rank.groupBy("t").agg(F.sum("c").alias("inflow"))
        # dangling mass: rank sitting on nodes with no out-edges —
        # a broadcast ONE-ROW aggregate folded into the rank-update job
        # (a separate .collect() here would double the driver
        # round-trips per iteration for a scalar)
        dangling = (
            ranks.join(out_deg, ranks.id == out_deg.s, "left_anti")
            .agg(
                (F.coalesce(F.sum("rank"), F.lit(0.0)) / F.lit(float(n))).alias(
                    "__dangling_per_node"
                )
            )
        )
        new_ranks = (
            nodes.join(inbound, nodes.id == inbound.t, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("__dangling_per_node")
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        if tol is not None:
            delta = (
                new_ranks.withColumnRenamed("rank", "nr")
                .join(ranks, "id")
                .agg(F.sum(F.abs(F.col("nr") - F.col("rank"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta < tol * n:
                break
        else:
            ranks = new_ranks
    return ranks
