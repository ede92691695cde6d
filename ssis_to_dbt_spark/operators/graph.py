"""Iterative graph operators over edge DataFrames.

Companion to ``text.dedup.connected_components`` (min-label propagation):
this module holds the value-iterating algorithms, starting with PageRank.
Iterative algorithms are usually written off as unverifiable by a SQL
oracle; the decimal-summed formulation below keeps every iteration
bit-reproducible, so a fixed-iteration unrolled SQL oracle checks it
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list (pass both
    directions for an undirected graph).  Returns ``(node, rank)``.

    Scale shape: each iteration is one join on ``src`` + one aggregation on
    ``dst`` — the standard message-passing round, linear in edges, with
    ``localCheckpoint`` truncating lineage so the plan stays flat across
    iterations.

    Determinism: the per-edge contribution ``rank/degree`` is per-row double
    math (bit-identical for identical inputs), but SUMMING doubles is
    aggregation-order dependent — so each contribution is cast to
    DECIMAL(28,18) first (a double can never sit exactly on a scale-18
    decimal midpoint, so the cast rounds identically everywhere) and the
    DECIMAL sum is exact at any partitioning.  The new rank re-enters double
    land through one cast.  Result: every iteration's ranks are
    bit-reproducible across engines, partition counts, and retries.

    Dangling nodes (no out-edges) leak their rank mass, as in the classic
    formulation; an edge list built from symmetric pairs has none.
    """
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "_src"), "_src")
            .join(deg, "_src")
            .select(
                F.col("_dst").alias("node"),
                (F.col("rank") / F.col("_deg"))
                .cast("decimal(28,18)")
                .alias("_c"),
            )
        )
        agg = contrib.groupBy("node").agg(F.sum("_c").alias("_sum"))
        ranks = (
            nodes.join(agg, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * F.coalesce(F.col("_sum").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
