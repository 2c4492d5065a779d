"""Distributed PageRank (power iteration) — the graph-centrality companion
to the dedup component finder (operators/components.py). No reference
counterpart (extension surface, SURVEY.md §2.13): the use case here is
ranking nodes of a similarity / co-occurrence graph (e.g. "most central
products" over market-basket edges, or hub documents in a near-dup graph).

Scale design mirrors connected_components:
- Each iteration is ONE shuffle: per-edge contributions grouped by
  destination. The degree attach is pre-joined once OUTSIDE the loop, so
  the loop body re-shuffles only (node, rank).
- ``localCheckpoint(eager=True)`` per round truncates lineage (without it
  round N replays rounds 1..N-1).
- Fixed iteration count, no driver-side convergence scan — at 100 TB the
  delta check would be an extra action per round; 8-12 rounds is the
  standard operating point.

Determinism: floating-point `sum` is partitioning-order-dependent, so each
round snaps (a) per-edge contributions to exact DECIMAL(24,14) before the
sum — decimal addition is associative, the double sum is not — and (b) the
resulting rank to 12 dp. Ranks are then bit-identical under repartition
(pinned in tests), which is what makes an iterative float algorithm
testable at all.

Simplified variant: dangling-node mass is not redistributed (nodes with no
out-edges leak their rank). On the symmetrized graphs this engine feeds it
(co-occurrence, similarity), every node has out-degree ≥ 1, so the
simplification is exact there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _snap12(c):
    return F.round(c.cast("decimal(28,14)"), 12).cast("double")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 8,
) -> DataFrame:
    """Rank every node of the directed edge list. Returns ``(node, rank)``."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("out_deg"))
    # degree rides on the edges once; the loop never re-joins it
    ew = e.join(deg, "s").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("t").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:  # empty graph: stable (node, rank) schema, zero rows
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            ew.join(ranks, ew["s"] == ranks["node"])
            .select(
                F.col("t").alias("node"),
                (F.col("rank") / F.col("out_deg")).cast("decimal(24,14)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                _snap12(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_mass").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
