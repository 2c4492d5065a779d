"""Distributed label propagation (LPA) — community detection by plurality
vote (Raghavan et al. 2007, "Near linear time algorithm to detect community
structures"). Extension surface (SURVEY.md §2.13; no reference counterpart —
/root/reference has no graph operators at all).

Where it sits in the graph family: connected_components answers
*connectivity* ("which nodes touch at all") — the dedup-group question; LPA
answers *density* ("which nodes cluster together"), the bundle/segment
question that q_graph_modularity scores and q_kcore_parts bounds. A
co-purchase graph is usually ONE connected component; LPA splits it into
the communities the component hides.

Algorithm (synchronous, deterministic): every node starts labeled with
itself; each round every node adopts the label with the highest vote count
among its neighbors PLUS ITSELF (the self-vote damps the 2-cycle
oscillation synchronous LPA is known for on near-bipartite regions), ties
broken by the SMALLEST label. Synchronous updates + total tie order make
every round a pure function of the previous labeling — bit-identical under
repartition (pinned in tests), unlike the literature's asynchronous
variant whose result depends on visit order.

Scale design (the connected-components discipline, operators/components.py):
- Each round is one edge-keyed join + two keyed aggregates — O(|E|) work,
  no per-node state beyond (node, label).
- The plurality argmax is ``min(struct(-cnt, label))`` — one aggregate,
  no window over a node's full vote list.
- ``localCheckpoint(eager=True)`` per round truncates lineage; the
  convergence check is one driver count on the CHANGED set only and
  doubles as the materializing action.
- Rounds are bounded (default 5): LPA converges in a handful of sweeps on
  modular graphs, and a fixed bound keeps worst-case behavior predictable
  at 100 TB (the components max_iter argument, same reasoning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from candyspark.operators.components import symmetrize


def label_propagation(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 5
) -> DataFrame:
    """Synchronous LPA over an undirected view of ``edges``.

    Returns ``(node, label)`` — nodes sharing a label form one community.
    Deterministic: synchronous rounds, self-vote included, ties to the
    smallest label; independent of partitioning and join order.
    """
    und = symmetrize(edges, src, dst).localCheckpoint(eager=True)
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for rnd in range(max_rounds):
        neighbor_votes = und.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        votes = neighbor_votes.unionByName(labels.select("node", "label"))
        counted = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        new_labels = (
            counted.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg_cnt"),
                        F.col("label").alias("l"),
                    )
                ).alias("m")
            )
            .select("node", F.col("m.l").alias("label"))
            .localCheckpoint(eager=True)
        )
        last_round = rnd == max_rounds - 1
        if not last_round:
            # convergence probe (node-sized, reads two checkpoints); the
            # final round skips it — its answer could not save any work
            changed = (
                new_labels.join(
                    labels.select("node", F.col("label").alias("old")), "node"
                )
                .filter(F.col("label") != F.col("old"))
                .count()
            )
        labels = new_labels
        if not last_round and changed == 0:
            break
    return labels
