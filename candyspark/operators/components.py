"""Distributed connected components — the transitive-closure stage of
near-duplicate removal (SURVEY.md §2.13 extension surface; no reference
counterpart — /root/reference stops at exact per-key dedup semantics,
`src/data_processor.py:398`).

Why this operator exists: pairwise near-dup detectors (MinHash-LSH, n-gram
Jaccard, embedding cosine — operators/dedup.py, operators/similarity.py)
emit EDGES. Deduplication policy ("keep one document per duplicate
*group*") needs the connected components of that graph, because near-dup
similarity is not transitive: A~B and B~C does not imply A~C, yet all three
must land in one group or the kept set still contains near-dups.

Algorithm: iterative min-label propagation ("hash-to-min" one-hop variant).
Every node starts labeled with itself; each round every node takes the min
of its own label and its neighbors' labels; fixpoint = per-component min id.

Scale design:
- Rounds are O(component diameter), NOT O(graph size). Near-dup components
  are short-diameter (stars around popular templates), so 3-6 rounds is
  typical at any corpus size. For adversarial long-chain graphs the
  literature's large-star/small-star alternation (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) converges in O(log²) rounds
  — the loop below is shaped so that swap is local (one join per round
  either way).
- Each round is one shuffle-join on node id + one min-aggregate; AQE plans
  both on the same hash partitioning.
- `localCheckpoint(eager=True)` per round truncates the lineage — without
  it round N replays rounds 1..N-1 (the reference's 10-deep chained-join
  mistake, SURVEY.md §4.2, made exponential).
- The convergence check is one driver `count()` per round on the CHANGED
  set only; it doubles as the fixpoint action that materializes the
  checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge list: (a,b) ∪ (b,a), self-loops dropped, distinct."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    rev = edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    return fwd.unionByName(rev).filter(F.col("a") != F.col("b")).distinct()


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """Labels every node that appears in ``edges`` with the minimum node id
    of its connected component. Returns ``(node, component)``.

    Deterministic: the fixpoint is unique (per-component min), independent
    of partitioning and iteration order — tests pin invariance under
    `repartition`.
    """
    und = symmetrize(edges, src, dst).localCheckpoint(eager=True)
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # round-7: TWO hops per checkpoint+convergence-check (A/B'd — the
    # per-round fixed cost of checkpoint + count actions dominated these
    # short-diameter graphs; the fixpoint is hop-batching-invariant, the
    # check just happens every second hop, costing at most one extra
    # already-converged round of lazy plan)
    for _ in range(max_iter):
        cur = labels.select(
            "node", "component", F.col("component").alias("prev")
        )
        for _hop in range(2):
            nbr_min = (
                und.join(
                    cur.select("node", "component"), und["b"] == F.col("node")
                )
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("component").alias("nbr_component"))
            )
            cur = cur.join(nbr_min, "node", "left").select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
                "prev",
            )
        new_labels = cur.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("component") < F.col("prev")).count()
        labels = new_labels.drop("prev")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b"
) -> DataFrame:
    """Near-dup pairs → duplicate groups: ``(doc_id, cluster_id,
    cluster_size)`` for every document that appears in at least one pair.
    ``cluster_id`` is the min doc id of the group (the canonical survivor
    under keep-lowest policy)."""
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
        )
    )
