"""PageRank operator tests: agreement with a dense numpy power iteration,
exact invariance under repartitioning (the decimal-snap discipline), and
mass conservation on symmetric graphs."""

from __future__ import annotations

import numpy as np
import pytest

from candyspark.operators.components import symmetrize
from candyspark.operators.pagerank import pagerank

EDGES = [  # two hubs (1, 5) bridged by 3; 6 is a spoke
    (1, 2),
    (1, 3),
    (2, 1),
    (3, 1),
    (3, 5),
    (4, 5),
    (5, 4),
    (5, 6),
    (6, 5),
]


def numpy_pagerank(edges, d=0.85, iters=8):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for a, _ in edges:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        for a, b in edges:
            nxt[idx[b]] += d * r[idx[a]] / out_deg[idx[a]]
        r = nxt
    return {node: r[idx[node]] for node in nodes}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = pagerank(df, "src", "dst", **kw).collect()
    return {r["node"]: r["rank"] for r in got}


def test_matches_numpy_power_iteration(spark):
    got = _run(spark, EDGES)
    want = numpy_pagerank(EDGES)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-9), node


def test_ranking_order_is_sane(spark):
    got = _run(spark, EDGES)
    # 5 has three in-edges (3, 4, 6) — top of the graph; 4 and 6 are
    # structurally identical (fed only by 5, feed only 5) so tie exactly;
    # 2 and 3 are fed only by 1's split mass and sit at the bottom
    assert got[5] == max(got.values())
    assert got[4] == got[6]
    assert got[2] == got[3]
    assert got[5] > got[1] > got[2]


def test_exact_invariance_under_repartition(spark):
    df = spark.createDataFrame(EDGES, "src bigint, dst bigint")
    a = {r["node"]: r["rank"] for r in pagerank(df, "src", "dst").collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank(df.repartition(13), "src", "dst").collect()
    }
    assert a == b  # bit-identical, not approx — the decimal-snap contract


def test_symmetric_graph_conserves_mass(spark):
    df = symmetrize(spark.createDataFrame(EDGES, "src bigint, dst bigint"), "src", "dst")
    ranks = _run(spark, [(r["a"], r["b"]) for r in df.collect()])
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
