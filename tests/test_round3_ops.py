"""Round-3 behavioral tests: planted-signal and bound-pinning checks for the
queries re-parameterized or added this round (round-2 verdict items 2/3/5)."""

from __future__ import annotations

import math

import pytest

from candyspark.plans import collect_registry

REGISTRY = collect_registry()
SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.1"


@pytest.mark.parametrize(
    "sf_dir,n_vectors", [(SF1, 500), (SF2, 2000)], ids=["sf0.001", "sf0.1"]
)
def test_semantic_dedup_centroids_scale_with_corpus(spark, sf_dir, n_vectors):
    """n_centroids = ceil(sqrt(n)) at two corpus sizes (verdict item 3):
    the quantizer must grow with the corpus so the within-cluster pair
    join stays bounded — a fixed constant degenerates toward all-pairs/k."""
    k = math.ceil(math.sqrt(n_vectors))
    out = REGISTRY["semantic_dedup"].fn(spark, sf_dir)
    rows = out.select("cluster_id").distinct().collect()
    cluster_ids = {r.cluster_id for r in rows}
    # every assignment lands on a seeded centroid, and the seeds are the
    # lowest-id vectors — so ids live in [0, k) and (almost) all are used
    assert max(cluster_ids) < k
    assert len(cluster_ids) > k // 2  # the quantizer actually spreads


def test_semantic_dedup_cluster_bound_holds(spark):
    """The √n rule keeps the biggest cluster near √n (the IVF balance
    point) rather than n/16 — the structural claim behind the rewrite."""
    out = REGISTRY["semantic_dedup"].fn(spark, SF1)
    sizes = out.groupBy("cluster_id").count().collect()
    n = sum(r["count"] for r in sizes)
    assert n == 500
    # uniform-ish synthetic embeddings: no cluster should swallow the
    # corpus (the hard-coded-16 failure mode would put ~31 rows/cluster
    # at this size; we only require the bound is not catastrophically
    # broken, since real cluster balance is data-dependent)
    assert max(r["count"] for r in sizes) < n / 2


def test_robust_outliers_flags_planted_extreme(spark):
    """The re-parameterized 1.3 cutoff (verdict item 2) actually fires:
    the flagged set is the extreme price tail, non-empty, and every
    flagged |modified z| exceeds the cutoff."""
    out = REGISTRY["robust_outliers"].fn(spark, SF1).collect()
    assert len(out) > 0
    assert all(abs(r.modified_z) > 1.3 for r in out)


def test_max_drawdown_is_positive(spark):
    """The level-series rewrite (verdict item 2): daily revenue
    fluctuates, so the deepest fall from a prior peak must be > 0 — the
    old cumulative-sum form was identically 0 by construction."""
    row = REGISTRY["max_drawdown"].fn(spark, SF1).collect()[0]
    assert row.max_drawdown > 0.0


def test_retention_cohorts_weekly_matrix(spark):
    """Week-grain cohorts (verdict item 2): the fixture spans ~5 ISO
    weeks, so the retention triangle must have >1 row and weeks_since
    must cover more than just 0."""
    rows = REGISTRY["retention_cohorts"].fn(spark, SF1).collect()
    assert len(rows) > 1
    assert max(r.weeks_since for r in rows) >= 1
    assert all(r.active_users > 0 for r in rows)


@pytest.mark.parametrize("sf_dir", [SF1, "/root/testdata/sf0.01"])
def test_markov_pivot_search_selects_natural_order(spark, sf_dir):
    """The markov_attribution SQL oracle unrolls a NO-pivot Gauss-Jordan;
    it is bit-exact against the driver solve only while the driver's
    partial-pivot search selects the natural row order. Assert that on
    the fixture chains (diagonally dominant) it always does — if a future
    fixture breaks this, the oracle must grow the pivot CASEs."""
    import duckdb

    from candyspark.plans.ml import _CHANNELS

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    counts = con.execute("""
        WITH first_p AS (
          SELECT user_id, MIN(ts) AS p_ts FROM events
          WHERE event_type='purchase' GROUP BY user_id),
        ev AS (
          SELECT e.user_id, e.event_type, e.ts, e.event_id
          FROM events e LEFT JOIN first_p USING (user_id)
          WHERE e.event_type IN ('click','signup','view','purchase')
            AND (p_ts IS NULL OR e.ts <= p_ts)),
        seq AS (
          SELECT event_type AS state,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_state
          FROM ev)
        SELECT src, dst, COUNT(*) FROM (
          SELECT state AS src, COALESCE(next_state,'NULL') AS dst
          FROM seq WHERE state != 'purchase'
          UNION ALL SELECT 'START', state FROM seq WHERE rn = 1
        ) GROUP BY 1, 2
    """).fetchall()
    states = ["START", *_CHANNELS]
    mat = {s: {} for s in states}
    for src, dst, n in counts:
        if src in mat:
            mat[src][dst] = n
    for removed in [None, *_CHANNELS]:
        n = len(states)
        A = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
        for i, s in enumerate(states):
            if s == removed:
                continue
            row = mat[s]
            tot = sum(row.values())
            for dst, c in sorted(row.items()):
                if dst in states and dst != removed:
                    A[i][states.index(dst)] -= c / tot
        for col in range(n):
            r_max = max(range(col, n), key=lambda r: abs(A[r][col]))
            assert abs(A[r_max][col]) >= 1e-12, (removed, col)
            assert r_max == col, (removed, col, r_max)
            piv = A[col][col]
            for r2 in range(n):
                if r2 == col:
                    continue
                f = A[r2][col] / piv
                for c2 in range(n):
                    A[r2][c2] -= f * A[col][c2]


def test_heaps_law_trigram_beta_nonzero(spark):
    """Trigram vocabulary (verdict item 2): the fitted Heaps beta must
    show real vocabulary growth (the unigram form saturated at beta=0)."""
    row = REGISTRY["heaps_law"].fn(spark, SF1).collect()[0]
    assert 0.5 < row.heaps_beta < 1.0
