"""Round-3 behavioral tests: planted-signal and bound-pinning checks for the
queries re-parameterized or added this round (round-2 verdict items 2/3/5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

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


def _lineitem(spark, tmp_path, rows):
    """Minimal planted lineitem: (orderkey, linenumber, returnflag,
    linestatus, quantity, extendedprice)."""
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_linestatus string, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_partkey long, l_suppkey long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_kruskal_wallis_detects_planted_shift(spark, tmp_path):
    """Planted signal: cohort 'A' quantities shifted far above 'N'/'R' →
    H must exceed the χ²(2) critical value; identical cohorts → small H."""
    shifted = [
        (i, 1, flag, "F", float(q), 100.0, 0.0, 0.0, 1, 1)
        for i, (flag, q) in enumerate(
            [("A", 40 + (i % 5)) for i in range(60)]
            + [("N", 10 + (i % 5)) for i in range(60)]
            + [("R", 12 + (i % 5)) for i in range(60)]
        )
    ]
    sf = _lineitem(spark, tmp_path, shifted)
    row = REGISTRY["kruskal_wallis"].fn(spark, sf).collect()[0]
    assert row.distributions_differ
    assert row.h_statistic > 50  # massive separation

    same = [
        (i, 1, flag, "F", float(10 + (i % 7)), 100.0, 0.0, 0.0, 1, 1)
        for i, flag in enumerate(["A", "N", "R"] * 60)
    ]
    sf2 = _lineitem(spark, tmp_path / "same", same)
    row2 = REGISTRY["kruskal_wallis"].fn(spark, sf2).collect()[0]
    assert not row2.distributions_differ


def test_iv_2sls_recovers_planted_effect(spark, tmp_path):
    """Planted causal structure: purchases x = signups z (perfect first
    stage), spend y = 5·x exactly → iv_beta must recover 5.0 and the
    first stage must be strong."""
    rows = []
    eid = 0
    for u in range(200):
        z = u % 4  # 0..3 signups
        for _ in range(z):
            rows.append((eid, "2024-01-05 00:00:00", u, "signup", 0.0, "{}"))
            eid += 1
        for _ in range(z):  # purchases driven by the instrument
            rows.append((eid, "2024-01-06 00:00:00", u, "purchase", 5.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    row = REGISTRY["iv_2sls"].fn(spark, str(tmp_path)).collect()[0]
    assert row.iv_beta == pytest.approx(5.0, abs=1e-6)
    assert row.first_stage_coef == pytest.approx(1.0, abs=1e-6)
    # a PERFECT first stage reports NULL F (infinite) by the guard
    assert row.first_stage_f is None


def test_decile_lift_orders_planted_quality(spark, tmp_path):
    """Planted ranking signal: English docs get long, clean text (high
    quality score); others get terse junk → the top decile must be
    English-enriched (lift > 1) and cum_gain must be monotone to 1."""
    texts, langs = [], []
    for i in range(200):
        if i % 2 == 0:
            texts.append("the quick brown fox jumps over the lazy dog " * 8)
            langs.append("en")
        else:
            texts.append("x! y? z.")
            langs.append("de")
    import tests.test_round2_ops as r2

    sf = r2._docs(spark, tmp_path, texts, langs)
    rows = REGISTRY["decile_lift"].fn(spark, sf).collect()
    assert rows[0].lift > 1.5  # top decile pure English
    gains = [r.cum_gain for r in rows]
    assert gains == sorted(gains) and gains[-1] == pytest.approx(1.0)


def test_entropy_profile_planted_degenerate_column(spark, tmp_path):
    """A constant column must profile at exactly 0 entropy; a uniform
    two-value column at ln(2)-normalized 1.0."""
    rows = [
        (i, 1, "A", "F" if i % 2 == 0 else "O", 1.0, 10.0, 0.0, 0.0, 1, 1)
        for i in range(100)
    ]
    sf = _lineitem(spark, tmp_path, rows)
    o = spark.createDataFrame(
        [(i, i, "O", 10.0, "2024-01-01", "1-URGENT") for i in range(10)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    o.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {r.col: r for r in REGISTRY["entropy_profile"].fn(spark, sf).collect()}
    assert got["l_returnflag"].entropy == 0.0  # constant column
    assert got["l_returnflag"].cardinality == 1
    assert got["l_linestatus"].normalized_entropy == pytest.approx(1.0, abs=1e-6)
    assert got["o_orderstatus"].entropy == 0.0


def test_importance_resampling_prefers_quality(spark, tmp_path):
    """Planted quality split: high-quality source must keep a much larger
    fraction than junk, and the kept mean quality can't fall below the
    before mean."""
    texts, langs = [], []
    for i in range(400):
        if i < 200:
            texts.append("the quick brown fox jumps over the lazy dog " * 6)
        else:
            texts.append("!!!! ?? ..")
        langs.append("en")
    import tests.test_round2_ops as r2

    # _docs assigns source per doc id — regroup into two sources
    rows = [
        (i, t, "en", "good" if i < 200 else "junk", len(t))
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.source: r
        for r in REGISTRY["importance_resampling"].fn(spark, str(tmp_path)).collect()
    }
    assert got["good"].kept_rate > 0.5
    assert got["junk"].kept_rate < 0.1
    for r in got.values():
        if r.n_kept > 0:
            assert r.mean_quality_kept >= r.mean_quality_before - 1e-9
