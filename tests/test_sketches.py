"""HLL sketch aggregates (plans/sketches.py): estimates within the
configured error bound of exact distinct counts, and the merged '__all__'
sketch consistent with a direct global sketch — the mergeability contract
that makes sketches the incremental-rollup primitive at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from candyspark.plans.sketches import q_hll_sketches
from candyspark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_hll_estimates_within_bound(spark):
    got = {r.event_type: r.approx_users for r in q_hll_sketches(spark, SF_DIR).collect()}
    e = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = e.agg(F.countDistinct("user_id")).collect()[0][0]
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(0.05 * exact[k], 2), (k, est, exact[k])


def test_hll_merge_equals_direct_global_sketch(spark):
    e = load_table(spark, SF_DIR, "events")
    merged = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    direct = (
        e.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("est"))
        .collect()[0]
        .est
    )
    assert merged == direct


def test_theta_set_ops_within_bound(spark):
    from candyspark.plans.sketches import q_theta_set_ops

    row = q_theta_set_ops(spark, SF_DIR).collect()[0]
    e = load_table(spark, SF_DIR, "events")
    clickers = {r.user_id for r in e.filter(F.col("event_type") == "click").select("user_id").distinct().collect()}
    purchasers = {r.user_id for r in e.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    exact_union = len(clickers | purchasers)
    exact_inter = len(clickers & purchasers)
    assert abs(row.union_users - exact_union) <= max(0.05 * exact_union, 2)
    assert abs(row.intersect_users - exact_inter) <= max(0.05 * exact_inter, 2)


def test_bitmap_distinct_is_exact(spark):
    from candyspark.plans.sketches import q_bitmap_distinct

    got = {r.event_type: r.exact_users for r in q_bitmap_distinct(spark, SF_DIR).collect()}
    e = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert got == exact


def test_sliding_hll_wau_tracks_exact(spark):
    """The merged-sketch trailing-7d WAU must track the exact windowed
    COUNT(DISTINCT) (plans/sequences.q_active_user_windows) within the
    lgConfigK=14 error envelope on every reported day."""
    from candyspark.plans.sequences import q_active_user_windows
    from candyspark.plans.sketches import q_sliding_hll_wau

    sf = "/root/testdata/sf0.001"
    exact = {r["day"]: r["wau"] for r in q_active_user_windows(spark, sf).collect()}
    approx = {r["day"]: r["approx_wau"] for r in q_sliding_hll_wau(spark, sf).collect()}
    assert set(exact) == set(approx)
    for day, wau in exact.items():
        assert abs(approx[day] - wau) <= max(3, 0.05 * wau), (day, approx[day], wau)
