"""Round-4 session-5 behavioral tests.

Covers the approx-percentile swap-in twins (round-3 verdict item 5): the
`_approx` registry queries must (a) report every accuracy-contract boolean
True on real data, and (b) produce sketch values genuinely close to the
exact statistics — a tolerance-banded check that the 100-TB path computes
the same quantity, not merely lands inside its own generous band.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from candyspark.plans import collect_registry

REGISTRY = collect_registry()
SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# approx swap-in twins
# ---------------------------------------------------------------------------


def test_robust_stats_approx_contract_holds(spark):
    rows = REGISTRY["robust_stats_approx"].fn(spark, SF).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.q1_in_band and r.med_in_band and r.q3_in_band, r
        # bands are proper intervals derived from exact quantiles
        assert r.q1_band_lo <= r.q1_band_hi <= r.med_band_lo <= r.med_band_hi
        assert r.med_band_hi <= r.q3_band_lo <= r.q3_band_hi


def test_robust_stats_approx_close_to_exact(spark):
    exact = {
        r.l_returnflag: r
        for r in REGISTRY["robust_stats"].fn(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    approx = {
        r.l_returnflag: r.qa
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 1000).alias(
                "qa"
            )
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, (q1a, meda, q3a) in approx.items():
        e = exact[flag]
        # 1% relative tolerance — far tighter than the rank band, and the
        # falsifier for "sketch computes a different quantity"
        assert abs(q1a - e.q1) <= 0.01 * e.q1
        assert abs(meda - e.median_price) <= 0.01 * e.median_price
        assert abs(q3a - e.q3) <= 0.01 * e.q3


def test_quantile_normalize_approx_contract_holds(spark):
    rows = REGISTRY["quantile_normalize_approx"].fn(spark, SF).collect()
    assert len(rows) == 21
    assert all(r.in_band for r in rows), [r for r in rows if not r.in_band]
    # grid monotone: band bounds non-decreasing across p
    los = [r.band_lo for r in sorted(rows, key=lambda r: r.p)]
    assert los == sorted(los)


def test_distribution_distance_approx_contract_and_anchors(spark):
    twin = REGISTRY["distribution_distance_approx"].fn(spark, SF).collect()[0]
    base = REGISTRY["distribution_distance"].fn(spark, SF).collect()[0]
    assert twin.w1_in_bound and twin.ks_in_bound
    # the twin's exact anchors are bit-identical to the exact query's
    assert twin.wasserstein_grid == base.wasserstein_grid
    assert twin.max_quantile_gap == base.max_quantile_gap
    assert twin.n_returned == base.n_returned
    assert twin.n_kept == base.n_kept


def test_approx_band_falsifies_broken_path(spark):
    """The contract is not vacuous: a sketch queried at the WRONG prob
    (0.75 where the band expects 0.25) must land outside the band."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    from candyspark.operators.quantiles import exact_quantiles_grouped

    bands = (
        exact_quantiles_grouped(
            spark,
            li.select("l_returnflag", "l_extendedprice"),
            "l_returnflag",
            "l_extendedprice",
            [0.24, 0.26],
        )
        .groupBy("l_returnflag")
        .pivot("p", [0.24, 0.26])
        .agg(F.first("value"))
    )
    wrong = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.75, 1000).alias("v")
    )
    joined = wrong.join(bands, "l_returnflag").select(
        ((F.col("v") >= F.col("`0.24`")) & (F.col("v") <= F.col("`0.26`"))).alias(
            "in_band"
        )
    )
    assert not any(r.in_band for r in joined.collect())
