"""Sketch aggregates and binned analytics: mergeable HLL distinct-count
sketches, equi-width histograms, OHLC time bars (extension surface; the
reference's only aggregates are sum/count/countDistinct — SURVEY.md §2.5).

Why sketches are first-class at 100 TB: an exact countDistinct shuffles
every distinct value; an HLL sketch is a fixed-size (~KB) commutative
accumulator, so per-partition sketches merge in one tiny exchange AND can
be persisted per partition/day and re-merged later without rescanning —
the incremental-rollup pattern. Spark 4 ships Apache DataSketches HLL as
built-in aggregates (hll_sketch_agg / hll_union_agg / hll_sketch_estimate).
Estimates are approximate by design → rows-only driver check; the error
bound vs exact is pinned in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from candyspark.plans import QuerySpec
from candyspark.sources.readers import load_table


def q_hll_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via HLL sketches, plus the '__all__'
    row built by MERGING the per-type sketches (hll_union_agg) — proving
    the rollup needs no second scan. lgConfigK=14 → ~0.8% relative error."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count(F.lit(1)).alias("num_events"),
    )
    typed = per.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "num_events",
    )
    merged = per.agg(
        F.hll_union_agg("sk").alias("sk"), F.sum("num_events").alias("num_events")
    ).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "num_events",
    )
    return typed.unionByName(merged).orderBy("event_type")


def q_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of lineitem extended price: 24 fixed buckets of
    width 5,000, top-clamped. Fixed bounds (not data-driven min/max) keep
    the plan one-pass: a single hash aggregate on a derived int key whose
    cardinality is 24 regardless of SF — the exchange is ~constant size."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(F.floor(F.col("l_extendedprice") / 5000).cast("int"), F.lit(23))
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("num_items"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * 5000).cast("double"))
        .select("bucket", "bucket_lo", "num_items", "total_price")
        .orderBy("bucket")
    )


HISTOGRAM_PRICES_SQL = """
SELECT bucket,
       CAST(bucket * 5000 AS DOUBLE) AS bucket_lo,
       COUNT(*) AS num_items,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
FROM (
    SELECT LEAST(CAST(FLOOR(l_extendedprice / 5000) AS INT), 23) AS bucket,
           l_extendedprice
    FROM lineitem
)
GROUP BY bucket
ORDER BY bucket
"""


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type: open/close = first/last value under
    the total order (ts, event_id), high/low = max/min, volume, turnover.

    Scale: one shuffle on (hour, event_type) serves both row_number windows
    AND the final aggregate (same partitioning, AQE reuses the exchange);
    open/close via rank-1 conditional aggregation rather than a collect or
    a self-join. The (ts, event_id) tie-break makes first/last total — a
    bare first_value over ts alone is nondeterministic under equal
    timestamps, the classic silent-flakiness bug in bar builders."""
    e = load_table(spark, sf_dir, "events")
    bars = e.select(
        F.date_trunc("hour", "ts").alias("bar_start"),
        "event_type",
        "ts",
        "event_id",
        "value",
    )
    asc = Window.partitionBy("bar_start", "event_type").orderBy("ts", "event_id")
    desc = Window.partitionBy("bar_start", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        bars.withColumn("rn_a", F.row_number().over(asc))
        .withColumn("rn_d", F.row_number().over(desc))
        .groupBy("bar_start", "event_type")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("turnover"),
        )
        .orderBy("bar_start", "event_type")
    )


OHLC_BARS_SQL = """
WITH b AS (
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_start,
           event_type, ts, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
                              ORDER BY ts, event_id) AS rn_a,
           ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
)
SELECT bar_start, event_type,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS volume,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS turnover
FROM b
GROUP BY bar_start, event_type
ORDER BY bar_start, event_type
"""


REGISTRY: dict[str, QuerySpec] = {
    "hll_sketches": QuerySpec(q_hll_sketches, None),  # approximate; tests pin error
    "histogram_prices": QuerySpec(q_histogram_prices, HISTOGRAM_PRICES_SQL),
    "ohlc_bars": QuerySpec(q_ohlc_bars, OHLC_BARS_SQL),
}
