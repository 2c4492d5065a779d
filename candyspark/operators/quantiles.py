"""Distributed EXACT multi-quantile extraction — the scale-true form of
``F.percentile`` for single-group quantiles.

Spark's exact ``percentile`` is a holistic aggregate: every partial ships its
full value buffer and the final merge concentrates ALL values in one task —
measured at 5-8 s per query at sf0.1 (robust_stats, distribution_distance)
and structurally unable to scale (the buffer IS the data). This operator
computes the same interpolated quantiles (the (n−1)·p convention, matching
both Spark's percentile and DuckDB's quantile_cont) by ORDER-STATISTIC
EXTRACTION instead:

1. bucket every value by a VALUE-MONOTONE coarse key (equi-width over the
   1-row min/max — bucket order extends value order, the same prefix trick
   as the distributed global rank in triplet_sampling);
2. count per bucket (a tiny aggregate) and take cumulative offsets over the
   ≤n_buckets frame;
3. locate each needed integer rank's bucket by binary comparison against the
   broadcast offsets — only ~2×|probs| ranks exist;
4. filter the fact rows to the NEEDED buckets only (a scan-stage predicate —
   for 101 quantiles that is ≤202 buckets of data, a vanishing fraction at
   scale), rank within each needed bucket (a PARTITIONED window, bounded by
   bucket width), and join out the hit values;
5. interpolate pairs driver-free (the result frame is |probs| rows).

No step ever holds more than one bucket of values in one task. The only
driver interaction is collecting the |probs|-row result — same as any
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _rank_exprs(discrete: bool) -> tuple:
    """(k_lo, k_hi, h) expressions over columns n (count) and p (prob).

    Continuous (default): the (n−1)·p interpolation convention of Spark's
    ``percentile`` / DuckDB ``quantile_cont``. Discrete: the smallest value
    whose cume_dist ≥ p — 0-based rank ceil(n·p)−1 computed in DOUBLE,
    which matches Spark's ``percentile_disc`` exactly (k_lo = k_hi, so the
    interpolation term vanishes and an ACTUAL data value crosses the
    engine boundary). CAVEAT: at float-boundary probs the two reference
    engines themselves disagree — e.g. n=100, p=0.07: double math gives
    ceil(7.000000000000001)=8 (Spark and this extractor) while DuckDB's
    PERCENTILE_DISC returns the 7th value — so pair discrete mode with a
    DuckDB oracle only at probs whose n·p stays float-exact (the
    registry's 0.05/0.95 uses are verified at both driver SFs)."""
    if discrete:
        k = F.greatest(F.ceil(F.col("n") * F.col("p")) - 1, F.lit(0)).cast("long")
        k = F.least(k, F.col("n") - 1)
        return k.alias("k_lo"), k.alias("k_hi"), k.cast("double").alias("h")
    k_lo = F.floor((F.col("n") - 1) * F.col("p")).cast("long")
    k_hi = F.least(
        F.floor((F.col("n") - 1) * F.col("p")) + 1, F.col("n") - 1
    ).cast("long")
    return (
        k_lo.alias("k_lo"),
        k_hi.alias("k_hi"),
        ((F.col("n") - 1) * F.col("p")).alias("h"),
    )


def exact_quantiles(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    probs: list[float],
    n_buckets: int = 4096,
    out_prob: str = "p",
    out_value: str = "value",
    discrete: bool = False,
) -> DataFrame:
    """Interpolated exact quantiles of ``df[value_col]`` at ``probs``.

    Returns a DataFrame (prob double, value double) with one row per prob,
    equal to ``F.percentile(value_col, probs)`` / DuckDB ``quantile_cont``.
    NULLs are excluded (both references do the same); NaNs are excluded too
    (they would poison the min/max bucket bounds — callers that need
    NaN-propagation semantics must pre-filter or pre-map them).
    """
    vals = df.select(F.col(value_col).cast("double").alias("v")).filter(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    # the tiny intermediates (1-row bounds, ≤n_buckets offsets, ≤2|probs|
    # locations) each feed several consumers — materialized once so the
    # FACT passes stay exactly two: the bucket count and the extraction
    # (lineage re-derivation otherwise re-scans the input per consumer:
    # measured 21 scans in the naive plan).
    bounds = vals.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n")
    ).localCheckpoint()
    # value-monotone bucket key; the hi row lands in the last bucket
    with_b = vals.crossJoin(F.broadcast(bounds)).select(
        "v",
        F.least(
            F.floor((F.col("v") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / n_buckets + 1e-300)),
            F.lit(n_buckets - 1),
        )
        .cast("int")
        .alias("b"),
        "n",
    )
    counts = with_b.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    # offsets has ONE consumer (the located join, itself checkpointed):
    # no materialization needed — located's checkpoint cuts this lineage
    offsets = counts.select(
        "b", "cnt", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )

    # the ≤2·|probs| integer ranks we actually need: floor((n−1)p), +1
    probs_df = spark.createDataFrame([(float(p),) for p in probs], "p double")
    k_lo_e, k_hi_e, h_e = _rank_exprs(discrete)
    ranks = probs_df.crossJoin(F.broadcast(bounds)).select("p", k_lo_e, k_hi_e, h_e)
    needed = (
        ranks.select(F.col("k_lo").alias("k"))
        .unionByName(ranks.select(F.col("k_hi").alias("k")))
        .distinct()
    )
    located = (
        needed.join(
            F.broadcast(offsets),
            (F.col("k") >= F.col("off")) & (F.col("k") < F.col("off") + F.col("cnt")),
        )
        .select("k", "b", (F.col("k") - F.col("off")).alias("local_rank"))
        .localCheckpoint()
    )

    needed_buckets = located.select("b").distinct()
    w_in = Window.partitionBy("b").orderBy("v")
    hits = (
        with_b.join(F.broadcast(needed_buckets), "b")
        .withColumn("local_rank", F.row_number().over(w_in) - 1)
        .join(located, ["b", "local_rank"])
        .select("k", "v")
        .localCheckpoint()  # |needed ranks| rows; feeds both interpolation sides
    )
    kv_lo = hits.select(F.col("k").alias("k_lo"), F.col("v").alias("v_lo"))
    kv_hi = hits.select(F.col("k").alias("k_hi"), F.col("v").alias("v_hi"))
    return (
        ranks.join(F.broadcast(kv_lo), "k_lo")
        .join(F.broadcast(kv_hi), "k_hi")
        .select(
            F.col("p").alias(out_prob),
            (
                F.col("v_lo")
                + (F.col("h") - F.col("k_lo")) * (F.col("v_hi") - F.col("v_lo"))
            ).alias(out_value),
        )
        .orderBy(out_prob)
    )


def exact_quantiles_grouped(
    spark: SparkSession,
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: list[float],
    n_buckets: int = 4096,
    out_prob: str = "p",
    out_value: str = "value",
    discrete: bool = False,
    bounds_df: DataFrame | None = None,
) -> DataFrame:
    """Per-GROUP distributed exact quantiles: the grouped generalization of
    ``exact_quantiles`` — every step gains the group key, nothing else
    changes. Per-group bounds come from one aggregate; buckets key on
    (group, bucket); offsets window PARTITIONED by group (the frame is
    groups × occupied-buckets, never rows); ranks derive per group from
    its own n; extraction ranks within (group, bucket). No task ever
    buffers more than one (group, bucket) — the per-group holistic
    ``percentile`` instead buffers each group's ENTIRE column in the task
    that finalizes it (robust_stats' documented cost).

    Returns (group, prob, value), equal per group to F.percentile /
    quantile_cont.
    """
    g = F.col(group_col).alias("grp")
    vals = df.select(g, F.col(value_col).cast("double").alias("v")).filter(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    if bounds_df is not None:
        # caller-supplied (group, lo, hi, n): skips this function's bounds
        # scan entirely. lo/hi may over-cover ([lo, hi] ⊇ the true value
        # range keeps the bucket key monotone, just coarser); n MUST equal
        # the exact non-null count — ranks derive from it.
        bounds = bounds_df.select(
            F.col(group_col).alias("grp"),
            F.col("lo").cast("double"),
            F.col("hi").cast("double"),
            F.col("n").cast("long"),
        )
    else:
        bounds = (
            vals.groupBy("grp")
            .agg(
                F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n")
            )
            .localCheckpoint()
        )
    with_b = vals.join(F.broadcast(bounds), "grp").select(
        "grp",
        "v",
        F.least(
            F.floor(
                (F.col("v") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / n_buckets + 1e-300)
            ),
            F.lit(n_buckets - 1),
        )
        .cast("int")
        .alias("b"),
    )
    counts = with_b.groupBy("grp", "b").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("grp").orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    )
    # single consumer (located, checkpointed) — no materialization needed
    offsets = counts.select(
        "grp", "b", "cnt", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )

    probs_df = spark.createDataFrame([(float(p),) for p in probs], "p double")
    k_lo_e, k_hi_e, h_e = _rank_exprs(discrete)
    ranks = probs_df.crossJoin(F.broadcast(bounds)).select(
        "grp", "p", k_lo_e, k_hi_e, h_e
    )
    needed = (
        ranks.select("grp", F.col("k_lo").alias("k"))
        .unionByName(ranks.select("grp", F.col("k_hi").alias("k")))
        .distinct()
    )
    located = (
        needed.join(
            F.broadcast(offsets),
            (needed["grp"] == offsets["grp"])
            & (F.col("k") >= F.col("off"))
            & (F.col("k") < F.col("off") + F.col("cnt")),
        )
        .select(needed["grp"], "k", "b", (F.col("k") - F.col("off")).alias("local_rank"))
        .localCheckpoint()
    )

    needed_buckets = located.select("grp", "b").distinct()
    w_in = Window.partitionBy("grp", "b").orderBy("v")
    hits = (
        with_b.join(F.broadcast(needed_buckets), ["grp", "b"])
        .withColumn("local_rank", F.row_number().over(w_in) - 1)
        .join(located, ["grp", "b", "local_rank"])
        .select("grp", "k", "v")
        .localCheckpoint()
    )
    kv_lo = hits.select("grp", F.col("k").alias("k_lo"), F.col("v").alias("v_lo"))
    kv_hi = hits.select("grp", F.col("k").alias("k_hi"), F.col("v").alias("v_hi"))
    return (
        ranks.join(F.broadcast(kv_lo), ["grp", "k_lo"])
        .join(F.broadcast(kv_hi), ["grp", "k_hi"])
        .select(
            F.col("grp").alias(group_col),
            F.col("p").alias(out_prob),
            (
                F.col("v_lo")
                + (F.col("h") - F.col("k_lo")) * (F.col("v_hi") - F.col("v_lo"))
            ).alias(out_value),
        )
        .orderBy(group_col, out_prob)
    )
