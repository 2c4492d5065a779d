"""Round-7 optimization pins: internals that changed this round keep their
exact contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_grouped_median_mad_nan_and_null_groups(spark):
    """The round-7 driver-side bounds sharing in _grouped_median_mad must
    keep v2's exclusion semantics: NULL values and NaNs excluded, NULL
    groups dropped."""
    from candyspark.plans.outliers import _grouped_median_mad

    df = spark.createDataFrame(
        [
            ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", float("nan")),
            ("a", None), ("b", 10.0), (None, 99.0),
        ],
        "g string, v double",
    )
    out = {r["g"]: r for r in _grouped_median_mad(spark, df, "g", "v").collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["med"] == 2.0 and out["a"]["mad"] == 1.0
    assert out["b"]["med"] == 10.0 and out["b"]["mad"] == 0.0


def test_copurchase_pack_guard_raises_past_2_31(spark):
    """The u*2^32+v pair pack must fail loudly (not merge pairs) once a
    part key exceeds 2^31 (round-7 advice fix)."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from candyspark.plans.behavior import _basket_pair_counts

    items = spark.createDataFrame(
        [(1, [2, 2**31 + 5])], "l_orderkey long, parts array<long>"
    )
    with pytest.raises(SparkRuntimeException, match="pack overflow"):
        _basket_pair_counts(items).collect()


def test_exact_quantiles_grouped_bounds_rows_matches_default(spark):
    """Caller-supplied pre-collected bounds_rows must give bit-identical
    results to the internal bounds pass."""
    from candyspark.operators.quantiles import (
        exact_quantiles_grouped_rows,
    )

    df = (
        spark.range(0, 500)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * 7 % 101).cast("double").alias("v"),
        )
    )
    probs = [0.1, 0.5, 0.9]
    default = exact_quantiles_grouped_rows(spark, df, "g", "v", probs)
    bounds = (
        df.groupBy("g")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n"))
        .withColumnRenamed("g", "grp")
        .collect()
    )
    shared = exact_quantiles_grouped_rows(
        spark, df, "g", "v", probs, bounds_rows=bounds
    )
    assert default == shared


def test_exact_quantiles_bad_caller_n_raises_named_error(spark):
    """Overstated caller-supplied n must raise a ValueError naming the
    group (round-7 advice fix; was a bare StopIteration)."""
    import pytest

    from candyspark.operators.quantiles import exact_quantiles_grouped_rows

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    bad = [{"grp": "a", "lo": 1.0, "hi": 2.0, "n": 10}]
    with pytest.raises(ValueError, match="declares n=10"):
        exact_quantiles_grouped_rows(spark, df, "g", "v", [0.9], bounds_rows=bad)
