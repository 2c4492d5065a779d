"""Salting correctness: salted plans must be RESULT-IDENTICAL to their
unsalted twins (salting only changes physical distribution), and the salt
must be deterministic (retry/replay safety)."""

from __future__ import annotations

from pyspark.sql import functions as F

from candyspark.operators.skew import det_salt, salted_agg, salted_broadcast_left
from candyspark.sources.readers import load_table

from tests.conftest import SF_SMOKE


def _sorted_pdf(df, keys):
    return df.toPandas().sort_values(keys).reset_index(drop=True)


def test_salted_agg_equals_plain_agg(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = li.groupBy("l_suppkey").agg(
        F.sum("l_quantity").alias("qty"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_agg(
        li,
        key_cols=["l_suppkey"],
        unique_col="l_orderkey",
        partial_aggs=[
            F.sum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        ],
        final_aggs=[F.sum("qty").alias("qty"), F.sum("n").alias("n")],
        buckets=8,
    )
    a = _sorted_pdf(plain, ["l_suppkey"])
    b = _sorted_pdf(salted, ["l_suppkey"])
    assert a.equals(b[a.columns])


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_name")
    right = part.withColumnRenamed("p_partkey", "l_partkey")
    plain = li.join(right, ["l_partkey"])
    # declare the 5 most frequent partkeys "hot"
    hot = (
        li.groupBy("l_partkey").count().orderBy(F.desc("count")).limit(5).select("l_partkey")
    )
    salted = salted_broadcast_left(
        li, right, ["l_partkey"], left_unique_col="l_orderkey", hot_keys=hot, buckets=4
    )
    keys = ["l_partkey", "l_orderkey", "l_quantity"]
    a = _sorted_pdf(plain, keys)
    b = _sorted_pdf(salted, keys)
    assert a.equals(b[a.columns])


def test_salt_is_deterministic(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").limit(100)
    s1 = li.select(det_salt("l_orderkey", 16).alias("s")).toPandas()
    s2 = li.select(det_salt("l_orderkey", 16).alias("s")).toPandas()
    assert s1.equals(s2)
    assert s1.s.between(0, 15).all()


def test_salted_topk_equals_single_window(spark):
    """salted_topk must equal the one-window per-key top-k for every
    bucket count — including buckets=1 (degenerate: phases collapse) and
    buckets > rows-per-key (each bucket holds ≤1 row). Duplicate order
    values exercise the tie-break path."""
    from pyspark.sql import Window

    from candyspark.operators.skew import salted_topk

    rows = [
        (key, i, float(val))
        for key in ("a", "b")
        for i, val in enumerate([5, 5, 5, 3, 9, 9, 1, 7, 7, 7])
    ]
    df = spark.createDataFrame(
        [(k, k + str(i), i, v) for (k, i, v) in rows],
        "key string, uid string, seq int, val double",
    )
    w = Window.partitionBy("key").orderBy(F.desc("val"), F.asc("uid"))
    expect = (
        df.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 4)
        .select("key", "rk", "uid", "val")
    )
    for buckets in (1, 3, 16, 64):
        got = salted_topk(
            df,
            key_cols=["key"],
            order_cols=[F.desc("val"), F.asc("uid")],
            unique_col="uid",
            k=4,
            buckets=buckets,
        ).select("key", "rk", "uid", "val")
        assert _sorted_pdf(got, ["key", "rk"]).equals(
            _sorted_pdf(expect, ["key", "rk"])
        ), f"buckets={buckets}"
