"""Data-quality constraint validation + deterministic statistics.

A training-data pipeline promotes datasets only behind constraint gates —
null rates, key uniqueness, referential integrity, value domains. The
reference has nothing of the kind (its CI diffs golden files end-to-end,
SURVEY.md §5.1); this module provides the in-engine form: each check is a
relational aggregate, the report is one long-format frame, and the whole
gate runs as ONE job.

Scale posture: all per-ROW checks on a table fold into ONE
conditional-aggregation pass (N row checks ≠ N scans); key-uniqueness and
referential checks are structurally keyed (groupBy / anti-join) and each
add one narrow-column pass of their own — the scans read only the checked
columns, so at 100 TB the gate costs a few column-pruned sweeps, not
full-table reads per check. The union of check rows is a union of 1-row
frames — free.

The statistics family (second half) computes variance/stddev/correlation
from EXACT decimal power sums (Σx, Σx², Σxy in DECIMAL — order-independent
on both engines) and only then applies the closed-form double formula —
both engines run the identical IEEE expression on identical inputs, so the
oracle hash matches bit-for-bit. Spark's built-in ``stddev``/``corr``
aggregate in floating point and are partial-order-dependent at scale;
moments-from-decimal is the deterministic alternative this engine
standardizes on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from candyspark.functions.numeric import snap_round
from candyspark.plans import QuerySpec
from candyspark.sources.readers import load_table


def _checks_row(df: DataFrame, checks: dict[str, F.Column]) -> DataFrame:
    """One conditional-agg pass producing long-format (check, violations)."""
    wide = df.agg(
        *[F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name) for name, cond in checks.items()]
    )
    stack = ", ".join(f"'{n}', {n}" for n in checks)
    return wide.selectExpr(f"stack({len(checks)}, {stack}) AS (check_name, violations)")


def q_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint gate over orders + lineitem + customer: null keys,
    duplicate primary keys, referential orphans, domain violations —
    long-format report, one scan per table plus one anti-join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    order_checks = _checks_row(
        o,
        {
            "orders_null_custkey": F.col("o_custkey").isNull(),
            "orders_nonpositive_price": F.col("o_totalprice") <= 0,
            "orders_bad_status": ~F.col("o_orderstatus").isin("F", "O", "P"),
        },
    )
    line_checks = _checks_row(
        li,
        {
            "lineitem_nonpositive_qty": F.col("l_quantity") <= 0,
            "lineitem_discount_domain": ~F.col("l_discount").between(0.0, 1.0),
            "lineitem_tax_domain": F.col("l_tax") < 0,
        },
    )
    dup_orders = (
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .select(F.lit("orders_dup_orderkey").alias("check_name"), "violations")
    )
    orphans = (
        o.join(F.broadcast(c.select("c_custkey")), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .select(F.lit("orders_orphan_custkey").alias("check_name"), "violations")
    )
    return (
        order_checks.unionByName(line_checks)
        .unionByName(dup_orders)
        .unionByName(orphans)
        .orderBy("check_name")
    )


QUALITY_REPORT_SQL = """
SELECT check_name, violations FROM (
  SELECT 'orders_null_custkey' AS check_name,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
  FROM orders
  UNION ALL
  SELECT 'orders_nonpositive_price',
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'orders_bad_status',
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'lineitem_nonpositive_qty',
         CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'lineitem_discount_domain',
         CAST(SUM(CASE WHEN l_discount NOT BETWEEN 0.0 AND 1.0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_tax_domain',
         CAST(SUM(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'orders_dup_orderkey', CAST(COUNT(*) AS BIGINT)
  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'orders_orphan_custkey', CAST(COUNT(*) AS BIGINT)
  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
)
ORDER BY check_name
"""


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mean / sample-stddev / correlation per return flag,
    computed from exact DECIMAL power sums (Σq, Σq², Σp, Σp², Σqp) with
    the closed-form double formula applied once at the end, snapped at 6
    dp (the engines' wide-decimal→double conversions can differ in the
    last ulp, so the raw formula output isn't hashable). The built-in
    float aggregates (stddev, corr) are partial-order-dependent at scale;
    moments-from-decimal is order-independent by construction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(12,2)")
    p = F.col("l_extendedprice").cast("decimal(12,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(q * q).alias("sqq"),
        F.sum(p).alias("sp"),
        F.sum(p * p).alias("spp"),
        F.sum(q * p).alias("sqp"),
    )
    n = F.col("n").cast("double")
    sq = F.col("sq").cast("double")
    sqq = F.col("sqq").cast("double")
    sp = F.col("sp").cast("double")
    spp = F.col("spp").cast("double")
    sqp = F.col("sqp").cast("double")
    return agg.select(
        "l_returnflag",
        F.col("n").alias("num_lines"),
        snap_round(sq / n, 6).alias("mean_qty"),
        snap_round(F.sqrt((sqq - sq * sq / n) / (n - F.lit(1.0))), 6).alias("stddev_qty"),
        snap_round(
            (n * sqp - sq * sp)
            / (F.sqrt(n * sqq - sq * sq) * F.sqrt(n * spp - sp * sp)),
            6,
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


STATS_MOMENTS_SQL = """
WITH sums AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
         SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sqq,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sp,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS spp,
         SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sqp
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       n AS num_lines,
       CAST(ROUND(CAST(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(28,8)), 6)
            AS DOUBLE) AS mean_qty,
       CAST(ROUND(CAST(
         SQRT((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1.0)) AS DECIMAL(28,8)), 6) AS DOUBLE) AS stddev_qty,
       CAST(ROUND(CAST(
         (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
         / (SQRT(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
            * SQRT(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
         AS DECIMAL(28,8)), 6) AS DOUBLE) AS corr_qty_price
FROM sums
ORDER BY l_returnflag
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the arbitrary-set form beyond ROLLUP/CUBE
    (plans/relational.grouping_rollup, plans/analytics.cube_qty): revenue
    by (returnflag, linestatus), by (returnflag), and grand total, but NOT
    by (linestatus) — the set list CUBE can't express without waste.
    Expressed through spark.sql, the engine's SQL front door. One expand +
    one aggregate; no re-scan per set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS return_flag,
               COALESCE(l_linestatus, 'ALL') AS line_status,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS num_lines
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY return_flag, line_status
        """
    )


GROUPING_SETS_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS return_flag,
       COALESCE(l_linestatus, 'ALL') AS line_status,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS num_lines
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY return_flag, line_status
"""


REGISTRY: dict[str, QuerySpec] = {
    "quality_report": QuerySpec(q_quality_report, QUALITY_REPORT_SQL),
    "stats_moments": QuerySpec(q_stats_moments, STATS_MOMENTS_SQL),
    "grouping_sets": QuerySpec(q_grouping_sets, GROUPING_SETS_SQL),
}
