"""Candy-pipeline-shaped queries over the testdata (SURVEY.md §2.9, M3).

The inventory-allocation operator family, mapped onto the TPC-H-ish tables
(products → part, line items → lineitem; FIXTURES.md §B operator→fixture
map). Stock is a deterministic synthetic per-part capacity so both engines
compute it identically: ``(p_partkey % 10 + 1) * 100``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from candyspark.functions.numeric import snap_round
from candyspark.operators.allocation import allocate_greedy
from candyspark.plans import QuerySpec
from candyspark.sources.readers import load_table

# Synthetic stock: deterministic in both engines, exhausts for low-capacity
# parts (sf0.01 demand is ~750 qty/part) so cancellation paths are exercised.
_STOCK = "(p_partkey % 10 + 1) * 100"


def _lineitems_with_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.expr(_STOCK).cast("double").alias("stock")
    )
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey)


def prefix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-based *prefix* allocation (the oracle-checkable variant of
    §2.9): in (l_shipdate, l_orderkey, l_linenumber) total order per part,
    a request is fulfilled iff the running demand INCLUDING it fits in stock
    — first-fit-stop semantics. One shuffle (the window partition), no
    driver state, no per-day loop (reference anti-pattern §4.2:
    src/data_processor.py:353-436,401-406)."""
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = _lineitems_with_stock(spark, sf_dir)
    running = F.sum("l_quantity").over(w)
    fulfilled = F.when(running <= F.col("stock"), F.col("l_quantity")).otherwise(F.lit(0.0))
    return df.select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        F.col("l_quantity").alias("requested_qty"),
        fulfilled.alias("fulfilled_qty"),
        # identical double arithmetic in both engines, then snapped through
        # decimal so the 2-dp round is engine-independent (see relational.py
        # module docstring on money rounding).
        F.round(
            (fulfilled * F.col("l_extendedprice") / F.col("l_quantity")).cast(
                "decimal(28,8)"
            ),
            2,
        )
        .cast("double")
        .alias("line_total"),
    )


PREFIX_ALLOCATION_SQL = """
SELECT l_orderkey, l_partkey, l_linenumber,
       l_quantity AS requested_qty,
       CASE WHEN running_qty <= stock THEN l_quantity ELSE 0 END AS fulfilled_qty,
       CAST(ROUND(CAST(CASE WHEN running_qty <= stock THEN l_quantity ELSE 0 END
                       * l_extendedprice / l_quantity AS DECIMAL(28,8)), 2) AS DOUBLE) AS line_total
FROM (
    SELECT l.*, (p_partkey % 10 + 1) * 100 AS stock,
           SUM(l_quantity) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
    FROM lineitem l JOIN part ON l_partkey = p_partkey
)
"""


def greedy_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's actual semantics (§2.9, src/data_processor.py:33-62):
    greedy-with-skip — a too-big request is cancelled but SMALLER later
    requests still fill. Inherently sequential per part → mapInPandas
    kernel (candyspark.operators.allocation); invariants are pinned by
    tests/test_allocation.py.

    Hash-checked since round 5: the sequential scan IS expressible in
    DuckDB as a recursive CTE stepping every part's chain in lockstep
    (rn → rn+1 joins against the per-part ROW_NUMBER in the pinned
    (l_shipdate, l_orderkey, l_linenumber) total order) — fine at oracle
    scale (sf0.01: 60k rows, max chain 49), which is the point: the
    recursion is the *oracle*, the one-shuffle kernel is the engine.
    Cross-engine exactness: qty/stock arithmetic is whole-valued doubles
    (exact subtraction); unit_price is the same double quotient in both
    engines; line_total rounds the *identical* product double, and
    fulfilled ∈ {0, qty} keeps it off representable 2-dp ties (measured
    bit-exact at sf0.001 and sf0.01)."""
    df = _lineitems_with_stock(spark, sf_dir).withColumn(
        "unit_price", F.col("l_extendedprice") / F.col("l_quantity")
    )
    return allocate_greedy(
        df,
        group_col="l_partkey",
        order_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
        qty_col="l_quantity",
        stock_col="stock",
        unit_price_col="unit_price",
        out_keys=["l_orderkey", "l_partkey", "l_linenumber"],
    )


GREEDY_ALLOCATION_SQL = """
WITH RECURSIVE base AS (
    SELECT l.l_orderkey, l.l_partkey, l.l_linenumber,
           CAST(l_quantity AS DOUBLE) AS qty,
           CAST((p_partkey % 10 + 1) * 100 AS DOUBLE) AS stock,
           l_extendedprice / l_quantity AS unit_price,
           CAST(ROW_NUMBER() OVER (PARTITION BY l_partkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber) AS BIGINT) AS rn
    FROM lineitem l JOIN part ON l_partkey = p_partkey
),
walk AS (
    SELECT l_orderkey, l_partkey, l_linenumber, qty, unit_price, rn,
           CASE WHEN qty > 0 AND qty <= stock THEN qty ELSE 0.0 END AS fulfilled,
           stock - CASE WHEN qty > 0 AND qty <= stock THEN qty ELSE 0.0 END AS available
    FROM base WHERE rn = 1
    UNION ALL
    SELECT b.l_orderkey, b.l_partkey, b.l_linenumber, b.qty, b.unit_price, b.rn,
           CASE WHEN b.qty > 0 AND b.qty <= w.available THEN b.qty ELSE 0.0 END,
           w.available
               - CASE WHEN b.qty > 0 AND b.qty <= w.available THEN b.qty ELSE 0.0 END
    FROM base b JOIN walk w ON b.l_partkey = w.l_partkey AND b.rn = w.rn + 1
)
SELECT l_orderkey, l_partkey, CAST(l_linenumber AS INT) AS l_linenumber,
       qty AS requested_qty,
       fulfilled AS fulfilled_qty,
       CAST(ROUND(CAST(fulfilled * unit_price AS DECIMAL(28,8)), 2) AS DOUBLE)
           AS line_total
FROM walk
"""


def inventory_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-allocation stock decrement (J2 — src/data_processor.py:444-464),
    computed from the greedy allocator's *actual* fulfilled totals in one
    agg + one broadcast-dim join (vs. 10 chained outer joins, §4.2).
    Greedy per-product totals equal prefix-allocation totals only when no
    skip occurs, so this derives from the SQL-expressible prefix variant to
    stay oracle-checkable."""
    alloc = prefix_allocation(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", F.expr(_STOCK).cast("double").alias("stock")
    )
    sold = alloc.groupBy("l_partkey").agg(F.sum("fulfilled_qty").alias("sold_qty"))
    return (
        F.broadcast(p)
        .join(sold, p.p_partkey == sold.l_partkey, "left")
        .select(
            "p_partkey",
            "p_name",
            F.round(F.col("stock") - F.coalesce("sold_qty", F.lit(0.0)), 2).alias(
                "current_stock"
            ),
        )
    )


INVENTORY_UPDATE_SQL = """
WITH alloc AS (
    SELECT l_partkey,
           CASE WHEN running_qty <= stock THEN l_quantity ELSE 0 END AS fulfilled_qty
    FROM (
        SELECT l.l_partkey, l.l_quantity, (p_partkey % 10 + 1) * 100 AS stock,
               SUM(l_quantity) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        FROM lineitem l JOIN part ON l_partkey = p_partkey
    )
)
SELECT p_partkey, p_name,
       ROUND((p_partkey % 10 + 1) * 100 - COALESCE(sold_qty, 0), 2) AS current_stock
FROM part
LEFT JOIN (SELECT l_partkey, SUM(fulfilled_qty) AS sold_qty FROM alloc GROUP BY l_partkey) s
  ON p_partkey = s.l_partkey
"""


def forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day revenue forecast via closed-form OLS over the daily revenue
    series (the oracle-checkable twin of candyspark.forecast's linear model;
    the reference's Prophet fit is irreproducible by construction —
    SURVEY.md §2.12 — so THIS is the pinned-value forecasting surface).

    Determinism across engines: the sufficient statistics (n, Σx, Σy, Σxy,
    Σxx) are exact (bigint / decimal) aggregations — order-independent —
    and only the final slope/intercept arithmetic is double, in the same
    textual expression order in both engines. One aggregation pass; at
    scale this is a map-side-combined scalar agg, no window, no collect."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y")
    )
    xy = daily.select(
        F.datediff("d", F.lit("1970-01-01")).cast("long").alias("x"), "y"
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(10,0)") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.max("x").cast("double").alias("mx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    yhat = intercept + slope * (F.col("mx") + 1)
    return s.select(
        F.date_add(F.lit("1970-01-01").cast("date"), (F.col("mx") + 1).cast("int")).alias(
            "date"
        ),
        F.round(yhat.cast("decimal(28,8)"), 2).cast("double").alias("forecast_revenue"),
    )


FORECAST_LINEAR_SQL = """
WITH daily AS (
    SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
    FROM orders GROUP BY 1
),
xy AS (SELECT date_diff('day', DATE '1970-01-01', d) AS x, y FROM daily),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(10,0)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(MAX(x) AS DOUBLE) AS mx
      FROM xy)
SELECT DATE '1970-01-01' + CAST(mx + 1 AS INT) AS date,
       CAST(ROUND(CAST(
           ((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n)
           + ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * (mx + 1)
           AS DECIMAL(28,8)), 2) AS DOUBLE) AS forecast_revenue
FROM s
"""


def forecast_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-sample fit-quality metrics (MAE/MSE) of the linear daily-revenue
    forecast — the relational analogue of the reference's
    ``ProphetForecaster.get_metrics`` (/root/reference/src/time_series.py:45-67),
    which predicts the training period back through the fitted model and
    reports unrounded MAE/MSE. Here the model is the same closed-form OLS
    as ``forecast_linear`` and the metrics are one aggregate over (y, ŷ).

    Cross-engine determinism: the sufficient statistics are exact
    (bigint/decimal) sums; slope/intercept/ŷ/residual are the same textual
    double expressions in both engines, each per-day residual term is
    snapped to DECIMAL before the exact (order-independent) sum, and only
    the final mean division is double (mae snapped at 4 dp; mse at whole
    units — see inline note on the mantissa bound). Scale: two scans
    of the tiny daily aggregate (itself one map-side-combined pass over
    orders); the 1-row stats broadcast — no window, no collect."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y")
    )
    xy = daily.select(
        F.datediff("d", F.lit("1970-01-01")).cast("long").alias("x"), "y"
    ).localCheckpoint()  # tiny (one row per day); feeds stats AND residuals
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(10,0)") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    res = F.col("y").cast("double") - (intercept + slope * F.col("x"))
    return (
        xy.crossJoin(F.broadcast(s))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(
                (
                    F.sum(F.round(F.abs(res).cast("decimal(28,9)"), 9)).cast("double")
                    / F.count(F.lit(1))
                ).cast("decimal(28,8)"),
                4,
            )
            .cast("double")
            .alias("mae"),
            # mse (~1e11 at sf0.01) snapped to WHOLE units as bigint: a
            # DECIMAL(28,8) snap would scale the double by 1e8 past the
            # 53-bit mantissa inside DuckDB's cast and flip the last digit;
            # both engines derive the identical double (exact decimal sum →
            # one division), so integer HALF_UP rounding agrees exactly.
            F.round(
                F.sum(F.round((res * res).cast("decimal(28,6)"), 6)).cast("double")
                / F.count(F.lit(1)),
                0,
            )
            .cast("long")
            .alias("mse"),
        )
    )


FORECAST_METRICS_SQL = """
WITH daily AS (
    SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
    FROM orders GROUP BY 1
),
xy AS (SELECT date_diff('day', DATE '1970-01-01', d) AS x, y FROM daily),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(10,0)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM xy),
r AS (
    SELECT CAST(xy.y AS DOUBLE)
           - (((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n)
              + ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * x) AS res
    FROM xy CROSS JOIN s
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(ROUND(CAST(CAST(SUM(ROUND(CAST(ABS(res) AS DECIMAL(28,9)), 9))
                            AS DOUBLE) / COUNT(*)
                       AS DECIMAL(28,8)), 4) AS DOUBLE) AS mae,
       CAST(ROUND(CAST(SUM(ROUND(CAST(res * res AS DECIMAL(28,6)), 6))
                       AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS mse
FROM r
"""


REGISTRY: dict[str, QuerySpec] = {
    "prefix_allocation": QuerySpec(prefix_allocation, PREFIX_ALLOCATION_SQL),
    # sequential kernel; hash-checked via a recursive-CTE oracle since r5
    "greedy_allocation": QuerySpec(greedy_allocation, GREEDY_ALLOCATION_SQL),
    "inventory_update": QuerySpec(inventory_update, INVENTORY_UPDATE_SQL),
    "forecast_linear": QuerySpec(forecast_linear, FORECAST_LINEAR_SQL),
    # inside the driver's 50-query hash window on purpose (VERDICT r1 §9)
    "forecast_metrics": QuerySpec(forecast_metrics, FORECAST_METRICS_SQL),
}


def q_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching — the accounting/inventory costing operator: each
    outgoing line consumes the oldest incoming lots of its part, expressed
    RELATIONALLY as an overlap join of cumulative-quantity intervals (no
    per-row loop, no state kernel — the set-based form of the same
    matching the greedy allocator does chronologically). Inflows are the
    part's 'F'-status lines, outflows its 'O'-status lines, both in
    (shipdate, orderkey, linenumber) total order.

    Each flow's cumulative sum turns quantity into an interval
    [cum−qty, cum); a lot funds an outflow exactly where the intervals
    overlap, and the allocated quantity is the overlap length — integer
    arithmetic end to end. The TRUE pair count is linear (an outflow of
    size q touches ≤ q/min_lot + 1 lots), and the join realizes that
    bound by BANDING the cumulative axis (the same trick
    operators/temporal.range_join_banded applies to time): each interval
    explodes to the width-``band`` buckets it covers (≤ qty/band + 1
    rows — ~2 at TPC-H quantities), the equi-join key becomes
    (part, cum_band), and each overlapping pair is emitted EXACTLY once
    by keeping only the band containing the overlap's start (both
    intervals contain that point, so they meet in that band; no
    distinct needed). A partkey-only join would evaluate each part's
    full inflow×outflow grid — per-part quadratic, a detonation on
    high-volume parts at 100 TB. Rolled up per part: matched quantity,
    unmatched demand (outflows beyond total inflow), and allocation
    count.
    """
    band = 64  # ≥ max TPC-H qty (50): each interval covers ≤ 2 bands
    # qty = 0 lines are FIFO no-ops (zero-width intervals can never fund
    # anything) — filtered on BOTH sides so engine and oracle agree on the
    # degenerate rows the banded join would drop anyway
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "l_linestatus",
            "l_shipdate",
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .filter(F.col("qty") > 0)
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)

    def flow(status: str, prefix: str) -> DataFrame:
        f = li.filter(F.col("l_linestatus") == status).withColumn(
            "cum", F.sum("qty").over(w)
        )
        return f.select(
            F.col("l_partkey").alias(f"{prefix}_part"),
            F.col("l_orderkey").alias(f"{prefix}_order"),
            F.col("l_linenumber").alias(f"{prefix}_line"),
            (F.col("cum") - F.col("qty")).alias(f"{prefix}_start"),
            F.col("cum").alias(f"{prefix}_end"),
        )

    inflow, outflow = flow("F", "in"), flow("O", "out")

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        s, e = F.col(f"{prefix}_start"), F.col(f"{prefix}_end")
        bands = F.when(
            e > s, F.sequence(F.floor(s / band), F.floor((e - 1) / band))
        ).otherwise(F.array().cast("array<bigint>"))
        return df.withColumn(f"{prefix}_cum_band", F.explode(bands))

    pairs = banded(inflow, "in").join(
        banded(outflow, "out"),
        (F.col("in_part") == F.col("out_part"))
        & (F.col("in_cum_band") == F.col("out_cum_band"))
        & (F.col("out_start") < F.col("in_end"))
        & (F.col("in_start") < F.col("out_end"))
        # emit each overlapping pair only in the band where its overlap
        # starts — the one band both sides are guaranteed to share
        & (
            F.col("in_cum_band")
            == F.floor(F.greatest(F.col("in_start"), F.col("out_start")) / band)
        ),
    ).select(
        F.col("in_part").alias("l_partkey"),
        (
            F.least(F.col("in_end"), F.col("out_end"))
            - F.greatest(F.col("in_start"), F.col("out_start"))
        ).alias("allocated"),
        F.col("out_end").alias("out_end"),
    )
    demand = outflow.groupBy(F.col("out_part").alias("l_partkey")).agg(
        F.max("out_end").alias("total_demand")
    )
    matched = pairs.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_allocations"),
        F.sum("allocated").cast("long").alias("matched_qty"),
    )
    return (
        demand.join(matched, "l_partkey", "left")
        .select(
            "l_partkey",
            F.coalesce("n_allocations", F.lit(0)).cast("long").alias("n_allocations"),
            F.coalesce("matched_qty", F.lit(0)).cast("long").alias("matched_qty"),
            (F.col("total_demand") - F.coalesce("matched_qty", F.lit(0)))
            .cast("long")
            .alias("unmatched_qty"),
        )
        .orderBy("l_partkey")
    )


FIFO_ALLOCATION_SQL = """
WITH base AS (
    SELECT l_partkey, l_orderkey, l_linenumber, l_linestatus, l_shipdate,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
    WHERE CAST(l_quantity AS BIGINT) > 0
),
inflow AS (
    SELECT l_partkey AS in_part,
           SUM(qty) OVER w - qty AS in_start,
           SUM(qty) OVER w AS in_end
    FROM base WHERE l_linestatus = 'F'
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS UNBOUNDED PRECEDING)
),
outflow AS (
    SELECT l_partkey AS out_part,
           SUM(qty) OVER w - qty AS out_start,
           SUM(qty) OVER w AS out_end
    FROM base WHERE l_linestatus = 'O'
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS UNBOUNDED PRECEDING)
),
pairs AS (
    SELECT in_part AS l_partkey,
           LEAST(in_end, out_end) - GREATEST(in_start, out_start) AS allocated
    FROM inflow JOIN outflow
      ON in_part = out_part
     AND out_start < in_end AND in_start < out_end
),
demand AS (
    SELECT out_part AS l_partkey, MAX(out_end) AS total_demand
    FROM outflow GROUP BY out_part
),
matched AS (
    SELECT l_partkey, COUNT(*) AS n_allocations,
           CAST(SUM(allocated) AS BIGINT) AS matched_qty
    FROM pairs GROUP BY l_partkey
)
SELECT d.l_partkey,
       CAST(COALESCE(n_allocations, 0) AS BIGINT) AS n_allocations,
       CAST(COALESCE(matched_qty, 0) AS BIGINT) AS matched_qty,
       CAST(total_demand - COALESCE(matched_qty, 0) AS BIGINT) AS unmatched_qty
FROM demand d LEFT JOIN matched m ON d.l_partkey = m.l_partkey
ORDER BY d.l_partkey
"""

REGISTRY["fifo_allocation"] = QuerySpec(q_fifo_allocation, FIFO_ALLOCATION_SQL)


def forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtesting — the evaluation harness that
    turns forecast_linear/forecast_metrics from 'a fit' into 'a validated
    model': at EVERY origin day t (after a 30-day burn-in), fit the linear
    model on days ≤ t only and score its one-step-ahead prediction against
    day t+1; report MAE/RMSE over all origins plus MASE (error relative to
    the seasonal-naive lag-7 forecast — the scale-free skill score; MASE
    < 1 beats the naive baseline).

    The trick that makes ALL prefix fits ONE pass: the OLS sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) become RUNNING window sums over the
    daily series, so every origin's closed-form fit assembles from its
    own row — no per-origin refit loop, no data re-scan. The window is
    unpartitioned but runs over the per-DAY aggregate (calendar-bounded:
    thousands of rows at any SF — the drift_psi convention).

    Exactness: prefix sums are exact (long / decimal); each origin's
    slope/intercept/prediction is one double association; per-origin
    absolute errors snap to decimal so the MAE/RMSE sums are order-free;
    final ratios snap once.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y")
    )
    xy = daily.select(
        F.datediff("d", F.lit("1970-01-01")).cast("long").alias("x"),
        F.col("y").cast("decimal(18,2)").alias("y"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("x")
    pref = xy.select(
        "x",
        "y",
        F.count(F.lit(1)).over(w).cast("long").alias("n_c"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("y") * F.col("x").cast("decimal(10,0)")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
        F.lead("x").over(wl).alias("x_next"),
        F.lead("y").over(wl).alias("y_next"),
        F.lag("y", 6).over(wl).alias("y_lag6"),
    )
    n = F.col("n_c").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    yhat = (sy - slope * sx) / n + slope * F.col("x_next").cast("double")
    origins = pref.filter(
        (F.col("n_c") >= 30)
        & F.col("x_next").isNotNull()
        & F.col("y_lag6").isNotNull()
    ).select(
        F.round(
            F.abs(yhat - F.col("y_next").cast("double")).cast("decimal(28,6)"), 4
        )
        .cast("decimal(20,4)")
        .alias("err_ols"),
        F.round(
            F.abs(
                (F.col("y_lag6") - F.col("y_next")).cast("double")
            ).cast("decimal(28,6)"),
            4,
        )
        .cast("decimal(20,4)")
        .alias("err_snaive"),
    )
    agg = origins.agg(
        F.count(F.lit(1)).cast("long").alias("n_origins"),
        F.sum("err_ols").alias("se_ols"),
        F.sum("err_snaive").alias("se_snaive"),
        F.sum(F.col("err_ols") * F.col("err_ols")).alias("sq_ols"),
    )
    no = F.col("n_origins").cast("double")
    return agg.select(
        "n_origins",
        snap_round(F.col("se_ols").cast("double") / no, 4).alias("mae_ols"),
        snap_round(
            F.sqrt(F.col("sq_ols").cast("double") / no), 4
        ).alias("rmse_ols"),
        snap_round(F.col("se_snaive").cast("double") / no, 4).alias("mae_snaive"),
        snap_round(
            F.col("se_ols").cast("double") / F.col("se_snaive").cast("double"),
            6,
        ).alias("mase"),
    )


FORECAST_BACKTEST_SQL = """
WITH daily AS (
    SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
    FROM orders GROUP BY 1
),
xy AS (SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS x,
              CAST(y AS DECIMAL(18,2)) AS y FROM daily),
pref AS (
    SELECT x, y,
           CAST(COUNT(*) OVER wp AS BIGINT) AS n_c,
           CAST(SUM(x) OVER wp AS BIGINT) AS sx,
           SUM(y) OVER wp AS sy,
           SUM(y * CAST(x AS DECIMAL(10,0))) OVER wp AS sxy,
           CAST(SUM(x * x) OVER wp AS BIGINT) AS sxx,
           LEAD(x) OVER (ORDER BY x) AS x_next,
           LEAD(y) OVER (ORDER BY x) AS y_next,
           LAG(y, 6) OVER (ORDER BY x) AS y_lag6
    FROM xy
    WINDOW wp AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
origins AS (
    SELECT CAST(ROUND(CAST(ABS(
               ((CAST(sy AS DOUBLE)
                 - ((CAST(n_c AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n_c AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                   * CAST(sx AS DOUBLE)) / CAST(n_c AS DOUBLE)
                + ((CAST(n_c AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n_c AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * CAST(x_next AS DOUBLE))
               - CAST(y_next AS DOUBLE)) AS DECIMAL(28,6)), 4) AS DECIMAL(20,4))
               AS err_ols,
           CAST(ROUND(CAST(ABS(CAST(y_lag6 - y_next AS DOUBLE))
               AS DECIMAL(28,6)), 4) AS DECIMAL(20,4)) AS err_snaive
    FROM pref
    WHERE n_c >= 30 AND x_next IS NOT NULL AND y_lag6 IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_origins,
       CAST(ROUND(CAST(CAST(SUM(err_ols) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS DECIMAL(28,8)), 4) AS DOUBLE) AS mae_ols,
       CAST(ROUND(CAST(SQRT(CAST(SUM(err_ols * err_ols) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) AS DECIMAL(28,8)), 4) AS DOUBLE) AS rmse_ols,
       CAST(ROUND(CAST(CAST(SUM(err_snaive) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS DECIMAL(28,8)), 4) AS DOUBLE) AS mae_snaive,
       CAST(ROUND(CAST(CAST(SUM(err_ols) AS DOUBLE) / CAST(SUM(err_snaive) AS DOUBLE)
            AS DECIMAL(28,8)), 6) AS DOUBLE) AS mase
FROM origins
"""


REGISTRY["forecast_backtest"] = QuerySpec(forecast_backtest, FORECAST_BACKTEST_SQL)


def conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for the next-day revenue
    forecast — the distribution-free uncertainty the point forecasts
    (forecast_linear) and in-sample metrics (forecast_metrics) don't give:
    fit on the first 70% of days, take absolute residuals on the held-out
    30% calibration window, and the 90% interval is ŷ ± the
    ⌈(n_cal+1)·0.9⌉-th smallest residual. Coverage ≥ 90% holds by the
    exchangeability argument alone — no normality, no variance model
    (Vovk; the modern ML-ops standard for 'forecast ± what?').

    Relational shape: the split point derives FROM the data (row_number
    over the day series vs 0.7·count); the train fit is the usual exact
    sufficient-statistic aggregate; the calibration quantile is an ORDER
    STATISTIC — row_number = k over the residuals, an exact value crossing
    the engine boundary (the percentile_disc discipline, no interpolation
    to drift). Windows run over the calendar-bounded daily aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y")
    )
    wd = Window.orderBy("d")
    xy = daily.select(
        F.datediff("d", F.lit("1970-01-01")).cast("long").alias("x"),
        F.col("y").cast("decimal(18,2)").alias("y"),
        F.row_number().over(wd).cast("long").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n_days"),
    ).localCheckpoint()
    train = xy.filter(F.col("rn") * 10 <= F.col("n_days") * 7)
    s = train.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("x").cast("decimal(10,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = s.select(
        F.round(slope.cast("decimal(28,10)"), 8).cast("double").alias("b"),
        F.round(
            ((F.col("sy") - slope * F.col("sx")) / F.col("n")).cast(
                "decimal(28,10)"
            ),
            6,
        )
        .cast("double")
        .alias("a"),
    )
    cal = (
        xy.filter(F.col("rn") * 10 > F.col("n_days") * 7)
        .crossJoin(F.broadcast(fit))
        .select(
            F.round(
                F.abs(
                    F.col("a")
                    + F.col("b") * F.col("x").cast("double")
                    - F.col("y").cast("double")
                ).cast("decimal(28,6)"),
                4,
            )
            .cast("decimal(20,4)")
            .alias("resid"),
            (F.col("x") + 1).alias("x_next"),
        )
    )
    wr = Window.orderBy("resid")
    whole = Window.partitionBy()
    ranked = cal.select(
        "resid",
        F.max("x_next").over(whole).alias("x_pred"),
        F.row_number().over(wr).cast("long").alias("r"),
        F.count(F.lit(1)).over(whole).cast("long").alias("n_cal"),
    )
    q_row = ranked.filter(
        F.col("r")
        == F.least(F.ceil((F.col("n_cal") + 1) * 0.9).cast("long"), F.col("n_cal"))
    )
    return (
        q_row.crossJoin(F.broadcast(fit))
        .select(
            F.col("n_cal"),
            F.col("resid").cast("double").alias("q_resid"),
            snap_round(
                F.col("a") + F.col("b") * (F.col("x_pred").cast("double") + 1.0),
                2,
            ).alias("yhat_next"),
            snap_round(
                F.col("a")
                + F.col("b") * (F.col("x_pred").cast("double") + 1.0)
                - F.col("resid").cast("double"),
                2,
            ).alias("lo_90"),
            snap_round(
                F.col("a")
                + F.col("b") * (F.col("x_pred").cast("double") + 1.0)
                + F.col("resid").cast("double"),
                2,
            ).alias("hi_90"),
        )
    )


CONFORMAL_INTERVAL_SQL = """
WITH daily AS (
    SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
    FROM orders GROUP BY 1
),
xy AS (
    SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS x,
           CAST(y AS DECIMAL(18,2)) AS y,
           CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_days
    FROM daily
),
s AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(x) AS DOUBLE) AS sx,
           CAST(SUM(y) AS DOUBLE) AS sy,
           CAST(SUM(y * CAST(x AS DECIMAL(10,0))) AS DOUBLE) AS sxy,
           CAST(SUM(x * x) AS DOUBLE) AS sxx
    FROM xy WHERE rn * 10 <= n_days * 7
),
fit AS (
    SELECT CAST(ROUND(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx)
               AS DECIMAL(28,10)), 8) AS DOUBLE) AS b,
           CAST(ROUND(CAST((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
               AS DECIMAL(28,10)), 6) AS DOUBLE) AS a
    FROM s
),
cal AS (
    SELECT CAST(ROUND(CAST(ABS(a + b * CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
               AS DECIMAL(28,6)), 4) AS DECIMAL(20,4)) AS resid,
           x + 1 AS x_next
    FROM xy CROSS JOIN fit WHERE rn * 10 > n_days * 7
),
ranked AS (
    SELECT resid,
           MAX(x_next) OVER () AS x_pred,
           CAST(ROW_NUMBER() OVER (ORDER BY resid) AS BIGINT) AS r,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_cal
    FROM cal
)
SELECT n_cal,
       CAST(resid AS DOUBLE) AS q_resid,
       CAST(ROUND(CAST(a + b * (CAST(x_pred AS DOUBLE) + 1.0)
            AS DECIMAL(28,8)), 2) AS DOUBLE) AS yhat_next,
       CAST(ROUND(CAST(a + b * (CAST(x_pred AS DOUBLE) + 1.0) - CAST(resid AS DOUBLE)
            AS DECIMAL(28,8)), 2) AS DOUBLE) AS lo_90,
       CAST(ROUND(CAST(a + b * (CAST(x_pred AS DOUBLE) + 1.0) + CAST(resid AS DOUBLE)
            AS DECIMAL(28,8)), 2) AS DOUBLE) AS hi_90
FROM ranked CROSS JOIN fit
WHERE r = LEAST(CAST(CEIL((n_cal + 1) * 0.9) AS BIGINT), n_cal)
"""


REGISTRY["conformal_interval"] = QuerySpec(
    conformal_interval, CONFORMAL_INTERVAL_SQL
)


def reorder_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory policy from demand statistics — the operations-research
    layer ON TOP of the allocator family (prefix/greedy/fifo consume
    stock; this query decides how much stock to HOLD): per part, daily
    demand mean μ and standard deviation σ from exact power sums, then
    safety stock = z·σ·√L and reorder point = μ·L + SS for lead time
    L = 7 days at a 95% service level (z = 1.645). The candy reference
    stops at decrementing stock (src/data_processor.py:444-464); this is
    what a user would compute next with the same data.

    Exactness: per-(part, day) demand is an exact long; per-part Σd, Σd²
    are exact int64; σ uses the n-denominator population form assembled
    in double with ONE association; √L and z are exact literals; one
    snap per output. Demand days missing from the calendar count as
    OBSERVED days only (stated — zero-filling the calendar is the
    gap_fill_daily composition). Scale: two map-side-combined aggregates
    ((part, day) then part), top-20 via TakeOrdered.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy("l_partkey", F.col("l_shipdate").alias("d"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    )
    sums = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    n = F.col("n_days").cast("double")
    mu = F.col("sq").cast("double") / n
    var = F.col("sqq").cast("double") / n - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    ss = 1.645 * sigma * F.sqrt(F.lit(7.0))
    rop = mu * 7.0 + ss
    return (
        sums.filter(F.col("n_days") >= 5)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("n_days").alias("demand_days"),
            snap_round(mu, 4).alias("mean_daily_demand"),
            snap_round(sigma, 4).alias("sigma_daily_demand"),
            snap_round(ss, 2).alias("safety_stock"),
            snap_round(rop, 2).alias("reorder_point"),
        )
        .orderBy(F.desc("reorder_point"), "partkey")
        .limit(20)
    )


REORDER_POINTS_SQL = """
WITH daily AS (
    SELECT l_partkey, l_shipdate AS d,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
    FROM lineitem GROUP BY 1, 2
),
sums AS (
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(q) AS BIGINT) AS sq,
           CAST(SUM(q * q) AS BIGINT) AS sqq
    FROM daily GROUP BY 1
)
SELECT partkey, demand_days, mean_daily_demand, sigma_daily_demand,
       safety_stock, reorder_point
FROM (
    SELECT l_partkey AS partkey,
           n_days AS demand_days,
           CAST(ROUND(CAST(CAST(sq AS DOUBLE) / CAST(n_days AS DOUBLE)
                AS DECIMAL(28,8)), 4) AS DOUBLE) AS mean_daily_demand,
           CAST(ROUND(CAST(
               SQRT(GREATEST(CAST(sqq AS DOUBLE) / CAST(n_days AS DOUBLE)
                    - (CAST(sq AS DOUBLE) / CAST(n_days AS DOUBLE))
                      * (CAST(sq AS DOUBLE) / CAST(n_days AS DOUBLE)), 0.0))
               AS DECIMAL(28,8)), 4) AS DOUBLE) AS sigma_daily_demand,
           CAST(ROUND(CAST(
               1.645 * SQRT(GREATEST(CAST(sqq AS DOUBLE) / CAST(n_days AS DOUBLE)
                    - (CAST(sq AS DOUBLE) / CAST(n_days AS DOUBLE))
                      * (CAST(sq AS DOUBLE) / CAST(n_days AS DOUBLE)), 0.0))
               * SQRT(7.0)
               AS DECIMAL(28,8)), 2) AS DOUBLE) AS safety_stock,
           CAST(ROUND(CAST(
               (CAST(sq AS DOUBLE) / CAST(n_days AS DOUBLE)) * 7.0
               + 1.645 * SQRT(GREATEST(CAST(sqq AS DOUBLE) / CAST(n_days AS DOUBLE)
                    - (CAST(sq AS DOUBLE) / CAST(n_days AS DOUBLE))
                      * (CAST(sq AS DOUBLE) / CAST(n_days AS DOUBLE)), 0.0))
                 * SQRT(7.0)
               AS DECIMAL(28,8)), 2) AS DOUBLE) AS reorder_point
    FROM sums
    WHERE n_days >= 5
)
ORDER BY reorder_point DESC, partkey
LIMIT 20
"""


REGISTRY["reorder_points"] = QuerySpec(reorder_points, REORDER_POINTS_SQL)


def durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson autocorrelation-of-residuals test for the daily
    revenue OLS — the diagnostic that tells you whether forecast_linear's
    i.i.d.-error assumption holds (DW ≈ 2 means none; toward 0, positive
    autocorrelation and the OLS confidence story is broken even when the
    fit looks good). Completes the regression-diagnostics arc: fit
    (forecast_linear) → quality (forecast_metrics) → validation
    (forecast_backtest) → uncertainty (conformal_interval) → assumptions
    (THIS).

    One exact sufficient-statistic aggregate fits the line; residuals
    snap to decimal per day so both engines difference identical values;
    the lag pairing is a window over the calendar-bounded series; the two
    Σ's are exact decimal sums with one snapped ratio.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y")
    )
    xy = daily.select(
        F.datediff("d", F.lit("1970-01-01")).cast("long").alias("x"),
        F.col("y").cast("decimal(18,2)").alias("y"),
    ).localCheckpoint()
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("x").cast("decimal(10,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = s.select(
        F.round(slope.cast("decimal(28,10)"), 8).cast("double").alias("b"),
        F.round(
            ((F.col("sy") - slope * F.col("sx")) / F.col("n")).cast(
                "decimal(28,10)"
            ),
            6,
        )
        .cast("double")
        .alias("a"),
    )
    resid = xy.crossJoin(F.broadcast(fit)).select(
        "x",
        F.round(
            (
                F.col("y").cast("double")
                - (F.col("a") + F.col("b") * F.col("x").cast("double"))
            ).cast("decimal(28,6)"),
            4,
        )
        .cast("decimal(20,4)")
        .alias("e"),
    )
    w = Window.orderBy("x")
    diffed = resid.select(
        "e", (F.col("e") - F.lag("e").over(w)).alias("de")
    )
    sums = diffed.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.col("e") * F.col("e")).alias("see"),
        F.sum(F.col("de") * F.col("de")).alias("sdd"),
    )
    dw = F.col("sdd").cast("double") / F.col("see").cast("double")
    return sums.select(
        "n_days",
        snap_round(dw, 6).alias("durbin_watson"),
        (snap_round(dw, 6) < 1.5).alias("positive_autocorrelation"),
    )


DURBIN_WATSON_SQL = """
WITH daily AS (
    SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
    FROM orders GROUP BY 1
),
xy AS (SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS x,
              CAST(y AS DECIMAL(18,2)) AS y FROM daily),
s AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(x) AS DOUBLE) AS sx,
           CAST(SUM(y) AS DOUBLE) AS sy,
           CAST(SUM(y * CAST(x AS DECIMAL(10,0))) AS DOUBLE) AS sxy,
           CAST(SUM(x * x) AS DOUBLE) AS sxx
    FROM xy
),
fit AS (
    SELECT CAST(ROUND(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx)
               AS DECIMAL(28,10)), 8) AS DOUBLE) AS b,
           CAST(ROUND(CAST((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
               AS DECIMAL(28,10)), 6) AS DOUBLE) AS a
    FROM s
),
resid AS (
    SELECT x,
           CAST(ROUND(CAST(CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE))
               AS DECIMAL(28,6)), 4) AS DECIMAL(20,4)) AS e
    FROM xy CROSS JOIN fit
),
diffed AS (
    SELECT e, e - LAG(e) OVER (ORDER BY x) AS de FROM resid
),
sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           SUM(e * e) AS see,
           SUM(de * de) AS sdd
    FROM diffed
)
SELECT n_days,
       CAST(ROUND(CAST(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
            AS DECIMAL(28,8)), 6) AS DOUBLE) AS durbin_watson,
       CAST(ROUND(CAST(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
            AS DECIMAL(28,8)), 6) AS DOUBLE) < 1.5 AS positive_autocorrelation
FROM sums
"""


REGISTRY["durbin_watson"] = QuerySpec(durbin_watson, DURBIN_WATSON_SQL)


def cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance — WHICH days drive the revenue trend fit: per-point
    influence D_i = e_i²·h_i / (p·s²·(1−h_i)²) with the simple-regression
    leverage h_i = 1/n + (x_i − x̄)²/Sxx in closed form. The last member of
    the regression-diagnostics arc (fit → metrics → backtest → interval →
    assumption test → INFLUENCE): a promotion spike or a data glitch shows
    up here before it silently bends the forecast.

    All scalars (x̄, Sxx, s², n) assemble from the same exact sufficient
    statistics as the fit and ride one broadcast row; per-day leverage,
    residual, and D are scan-stage algebra with one snap each. Top-10 by
    D via TakeOrdered — at any SF the influential-day report is 10 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y")
    )
    xy = daily.select(
        "d",
        F.datediff("d", F.lit("1970-01-01")).cast("long").alias("x"),
        F.col("y").cast("decimal(18,2)").alias("y"),
    ).localCheckpoint()
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("x").cast("decimal(10,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx_raw"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy_raw"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx_raw") - F.col("sx") * F.col("sx")
    )
    a_ = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    sse = (
        F.col("syy_raw")
        - a_ * F.col("sy")
        - slope * F.col("sxy")
    )
    fit = s.select(
        F.round(slope.cast("decimal(28,10)"), 8).cast("double").alias("b"),
        F.round(a_.cast("decimal(28,10)"), 6).cast("double").alias("a"),
        F.col("n"),
        F.round((F.col("sx") / F.col("n")).cast("decimal(28,10)"), 6)
        .cast("double")
        .alias("xbar"),
        F.round(
            (F.col("sxx_raw") - F.col("sx") * F.col("sx") / F.col("n")).cast(
                "decimal(28,6)"
            ),
            4,
        )
        .cast("double")
        .alias("sxx_c"),
        F.round((sse / (F.col("n") - 2.0)).cast("decimal(28,6)"), 4)
        .cast("double")
        .alias("s2"),
    )
    xd = F.col("x").cast("double")
    e = F.col("y").cast("double") - (F.col("a") + F.col("b") * xd)
    h = 1.0 / F.col("n") + (xd - F.col("xbar")) * (xd - F.col("xbar")) / F.col(
        "sxx_c"
    )
    d_cook = (e * e * h) / (2.0 * F.col("s2") * (1.0 - h) * (1.0 - h))
    return (
        xy.crossJoin(F.broadcast(fit))
        .select(
            "d",
            snap_round(e, 2).alias("residual"),
            snap_round(h, 6).alias("leverage"),
            snap_round(d_cook, 6).alias("cooks_d"),
        )
        .orderBy(F.desc("cooks_d"), "d")
        .limit(10)
    )


COOKS_DISTANCE_SQL = """
WITH daily AS (
    SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
    FROM orders GROUP BY 1
),
xy AS (SELECT d, CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS x,
              CAST(y AS DECIMAL(18,2)) AS y FROM daily),
s AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(x) AS DOUBLE) AS sx,
           CAST(SUM(y) AS DOUBLE) AS sy,
           CAST(SUM(y * CAST(x AS DECIMAL(10,0))) AS DOUBLE) AS sxy,
           CAST(SUM(x * x) AS DOUBLE) AS sxx_raw,
           CAST(SUM(y * y) AS DOUBLE) AS syy_raw
    FROM xy
),
fit AS (
    SELECT CAST(ROUND(CAST((n * sxy - sx * sy) / (n * sxx_raw - sx * sx)
               AS DECIMAL(28,10)), 8) AS DOUBLE) AS b,
           CAST(ROUND(CAST((sy - ((n * sxy - sx * sy) / (n * sxx_raw - sx * sx)) * sx) / n
               AS DECIMAL(28,10)), 6) AS DOUBLE) AS a,
           n,
           CAST(ROUND(CAST(sx / n AS DECIMAL(28,10)), 6) AS DOUBLE) AS xbar,
           CAST(ROUND(CAST(sxx_raw - sx * sx / n AS DECIMAL(28,6)), 4) AS DOUBLE)
               AS sxx_c,
           CAST(ROUND(CAST(
               (syy_raw
                - ((sy - ((n * sxy - sx * sy) / (n * sxx_raw - sx * sx)) * sx) / n) * sy
                - ((n * sxy - sx * sy) / (n * sxx_raw - sx * sx)) * sxy)
               / (n - 2.0)
               AS DECIMAL(28,6)), 4) AS DOUBLE) AS s2
    FROM s
)
SELECT d,
       CAST(ROUND(CAST(CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE))
            AS DECIMAL(28,8)), 2) AS DOUBLE) AS residual,
       CAST(ROUND(CAST(1.0 / n + (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar)
            / sxx_c AS DECIMAL(28,8)), 6) AS DOUBLE) AS leverage,
       CAST(ROUND(CAST(
           ((CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE)))
            * (CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE)))
            * (1.0 / n + (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar) / sxx_c))
           / (2.0 * s2
              * (1.0 - (1.0 / n + (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar) / sxx_c))
              * (1.0 - (1.0 / n + (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar) / sxx_c)))
           AS DECIMAL(28,8)), 6) AS DOUBLE) AS cooks_d
FROM xy CROSS JOIN fit
ORDER BY cooks_d DESC, d
LIMIT 10
"""


REGISTRY["cooks_distance"] = QuerySpec(cooks_distance, COOKS_DISTANCE_SQL)


def _backtest_origins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-origin one-step-ahead frame shared by the forecast-evaluation
    pair (mincer_zarnowitz / diebold_mariano): for every origin day with a
    30-day burn-in, the running-sum OLS prediction for t+1 (snapped at
    4 dp), the realized value, and the snapped absolute errors of the OLS
    and seasonal-naive forecasters — the forecast_backtest construction
    re-exposed at origin grain."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y")
    )
    xy = daily.select(
        F.datediff("d", F.lit("1970-01-01")).cast("long").alias("x"),
        F.col("y").cast("decimal(18,2)").alias("y"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("x")
    pref = xy.select(
        "x",
        "y",
        F.count(F.lit(1)).over(w).cast("long").alias("n_c"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("y") * F.col("x").cast("decimal(10,0)")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
        F.lead("x").over(wl).alias("x_next"),
        F.lead("y").over(wl).alias("y_next"),
        F.lag("y", 6).over(wl).alias("y_lag6"),
    )
    n = F.col("n_c").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    yhat = (sy - slope * sx) / n + slope * F.col("x_next").cast("double")
    return pref.filter(
        (F.col("n_c") >= 30)
        & F.col("x_next").isNotNull()
        & F.col("y_lag6").isNotNull()
    ).select(
        F.round(yhat.cast("decimal(28,4)"), 4).cast("decimal(20,4)").alias("p"),
        F.col("y_next").cast("decimal(18,2)").alias("y_next"),
        F.round(
            F.abs(yhat - F.col("y_next").cast("double")).cast("decimal(28,6)"), 4
        )
        .cast("decimal(18,4)")
        .alias("err_ols"),
        F.round(
            F.abs(
                (F.col("y_lag6") - F.col("y_next")).cast("double")
            ).cast("decimal(28,6)"),
            4,
        )
        .cast("decimal(18,4)")
        .alias("err_snaive"),
    )


_ORIGINS_SQL = """
daily AS (
    SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
    FROM orders GROUP BY 1
),
xy AS (SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS x,
              CAST(y AS DECIMAL(18,2)) AS y FROM daily),
pref AS (
    SELECT x, y,
           CAST(COUNT(*) OVER wp AS BIGINT) AS n_c,
           CAST(SUM(x) OVER wp AS BIGINT) AS sx,
           SUM(y) OVER wp AS sy,
           SUM(y * CAST(x AS DECIMAL(10,0))) OVER wp AS sxy,
           CAST(SUM(x * x) OVER wp AS BIGINT) AS sxx,
           LEAD(x) OVER (ORDER BY x) AS x_next,
           LEAD(y) OVER (ORDER BY x) AS y_next,
           LAG(y, 6) OVER (ORDER BY x) AS y_lag6
    FROM xy
    WINDOW wp AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
origins AS (
    SELECT CAST(ROUND(CAST(
               (CAST(sy AS DOUBLE)
                - ((CAST(n_c AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n_c AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * CAST(sx AS DOUBLE)) / CAST(n_c AS DOUBLE)
               + ((CAST(n_c AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n_c AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * CAST(x_next AS DOUBLE)
               AS DECIMAL(28,4)), 4) AS DECIMAL(20,4)) AS p,
           CAST(y_next AS DECIMAL(18,2)) AS y_next,
           CAST(ROUND(CAST(ABS(
               ((CAST(sy AS DOUBLE)
                 - ((CAST(n_c AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n_c AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                   * CAST(sx AS DOUBLE)) / CAST(n_c AS DOUBLE)
                + ((CAST(n_c AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n_c AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * CAST(x_next AS DOUBLE))
               - CAST(y_next AS DOUBLE)) AS DECIMAL(28,6)), 4) AS DECIMAL(18,4))
               AS err_ols,
           CAST(ROUND(CAST(ABS(CAST(y_lag6 - y_next AS DOUBLE))
               AS DECIMAL(28,6)), 4) AS DECIMAL(18,4)) AS err_snaive
    FROM pref
    WHERE n_c >= 30 AND x_next IS NOT NULL AND y_lag6 IS NOT NULL
)
"""


def mincer_zarnowitz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mincer-Zarnowitz forecast calibration: regress the REALIZED value
    on the one-step OLS forecast over every backtest origin — an unbiased,
    efficient forecaster has intercept 0 and slope 1, and a slope
    significantly off 1 says the model systematically over/under-reacts
    (the question MAE/MASE in forecast_backtest cannot answer).

    Forecasts snap at 4 dp into DECIMAL(20,4) at origin grain, realized
    values are exact money decimals, so all six regression moments are
    exact decimal sums; slope/intercept/R² and the t-statistic of
    (slope − 1) are single closed-form double expressions, snapped.
    |t| > 1.96 flags miscalibration.

    Scale: the forecast_backtest posture exactly — one calendar-bounded
    window pass plus a 1-row rollup.
    """
    og = _backtest_origins(spark, sf_dir)
    sums = og.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p").cast("decimal(38,4)").alias("sp"),
        F.sum("y_next").cast("decimal(38,2)").alias("sy"),
        F.sum(F.col("p").cast("decimal(18,4)") * F.col("y_next").cast("decimal(18,2)"))
        .cast("decimal(38,6)")
        .alias("spy"),
        F.sum(F.col("p").cast("decimal(18,4)") * F.col("p").cast("decimal(18,4)"))
        .cast("decimal(38,8)")
        .alias("spp"),
        F.sum(
            F.col("y_next").cast("decimal(18,2)") * F.col("y_next").cast("decimal(18,2)")
        )
        .cast("decimal(38,4)")
        .alias("syy"),
    )
    n = F.col("n").cast("double")
    sp, sy = F.col("sp").cast("double"), F.col("sy").cast("double")
    spy = F.col("spy").cast("double")
    spp, syy = F.col("spp").cast("double"), F.col("syy").cast("double")
    sxx_c = spp - sp * sp / n
    sxy_c = spy - sp * sy / n
    syy_c = syy - sy * sy / n
    b = sxy_c / sxx_c
    a = (sy - b * sp) / n
    rss = syy_c - b * b * sxx_c
    se_b = F.sqrt((rss / (n - 2.0)) / sxx_c)
    t_slope = F.when(rss > 0, snap_round((b - 1.0) / se_b, 4))
    return sums.select(
        F.col("n").alias("n_origins"),
        snap_round(a, 4).alias("intercept"),
        snap_round(b, 6).alias("slope"),
        snap_round(
            F.when(syy_c > 0, 1.0 - rss / syy_c), 6
        ).alias("r2"),
        t_slope.alias("t_slope_vs_1"),
        (F.abs(t_slope) > 1.96).alias("miscalibrated"),
    )


MINCER_ZARNOWITZ_SQL = f"""
WITH {_ORIGINS_SQL},
sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(p) AS DECIMAL(38,4)) AS sp,
           CAST(SUM(y_next) AS DECIMAL(38,2)) AS sy,
           CAST(SUM(CAST(p AS DECIMAL(19,4)) * CAST(y_next AS DECIMAL(19,2)))
               AS DECIMAL(38,6)) AS spy,
           CAST(SUM(CAST(p AS DECIMAL(19,4)) * CAST(p AS DECIMAL(19,4)))
               AS DECIMAL(38,8)) AS spp,
           CAST(SUM(CAST(y_next AS DECIMAL(19,2)) * CAST(y_next AS DECIMAL(19,2)))
               AS DECIMAL(38,4)) AS syy
    FROM origins
),
stat AS (
    SELECT n,
           CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n AS sxx_c,
           CAST(spy AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sy AS DOUBLE) / n AS sxy_c,
           CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n AS syy_c,
           CAST(sp AS DOUBLE) AS spd, CAST(sy AS DOUBLE) AS syd
    FROM sums
),
fit AS (
    SELECT n, sxx_c, syy_c, spd, syd,
           sxy_c / sxx_c AS b,
           syy_c - (sxy_c / sxx_c) * (sxy_c / sxx_c) * sxx_c AS rss
    FROM stat
)
SELECT n AS n_origins,
       CAST(ROUND(CAST((syd - b * spd) / n AS DECIMAL(28,8)), 4) AS DOUBLE)
           AS intercept,
       CAST(ROUND(CAST(b AS DECIMAL(28,8)), 6) AS DOUBLE) AS slope,
       CAST(ROUND(CAST(CASE WHEN syy_c > 0 THEN 1.0 - rss / syy_c END
           AS DECIMAL(28,8)), 6) AS DOUBLE) AS r2,
       CASE WHEN rss > 0 THEN CAST(ROUND(CAST(
           (b - 1.0) / SQRT((rss / (n - 2.0)) / sxx_c)
           AS DECIMAL(28,8)), 4) AS DOUBLE) END AS t_slope_vs_1,
       CASE WHEN rss > 0 THEN ABS(CAST(ROUND(CAST(
           (b - 1.0) / SQRT((rss / (n - 2.0)) / sxx_c)
           AS DECIMAL(28,8)), 4) AS DOUBLE)) > 1.96 END AS miscalibrated
FROM fit
"""

REGISTRY["mincer_zarnowitz"] = QuerySpec(mincer_zarnowitz, MINCER_ZARNOWITZ_SQL)


def diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano forecast comparison: is the OLS trend forecaster
    BETTER than the seasonal-naive lag-7 baseline, or just differently
    wrong? DM tests the mean of the per-origin squared-loss differential
    d_t = e_ols² − e_naive² against zero — the formal version of
    forecast_backtest's MASE ratio. For one-step-ahead forecasts the
    differential is serially uncorrelated under the null, so the plain
    sample variance is the right denominator (Diebold & Mariano 1995;
    HAC lags enter only at h > 1).

    Per-origin errors are 4-dp decimals, so every d_t and d_t² is exact
    decimal algebra; only the final DM = d̄/√(s²_d/n) is a snapped
    double. DM < −1.96: the OLS model significantly beats the baseline.

    Scale: the forecast_backtest posture — one calendar-bounded window
    pass, one rollup.
    """
    og = _backtest_origins(spark, sf_dir)
    # d snaps to 2 dp so d² stays EXACT decimal (a double Σd² would be
    # partial-order-dependent across partitions)
    d = (
        F.col("err_ols").cast("decimal(18,4)") * F.col("err_ols").cast("decimal(18,4)")
        - F.col("err_snaive").cast("decimal(18,4)")
        * F.col("err_snaive").cast("decimal(18,4)")
    ).cast("decimal(18,2)")
    sums = og.select(d.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("decimal(38,2)").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("decimal(38,4)").alias("sdd"),
    )
    n = F.col("n").cast("double")
    mean_d = F.col("sd").cast("double") / n
    var_d = (F.col("sdd").cast("double") - n * mean_d * mean_d) / (n - 1.0)
    dm = F.when(var_d > 0, snap_round(mean_d / F.sqrt(var_d / n), 4))
    return sums.select(
        F.col("n").alias("n_origins"),
        snap_round(mean_d, 2).alias("mean_loss_diff"),
        dm.alias("dm_stat"),
        (dm < -1.96).alias("ols_significantly_better"),
        (dm > 1.96).alias("naive_significantly_better"),
    )


DIEBOLD_MARIANO_SQL = f"""
WITH {_ORIGINS_SQL},
diffs AS (
    SELECT CAST(CAST(err_ols AS DECIMAL(19,4)) * CAST(err_ols AS DECIMAL(19,4))
               - CAST(err_snaive AS DECIMAL(19,4))
                 * CAST(err_snaive AS DECIMAL(19,4))
               AS DECIMAL(19,2)) AS d
    FROM origins
),
sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS DECIMAL(38,2)) AS sd,
           CAST(SUM(d * d) AS DECIMAL(38,4)) AS sdd
    FROM diffs
),
stat AS (
    SELECT n,
           CAST(sd AS DOUBLE) / n AS mean_d,
           (CAST(sdd AS DOUBLE) - n * (CAST(sd AS DOUBLE) / n)
               * (CAST(sd AS DOUBLE) / n)) / (n - 1.0) AS var_d
    FROM sums
)
SELECT n AS n_origins,
       CAST(ROUND(CAST(mean_d AS DECIMAL(28,8)), 2) AS DOUBLE) AS mean_loss_diff,
       CASE WHEN var_d > 0 THEN CAST(ROUND(CAST(mean_d / SQRT(var_d / n)
           AS DECIMAL(28,8)), 4) AS DOUBLE) END AS dm_stat,
       CASE WHEN var_d > 0 THEN CAST(ROUND(CAST(mean_d / SQRT(var_d / n)
           AS DECIMAL(28,8)), 4) AS DOUBLE) < -1.96 END
           AS ols_significantly_better,
       CASE WHEN var_d > 0 THEN CAST(ROUND(CAST(mean_d / SQRT(var_d / n)
           AS DECIMAL(28,8)), 4) AS DOUBLE) > 1.96 END
           AS naive_significantly_better
FROM stat
"""

REGISTRY["diebold_mariano"] = QuerySpec(diebold_mariano, DIEBOLD_MARIANO_SQL)


def conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical validity check of the split-conformal recipe: fit on the
    first 50% of days, calibrate the 90% interval on the next 25%, then
    MEASURE coverage on the final 25% the interval never saw.
    conformal_interval promises >= 90% by exchangeability; this query is
    the audit that the promise survives this series' actual drift - the
    number an ML-ops dashboard tracks next to the interval itself.

    Same relational discipline as conformal_interval: data-derived split
    points, exact sufficient-statistic fit, order-statistic calibration
    quantile (no interpolation), snapped residuals. Coverage is an exact
    count ratio; the one-sided binomial z against 0.9 flags significant
    undercoverage (z < -1.645).

    Scale: one keyed day aggregate, windows over the calendar-bounded
    relation, two 1-row broadcasts.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y")
    )
    wd = Window.orderBy("d")
    xy = daily.select(
        F.datediff("d", F.lit("1970-01-01")).cast("long").alias("x"),
        F.col("y").cast("decimal(18,2)").alias("y"),
        F.row_number().over(wd).cast("long").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n_days"),
    ).localCheckpoint()
    train = xy.filter(F.col("rn") * 2 <= F.col("n_days"))
    s = train.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("x").cast("decimal(10,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = s.select(
        F.round(slope.cast("decimal(28,10)"), 8).cast("double").alias("b"),
        F.round(
            ((F.col("sy") - slope * F.col("sx")) / F.col("n")).cast(
                "decimal(28,10)"
            ),
            6,
        )
        .cast("double")
        .alias("a"),
    )
    resid = F.round(
        F.abs(
            F.col("a") + F.col("b") * F.col("x").cast("double")
            - F.col("y").cast("double")
        ).cast("decimal(28,6)"),
        4,
    ).cast("decimal(20,4)")
    cal = (
        xy.filter(
            (F.col("rn") * 2 > F.col("n_days"))
            & (F.col("rn") * 4 <= F.col("n_days") * 3)
        )
        .crossJoin(F.broadcast(fit))
        .select(resid.alias("resid"))
    )
    wr = Window.orderBy("resid")
    whole = Window.partitionBy()
    q_row = (
        cal.select(
            "resid",
            F.row_number().over(wr).cast("long").alias("r"),
            F.count(F.lit(1)).over(whole).cast("long").alias("n_cal"),
        )
        .filter(
            F.col("r")
            == F.least(
                F.ceil((F.col("n_cal") + 1) * 0.9).cast("long"), F.col("n_cal")
            )
        )
        .select(F.col("resid").alias("q_hat"), "n_cal")
    )
    test = (
        xy.filter(F.col("rn") * 4 > F.col("n_days") * 3)
        .crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(q_row))
        .select(
            "n_cal",
            "q_hat",
            (resid <= F.col("q_hat")).cast("long").alias("covered"),
        )
    )
    agg = test.groupBy("n_cal", "q_hat").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum("covered").cast("long").alias("n_covered"),
    )
    cov = F.col("n_covered").cast("double") / F.col("n_test").cast("double")
    z = (cov - 0.9) / F.sqrt(
        0.9 * 0.1 / F.col("n_test").cast("double")
    )
    return agg.select(
        "n_cal",
        F.col("q_hat").cast("double").alias("q_hat"),
        "n_test",
        "n_covered",
        snap_round(cov, 6).alias("coverage"),
        snap_round(z, 4).alias("z_vs_nominal"),
        (snap_round(z, 4) < -1.645).alias("undercovers"),
    )


CONFORMAL_COVERAGE_SQL = """
WITH daily AS (
    SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
    FROM orders GROUP BY 1
),
xy AS (
    SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS x,
           CAST(y AS DECIMAL(18,2)) AS y,
           CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_days
    FROM daily
),
fit AS (
    SELECT CAST(ROUND(CAST(
               (n * sxy - sx * sy) / (n * sxx - sx * sx)
               AS DECIMAL(28,10)), 8) AS DOUBLE) AS b,
           CAST(ROUND(CAST(
               (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
               AS DECIMAL(28,10)), 6) AS DOUBLE) AS a
    FROM (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(y * CAST(x AS DECIMAL(10,0))) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx
        FROM xy WHERE rn * 2 <= n_days
    )
),
cal AS (
    SELECT CAST(ROUND(CAST(ABS(a + b * CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
               AS DECIMAL(28,6)), 4) AS DECIMAL(20,4)) AS resid
    FROM xy CROSS JOIN fit
    WHERE rn * 2 > n_days AND rn * 4 <= n_days * 3
),
q_row AS (
    SELECT resid AS q_hat, n_cal FROM (
        SELECT resid,
               CAST(ROW_NUMBER() OVER (ORDER BY resid) AS BIGINT) AS r,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_cal
        FROM cal
    ) WHERE r = LEAST(CAST(CEIL((n_cal + 1) * 0.9) AS BIGINT), n_cal)
),
test AS (
    SELECT q.n_cal, q.q_hat,
           CASE WHEN CAST(ROUND(CAST(ABS(a + b * CAST(x AS DOUBLE)
                    - CAST(y AS DOUBLE)) AS DECIMAL(28,6)), 4)
                    AS DECIMAL(20,4)) <= q.q_hat
                THEN 1 ELSE 0 END AS covered
    FROM xy CROSS JOIN fit CROSS JOIN q_row q
    WHERE rn * 4 > n_days * 3
),
agg AS (
    SELECT n_cal, q_hat,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(covered) AS BIGINT) AS n_covered
    FROM test GROUP BY 1, 2
)
SELECT n_cal, CAST(q_hat AS DOUBLE) AS q_hat, n_test, n_covered,
       CAST(ROUND(CAST(CAST(n_covered AS DOUBLE) / n_test
           AS DECIMAL(28,8)), 6) AS DOUBLE) AS coverage,
       CAST(ROUND(CAST((CAST(n_covered AS DOUBLE) / n_test - 0.9)
           / SQRT(0.9 * 0.1 / n_test) AS DECIMAL(28,8)), 4) AS DOUBLE)
           AS z_vs_nominal,
       CAST(ROUND(CAST((CAST(n_covered AS DOUBLE) / n_test - 0.9)
           / SQRT(0.9 * 0.1 / n_test) AS DECIMAL(28,8)), 4) AS DOUBLE)
           < -1.645 AS undercovers
FROM agg
"""

REGISTRY["conformal_coverage"] = QuerySpec(conformal_coverage, CONFORMAL_COVERAGE_SQL)
