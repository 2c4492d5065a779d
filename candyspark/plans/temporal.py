"""Temporal-join queries (as-of, banded range) over the events table, each
with an exact DuckDB mirror. The mirrors reproduce the Spark formulation's
tie-breaks verbatim (same (ts, side, seq) total order; same inclusive range
predicate), so the hash compare is exact, not approximate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from candyspark.operators.temporal import (
    asof_join,
    asof_join_cogrouped,
    range_join_banded,
)
from candyspark.plans import QuerySpec
from candyspark.sources.readers import load_table


def q_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-shaped as-of join: each purchase attributed to the user's
    most recent click at-or-before it (null when the user never clicked)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    out = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_vals=["event_id"],
        seq_col="event_id",
        prefix="click_",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "user_id",
        F.col("click_event_id").alias("click_id"),
        F.col("click_ts").alias("click_ts"),
    )


ASOF_CLICK_SQL = """
WITH u AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, 0 AS side, event_id,
           event_id AS r_id, CAST(ts AS TIMESTAMP) AS r_ts
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, CAST(ts AS TIMESTAMP), 1, event_id, NULL, NULL
    FROM events WHERE event_type = 'purchase'
),
w AS (
    SELECT user_id, ts, side, event_id,
           last_value(r_id IGNORE NULLS) OVER win AS click_id,
           last_value(r_ts IGNORE NULLS) OVER win AS click_ts
    FROM u
    WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, ts AS purchase_ts, user_id, click_id, click_ts
FROM w WHERE side = 1
"""


def q_range_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases landing inside [error_ts, error_ts + 1 h] of the same user —
    the point-in-interval shape, banded so Catalyst plans an equi-join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "user_id",
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("error_end"),
        "user_id",
    )
    return range_join_banded(
        purchases,
        errors,
        by=["user_id"],
        left_point="purchase_ts",
        right_start="error_start",
        right_end="error_end",
        band_seconds=3600,
    ).select("purchase_id", "purchase_ts", "user_id", "error_id", "error_start")


RANGE_JOIN_SQL = """
SELECT p.event_id AS purchase_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       p.user_id AS user_id,
       e.event_id AS error_id,
       CAST(e.ts AS TIMESTAMP) AS error_start
FROM events p JOIN events e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND CAST(p.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP)
 AND CAST(p.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP) + INTERVAL '1 hour'
"""


def q_asof_cogroup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The click-attribution as-of join executed through the OTHER physical
    strategy — ``cogroup().applyInPandas`` with per-user ``merge_asof``
    (operators/temporal.asof_join_cogrouped) — against the SAME DuckDB
    oracle as the window form: two execution paths, one contract, both
    hash-checked."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    out = asof_join_cogrouped(
        purchases,
        clicks,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_vals=["event_id"],
        seq_col="event_id",
        prefix="click_",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "user_id",
        F.col("click_event_id").alias("click_id"),
        F.col("click_ts").alias("click_ts"),
    )


REGISTRY: dict[str, QuerySpec] = {
    "asof_click_attribution": QuerySpec(q_asof_click_attribution, ASOF_CLICK_SQL),
    "asof_cogroup_attribution": QuerySpec(q_asof_cogroup_attribution, ASOF_CLICK_SQL),
    "range_join_error_window": QuerySpec(q_range_join_error_window, RANGE_JOIN_SQL),
}
