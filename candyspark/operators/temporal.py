"""Temporal join operators (SURVEY.md §2.4 notes the reference has no
theta/range/as-of joins — these are the extension forms every event pipeline
needs, built so Spark never falls back to a nested-loop join).

- ``asof_join``: for each left row, the latest right row with
  right_ts ≤ left_ts per key — the union+running-window formulation: tag the
  two sides, union, and take ``last(right_payload, ignoreNulls)`` over a
  running (ts, side, seq) window per key. ONE shuffle, linear state, no
  range-condition join at all (a naive ``l.ts >= r.ts`` equi+theta join is
  quadratic per key; Spark would nested-loop it).
- ``range_join_banded``: point-in-interval joins via interval banding —
  explode each interval into the fixed-width bands it covers, equi-join on
  (key, band), then apply the exact range predicate. Each (point, interval)
  pair meets in exactly one band (the point's), so no dedup pass. Band width
  trades explode factor vs selectivity; Catalyst sees a plain equi-join and
  plans broadcast/shuffle-hash as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    seq_col: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row (ts ≤ left ts)
    per ``by`` key. ``seq_col`` (present in both inputs) makes the order
    total at equal timestamps — at a tie, the right row sorts before the
    left row (so a same-instant right row IS visible) and higher ``seq_col``
    wins among right rows. Unmatched left rows keep nulls."""
    rv = F.struct(
        F.col(right_ts).alias("__ts_v"), *[F.col(c) for c in right_vals]
    )
    rt = (
        right.select(*by, F.col(right_ts).alias("__ts"), F.col(seq_col).alias("__seq"), rv.alias("__rv"))
        .withColumn("__side", F.lit(0))
    )
    lt = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__seq", F.col(seq_col))
        .withColumn("__side", F.lit(1))
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side", "__seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = u.withColumn("__pick", F.last("__rv", ignorenulls=True).over(w))
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("__pick.__ts_v").alias(prefix + right_ts))
    sel += [F.col(f"__pick.{c}").alias(prefix + c) for c in right_vals]
    return picked.filter(F.col("__side") == 1).select(*sel)


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_point: str,
    right_start: str,
    right_end: str,
    band_seconds: int,
) -> DataFrame:
    """Point-in-interval equi-join: rows of ``left`` matched to every row of
    ``right`` whose [start, end] contains the point (inclusive), same ``by``
    key. Inputs must have disjoint non-key column names (rename first)."""
    band = F.lit(int(band_seconds))
    lb = left.withColumn(
        "__band", F.floor(F.col(left_point).cast("long") / band).cast("long")
    )
    rb = right.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start).cast("long") / band).cast("long"),
                F.floor(F.col(right_end).cast("long") / band).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, by + ["__band"])
        .filter(
            (F.col(left_point) >= F.col(right_start))
            & (F.col(left_point) <= F.col(right_end))
        )
        .drop("__band")
    )
