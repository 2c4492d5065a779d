"""Mutation-shaped operators: MERGE upsert, snapshot diff (CDC), SCD2.

The reference's only mutation is the inventory decrement — a full-outer
join + ``when`` (/root/reference/src/data_processor.py:456-464, SURVEY.md
§2.4 J2). This module generalizes that shape into the three mutations a
warehouse user expects from an engine: key-based upsert (MERGE INTO
semantics over immutable storage), snapshot differencing (CDC extraction
between two table versions), and slowly-changing-dimension type-2 history
construction.

Scale posture: all three are single-shuffle relational plans — one
full-outer or window pass on the key — with no driver-side state. MERGE on
100 TB targets is a shuffle-on-key join whose output REPLACES the target
partition set (copy-on-write, the Delta/Iceberg model); partition-level
pruning of untouched partitions is a layout concern (sources/sinks
partitionBy) orthogonal to the join itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SRC = "_candyspark_src_marker"


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE INTO semantics: WHEN MATCHED THEN UPDATE SET * / WHEN NOT
    MATCHED THEN INSERT * — source rows win on key match, source-only rows
    insert, unmatched target rows persist. Both inputs must share a schema.

    One full-outer shuffle join on the keys; per-column resolution is a
    codegen ``when`` on a source-presence marker (NOT per-column coalesce,
    which would corrupt legitimately-NULL source values).
    """
    value_cols = [c for c in target.columns if c not in keys]
    if set(source.columns) != set(target.columns):
        raise ValueError("merge_upsert requires identical target/source schemas")
    src = source.select(
        *keys, *[F.col(c).alias(f"{c}{_SRC}") for c in value_cols]
    ).withColumn(_SRC, F.lit(1))
    joined = target.join(src, list(keys), "full")
    resolved = [
        F.when(F.col(_SRC).isNotNull(), F.col(f"{c}{_SRC}")).otherwise(F.col(c)).alias(c)
        for c in value_cols
    ]
    return joined.select(*keys, *resolved)


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: Sequence[str], compare_cols: Sequence[str]
) -> DataFrame:
    """CDC between two snapshots: one row per changed key with change_type
    in ('insert', 'delete', 'update'). Unchanged keys are filtered out.

    One full-outer join on keys; the change classification and the
    column-wise inequality (NULL-safe via <=>) are codegen expressions.
    Emits the NEW image for inserts/updates and the OLD image for deletes
    (the argument order downstream appliers expect).
    """
    o = old.select(*keys, *[F.col(c).alias(f"{c}_old") for c in compare_cols]).withColumn(
        "_old_present", F.lit(1)
    )
    n = new.select(*keys, *[F.col(c).alias(f"{c}_new") for c in compare_cols]).withColumn(
        "_new_present", F.lit(1)
    )
    joined = o.join(n, list(keys), "full")
    any_change = None
    for c in compare_cols:
        neq = ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
        any_change = neq if any_change is None else (any_change | neq)
    change_type = (
        F.when(F.col("_old_present").isNull(), F.lit("insert"))
        .when(F.col("_new_present").isNull(), F.lit("delete"))
        .when(any_change, F.lit("update"))
    )
    image = [
        F.when(F.col("_new_present").isNotNull(), F.col(f"{c}_new"))
        .otherwise(F.col(f"{c}_old"))
        .alias(c)
        for c in compare_cols
    ]
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select("change_type", *keys, *image)
    )


def scd2_history(
    updates: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: one
    validity interval per observed value, ``valid_from`` = the change's
    timestamp, ``valid_to`` = the next change's timestamp (NULL = current).

    Consecutive duplicates (same values re-asserted) are collapsed first —
    a lag compare — so intervals reflect VALUE changes, not log entries.
    One window shuffle on the keys covers both the collapse and the
    interval close; no self-join. Pass ``order_cols`` (e.g. ``[ts, seq]``)
    to pin a total order when the timestamp alone can tie — the SURVEY.md
    §2.9 tie-break lesson applied to SCD2.
    """
    order_cols = list(order_cols) if order_cols else [ts_col]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    same_as_prev = None
    for c in value_cols:
        eq = F.col(c).eqNullSafe(F.lag(c).over(w))
        same_as_prev = eq if same_as_prev is None else (same_as_prev & eq)
    # "has a previous row" must be detected independently of the values:
    # lag(value) is NULL both for a missing previous row AND for a previous
    # NULL value, and eqNullSafe(NULL, NULL) is TRUE — without this marker a
    # key whose FIRST value is NULL would lose its opening interval.
    has_prev = F.lag(F.lit(1)).over(w).isNotNull()
    carried = list(dict.fromkeys([ts_col, *order_cols]))
    changes = updates.select(*keys, *carried, *value_cols).withColumn(
        "_is_change", ~has_prev | ~same_as_prev
    )
    changes = changes.filter(F.col("_is_change")).drop("_is_change")
    return changes.select(
        *keys,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )
