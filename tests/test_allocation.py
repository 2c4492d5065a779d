"""Unit + property tests for the greedy allocator (SURVEY.md §5.2 items 3-4):
edge cases observed in the real reference data (null qty, stock exactly
exhausted, skip-then-fill) and invariants (fulfilled ≤ requested, Σfulfilled
≤ stock, cancelled ⇒ line_total 0, repartition-invariance)."""

from __future__ import annotations

import pandas as pd
import pytest

from candyspark.operators.allocation import allocate_greedy


def _run(spark, rows, stock, parts=None):
    df = spark.createDataFrame(
        [(1, i, ts, float(q), float(stock), 2.5) for i, (ts, q) in enumerate(rows)],
        "pid int, line_id int, ts int, qty double, stock double, unit double",
    )
    if parts:
        df = df.repartition(parts)
    out = allocate_greedy(
        df,
        group_col="pid",
        order_cols=["ts"],
        qty_col="qty",
        stock_col="stock",
        unit_price_col="unit",
        out_keys=["pid", "line_id"],
    )
    return out.toPandas().sort_values("line_id").reset_index(drop=True)


def test_greedy_skip_then_fill(spark):
    """A too-big request cancels, but a smaller LATER request still fills —
    greedy-with-skip, not first-fit-stop (reference :47-57)."""
    out = _run(spark, [(1, 5), (2, 10), (3, 4)], stock=9)
    assert list(out.fulfilled_qty) == [5.0, 0.0, 4.0]


def test_exact_exhaustion(spark):
    """qty == available fulfills (<=, not <); next request cancels."""
    out = _run(spark, [(1, 5), (2, 5), (3, 1)], stock=10)
    assert list(out.fulfilled_qty) == [5.0, 5.0, 0.0]


def test_zero_stock_cancels_everything(spark):
    out = _run(spark, [(1, 1), (2, 2)], stock=0)
    assert list(out.fulfilled_qty) == [0.0, 0.0]
    assert list(out.line_total) == [0.0, 0.0]


def test_chronological_order_not_input_order(spark):
    """Allocation follows the sort key, not row arrival order."""
    out = _run(spark, [(3, 4), (1, 4), (2, 4)], stock=8)
    # ts=1 and ts=2 fill; ts=3 (first in input) cancels.
    assert list(out.fulfilled_qty) == [0.0, 4.0, 4.0]


def test_invariants_and_repartition_stability(spark):
    rows = [(i, (i * 7) % 9 + 1) for i in range(50)]
    base = _run(spark, rows, stock=60)
    assert (base.fulfilled_qty <= base.requested_qty).all()
    assert base.fulfilled_qty.sum() <= 60
    cancelled = base[base.fulfilled_qty == 0]
    assert (cancelled.line_total == 0).all()
    fulfilled = base[base.fulfilled_qty > 0]
    assert (fulfilled.line_total == (fulfilled.fulfilled_qty * 2.5).round(2)).all()
    for parts in (2, 7):
        again = _run(spark, rows, stock=60, parts=parts)
        pd.testing.assert_frame_equal(base, again)


def test_multi_group_independence(spark):
    """Groups allocate independently (per-product state never leaks)."""
    df = spark.createDataFrame(
        [(1, 0, 1, 5.0, 5.0, 1.0), (2, 1, 1, 5.0, 3.0, 1.0)],
        "pid int, line_id int, ts int, qty double, stock double, unit double",
    )
    out = (
        allocate_greedy(
            df, "pid", ["ts"], "qty", "stock", "unit", ["pid", "line_id"]
        )
        .toPandas()
        .sort_values("line_id")
    )
    assert list(out.fulfilled_qty) == [5.0, 0.0]
