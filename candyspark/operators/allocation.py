"""Greedy chronological inventory allocation — the reference's core custom
operator (SURVEY.md §2.9; /root/reference/src/data_processor.py:33-62,400-429).

Reference semantics (greedy-with-skip, all-or-nothing): scan a product's
requests in chronological order; a request is fulfilled entirely iff
``0 < qty <= available`` (then stock decrements), otherwise fulfilled 0
(cancelled) — but scanning CONTINUES, so a smaller later request can still
fill. No partial fulfillment.

The reference runs this as a driver-collected dict + RDD
``groupByKey().mapValues(list).flatMap`` inside a per-day Python loop
(anti-patterns §4.2: full-row pickling, 10× rescans, driver state). Here it
is one ``groupBy(group).applyInPandas`` pass over the whole period:

- state (stock) travels IN the data via a broadcast dim join, not a driver
  dict (reference :401-406);
- Arrow batches instead of Python-object pickling;
- the day dimension is just the sort key — one shuffle total, and the plan
  scales per-group across 1000 executors (each part's history is one group;
  the sort inside the kernel is per-group, not global).

Determinism: the reference's allocation order is underdetermined at
stock-exhaustion (its own outputs diverge from its goldens on 290 line items
— SURVEY.md §2.9 [verified]). This rebuild pins a TOTAL order via
``order_cols`` (caller must make them a unique key, e.g.
(order_datetime, order_id) / (l_shipdate, l_orderkey, l_linenumber)).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def allocate_greedy(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    qty_col: str,
    stock_col: str,
    unit_price_col: str,
    out_keys: list[str],
) -> DataFrame:
    """All-or-nothing greedy allocation per ``group_col``.

    ``df`` must carry, per row: the requested ``qty_col``, the group's
    ``stock_col`` (constant within a group, typically from a broadcast dim
    join), and the per-unit ``unit_price_col``. Returns one row per input
    row: ``out_keys + [requested_qty, fulfilled_qty, line_total]`` where
    cancelled lines have fulfilled_qty = 0 and line_total = 0.0
    (line_total = round(fulfilled × unit_price, 2), reference :57).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [T.StructField(k, fields[k]) for k in out_keys]
        + [
            T.StructField("requested_qty", T.DoubleType()),
            T.StructField("fulfilled_qty", T.DoubleType()),
            T.StructField("line_total", T.DoubleType()),
        ]
    )
    cols = list(dict.fromkeys(out_keys + order_cols + [qty_col, stock_col, unit_price_col]))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        available = float(pdf[stock_col].iloc[0])
        qty = pdf[qty_col].to_numpy(dtype=float)
        fulfilled = qty.copy()
        for i in range(len(qty)):
            q = qty[i]
            if 0.0 < q <= available:
                available -= q
            else:  # cancel, keep scanning (greedy-with-skip, reference :47-57)
                fulfilled[i] = 0.0
        out = pdf[out_keys].copy()
        out["requested_qty"] = qty
        unit = pdf[unit_price_col].to_numpy(dtype=float)
        out["fulfilled_qty"] = fulfilled
        out["line_total"] = (fulfilled * unit).round(2)
        return out

    return df.select(*cols).groupBy(group_col).applyInPandas(kernel, schema=out_schema)
