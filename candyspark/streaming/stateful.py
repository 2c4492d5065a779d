"""Custom stateful streaming operator: the greedy inventory allocator
(SURVEY.md §2.9; /root/reference/src/data_processor.py:33-62) as an
``applyInPandasWithState`` stream.

The batch form (``operators/allocation.allocate_greedy``) folds a whole
period's requests per product in one grouped-map pass. The streaming form
is the same kernel with the *remaining stock* held in Spark's keyed state
store instead of re-derived per pass: each micro-batch's requests for a
product are sorted by (ts, order key) and allocated against the state,
which then carries to the next batch — all-or-nothing fulfillment with
cancellation, no partial fills, exactly the reference's semantics.

Scale notes: state per key is a single float (remaining stock), so the
state store stays O(#products) regardless of throughput; arriving rows
shuffle once on the group key, identical to the batch plan. Ordering is
per-batch: like any event-time stateful operator, cross-batch order is
source-order (use an ordered source — e.g. one file per day with
``maxFilesPerTrigger=1`` — or accept arrival order, as the reference's
daily loop effectively did).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALLOC_OUTPUT = T.StructType(
    [
        T.StructField("product_id", T.LongType()),
        T.StructField("order_id", T.LongType()),
        T.StructField("requested_qty", T.DoubleType()),
        T.StructField("fulfilled_qty", T.DoubleType()),
        T.StructField("line_total", T.DoubleType()),
    ]
)

_STATE = T.StructType([T.StructField("remaining", T.DoubleType())])


def _allocate_with_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "order_id"], kind="mergesort").reset_index(drop=True)
    if state.exists:
        (remaining,) = state.get
    else:  # first batch for this product: stock rides in on the rows (dim join)
        remaining = float(pdf["stock"].iloc[0])
    qty = pdf["qty"].to_numpy(dtype=float)
    fulfilled = qty.copy()
    for i in range(len(qty)):
        q = qty[i]
        if 0.0 < q <= remaining:
            remaining -= q
        else:  # cancel, keep scanning (greedy-with-skip, reference :47-57)
            fulfilled[i] = 0.0
    state.update((remaining,))
    unit = pdf["unit_price"].to_numpy(dtype=float)
    yield pd.DataFrame(
        {
            "product_id": pdf["product_id"],
            "order_id": pdf["order_id"],
            "requested_qty": qty,
            "fulfilled_qty": fulfilled,
            "line_total": (fulfilled * unit).round(2),
        }
    )


def streaming_greedy_allocation(requests: DataFrame) -> DataFrame:
    """Stateful allocation over a stream of line-item requests.

    ``requests`` must be a streaming DataFrame with columns
    ``(product_id, order_id, ts, qty, stock, unit_price)`` — ``stock`` is
    the product's initial inventory (attach via a broadcast dim join; only
    the first-seen row's value seeds the state). Emits one row per request
    with the allocation verdict (append mode).
    """
    return requests.groupBy("product_id").applyInPandasWithState(
        _allocate_with_state,
        outputStructType=ALLOC_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
