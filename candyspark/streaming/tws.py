"""Arbitrary stateful streaming via ``transformWithStateInPandas`` (the
state API v2 introduced in Spark 4 — the successor surface to
``applyInPandasWithState`` used by ``streaming/stateful.py``).

The operator here is per-user running totals: keyed ValueState holds
``(event count, value cents)`` and each micro-batch folds its arrivals in
and emits the group's updated snapshot. Money accumulates as integer
CENTS, not float — state mutation order across batches/partitions then
can't perturb the result, which is what makes the output oracle-hashable
against a batch aggregate.

Scale notes: state per key is two int64s, so the state store is O(#users)
regardless of throughput; arrivals shuffle once on the grouping key — the
same single-exchange shape as the batch groupBy. The v2 API adds what
applyInPandasWithState lacks: composite state types (Value/List/Map),
timers, TTL on state, and initial-state bootstrap — the knobs a 100-TB
streaming backfill actually needs (TTL caps state growth; initialState
seeds from a batch snapshot instead of replaying history).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_cents BIGINT"


class RunningTotalsProcessor(StatefulProcessor):
    """Keyed running (count, cents) totals; emits the updated snapshot."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "cnt BIGINT, cents BIGINT")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            cnt, cents = self._totals.get()
        else:
            cnt, cents = 0, 0
        for pdf in rows:
            cnt += len(pdf)
            # values are 2-dp doubles; v*100 rounds to the exact cent int
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        self._totals.update((cnt, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "total_cents": [cents]}
        )

    def close(self) -> None:
        pass


def streaming_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as a state-API-v2 stream (update mode)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
