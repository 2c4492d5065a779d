"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference's source surface is connector config (CSV/JSON/JDBC/Mongo,
SURVEY.md §2.1); this adds the one source kind Spark itself lets an engine
DEFINE rather than configure: a from-scratch format with its own partition
planning. ``synthetic_events`` generates a deterministic event stream from
a pure content hash — no RNG state, so any row is re-derivable from its
index alone (same discipline as the engine's hash-based sampling), and the
whole source is expressible in ANSI SQL for the DuckDB oracle.

Partition planning is explicit: ``partitions()`` splits the row range into
``partitions`` slices, and each ``read()`` generates only its slice — the
source parallelizes like a real scan (N tasks, no driver materialization).

Scale notes: a Python DataSource row-generator is the SLOW path (one
Python iterator per task, row-at-a-time pickling). That is acceptable for
a synthetic/test source and for low-volume exotic formats; for a real
high-volume format the same class structure accepts Arrow batches
(``read()`` may yield ``pyarrow.RecordBatch``) — the plumbing the engine
would use, kept out of scope here since parquet covers bulk ingest.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("click", "view", "purchase", "error")


class SliceRange(InputPartition):
    """One task's half-open row-index slice [start, end)."""

    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


def row_for_index(i: int) -> tuple[int, int, str, float]:
    """The generation formula — mirrored verbatim in the DuckDB oracle:
    h = first 8 md5 hex digits of the decimal index, as an integer."""
    h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
    return (i, h % 97, EVENT_TYPES[h % 4], ((h // 4) % 100000) / 100.0)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 10000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, math.ceil(self.rows / self.num_partitions))
        return [
            SliceRange(start, min(start + step, self.rows))
            for start in range(0, self.rows, step)
        ]

    def read(self, partition: SliceRange) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield row_for_index(i)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "i BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(dict(self.options))


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering replaces the prior class)."""
    spark.dataSource.register(SyntheticEventsDataSource)
