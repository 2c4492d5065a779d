"""Structured Streaming form of the event aggregations (SURVEY.md §2.11).

The batch operators in ``streaming.events`` are the same logical plans
Structured Streaming runs incrementally; this module wires one up as a real
stream: file source → watermark → tumbling-window aggregate → sink. Tests
execute it with ``availableNow`` (process-everything-then-stop) against a
parquet directory and assert the result equals the batch operator — the
batch/streaming unification that makes the engine's windowed operators
deploy as either.

At scale: the watermark bounds state (late events beyond it are dropped and
the window's state evicted); ``availableNow`` is also the production pattern
for incremental batch over a growing directory (checkpointed offsets, no
always-on cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from candyspark.schemas import EVENTS


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events (parquet directory, µs timestamps)."""
    return spark.readStream.schema(EVENTS).parquet(path)


def streaming_tumbling_agg(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window count+sum per event_type — identical
    aggregation to ``events.tumbling_agg`` (kept textually in sync; the
    decimal discipline matters even here for batch/stream equality)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("num_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "num_events",
            "total_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, query_name: str = "events_agg"
) -> None:
    """Drain everything currently in the source into an in-memory sink named
    ``query_name`` (complete mode: final window totals), then stop."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
