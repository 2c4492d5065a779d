"""Structured Streaming ≡ batch: the streaming tumbling-window aggregate over
a file source (availableNow trigger) produces exactly the batch operator's
result — the unification that lets the windowed operators deploy either way."""

from __future__ import annotations

import pandas as pd

from candyspark.sources.readers import load_table
from candyspark.sources.sinks import save_parquet
from candyspark.streaming.events import tumbling_agg
from candyspark.streaming.stream import (
    read_events_stream,
    run_available_now,
    streaming_tumbling_agg,
)


def test_streaming_equals_batch(spark, tmp_path):
    # Re-land events as a µs-timestamp parquet dir (the stream source can't
    # use the ns-typed original for the same reason batch can't).
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "events_src")
    save_parquet(events, src)

    stream = streaming_tumbling_agg(read_events_stream(spark, src), "1 hour", "2 hours")
    assert stream.isStreaming
    run_available_now(stream, str(tmp_path / "ckpt"), query_name="t_agg")
    got = spark.sql("SELECT * FROM t_agg").toPandas()

    want = tumbling_agg(events, "1 hour").toPandas()
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
