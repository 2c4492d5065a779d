"""Property-based fuzz of the mutation operators (hypothesis): random key
collisions and NULL patterns, the invariants stated independently of the
implementation. Few examples with batched rows — each example spins Spark
jobs, so breadth comes from the generators, not the example count."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from candyspark.operators.mutation import merge_upsert, scd2_history

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
ROW = st.tuples(KEYS, VALS, st.integers(min_value=0, max_value=9))
# unique_by key: frames model keyed tables
TABLE = st.lists(ROW, min_size=0, max_size=6, unique_by=lambda r: r[0])

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(target=TABLE, source=TABLE)
@_SETTINGS
def test_merge_upsert_is_source_wins_union(spark, target, source):
    schema = "k int, v string, w int"
    t = spark.createDataFrame(target, schema) if target else spark.createDataFrame([], schema)
    s = spark.createDataFrame(source, schema) if source else spark.createDataFrame([], schema)
    got = {r["k"]: (r["v"], r["w"]) for r in merge_upsert(t, s, ["k"]).collect()}
    want = {k: (v, w) for k, v, w in target}
    want.update({k: (v, w) for k, v, w in source})  # source wins, inserts included
    assert got == want


LOG = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=1, max_value=20),  # day (made unique per key below)
        st.sampled_from(["x", "y", None]),       # value
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda r: (r[0], r[1]),
)


@given(log=LOG)
@_SETTINGS
def test_scd2_invariants(spark, log):
    df = spark.createDataFrame(
        [(k, dt.datetime(2024, 1, d), v) for k, d, v in log],
        "k int, ts timestamp, v string",
    )
    rows = scd2_history(df, ["k"], "ts", ["v"]).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, intervals in by_key.items():
        intervals.sort(key=lambda r: r["valid_from"])
        # exactly one open interval, at the end
        assert [r["valid_to"] for r in intervals].count(None) == 1
        assert intervals[-1]["valid_to"] is None
        for a, b in zip(intervals, intervals[1:]):
            assert a["valid_to"] == b["valid_from"]  # contiguous, non-overlapping
            assert a["v"] != b["v"]  # consecutive duplicates collapsed
        # first interval starts at the key's earliest log entry
        first_ts = min(dt.datetime(2024, 1, d) for kk, d, _ in log if kk == k)
        assert intervals[0]["valid_from"] == first_ts
