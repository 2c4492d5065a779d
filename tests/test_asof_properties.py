"""Property-based fuzz of the as-of join: random keyed event streams with
timestamp COLLISIONS (the case hand-written fixtures under-sample), checked
against a brute-force python reference, for BOTH physical strategies —
window (operators/temporal.asof_join) and cogrouped-map merge_asof
(asof_join_cogrouped). The contract under test: for each left row, the
right row with the greatest (ts, seq) such that right.ts <= left.ts, same
key; unmatched lefts keep nulls."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from candyspark.operators.temporal import asof_join, asof_join_cogrouped

# small ts domain forces ties; seq is globally unique per side via index
EVT = st.tuples(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=5),  # ts (collision-rich)
)
SIDE = st.lists(EVT, min_size=0, max_size=8)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _frames(spark, left, right):
    schema = "user_id long, ts long, event_id long"
    lrows = [(k, t, 1000 + i) for i, (k, t) in enumerate(left)]
    rrows = [(k, t, 2000 + i) for i, (k, t) in enumerate(right)]
    l = spark.createDataFrame(lrows, schema) if lrows else spark.createDataFrame([], schema)
    r = spark.createDataFrame(rrows, schema) if rrows else spark.createDataFrame([], schema)
    return lrows, rrows, l, r


def _reference(lrows, rrows):
    """Brute force: max (ts, event_id) right row with ts <= left ts."""
    out = {}
    for lk, lt, lid in lrows:
        best = None
        for rk, rt, rid in rrows:
            if rk == lk and rt <= lt and (best is None or (rt, rid) > best):
                best = (rt, rid)
        out[lid] = best
    return out


def _run(join_fn, spark, l, r):
    got = join_fn(
        l, r, by=["user_id"], left_ts="ts", right_ts="ts",
        right_vals=["event_id"], seq_col="event_id", prefix="m_",
    ).collect()
    return {
        row["event_id"]: (
            None if row["m_ts"] is None else (row["m_ts"], row["m_event_id"])
        )
        for row in got
    }


@given(left=SIDE, right=SIDE)
@_SETTINGS
def test_asof_both_strategies_match_brute_force(spark, left, right):
    lrows, rrows, l, r = _frames(spark, left, right)
    want = _reference(lrows, rrows)
    assert _run(asof_join, spark, l, r) == want
    assert _run(asof_join_cogrouped, spark, l, r) == want
