"""User-defined aggregate functions (GROUPED_AGG pandas UDFs).

The reference registers no UDFs of any kind (SURVEY.md §2.11); this module
is the engine's UDAF surface for statistics Spark lacks a builtin for. A
GROUPED_AGG pandas UDF receives each group's values as an Arrow-batched
``pd.Series`` and returns one scalar — usable in ``groupBy().agg(...)`` and
over unbounded ``Window`` partitions.

Determinism discipline: kernels must be order-independent functions of the
value multiset (sort internally; never depend on arrival order), because
Spark feeds them in partition order, which AQE and speculative execution do
not stabilize. ``median_disc`` returns an actual input value (lower/discrete
median), so results hash-match a single-threaded oracle exactly — no float
summation ambiguity.

Scale: no partial aggregation exists for pandas UDAFs — the full group
crosses the shuffle and the Arrow boundary. Acceptable for holistic
aggregates (order statistics are buffer-bound in ANY engine); for algebraic
aggregates use built-ins or exact-decimal power sums
(plans/quality.q_stats_moments) instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def group_size(v: pd.Series) -> int:
    """COUNT as a pandas UDAF — exists because Spark refuses to mix a
    GROUPED_AGG pandas UDF with built-in aggregates in one agg()
    (INVALID_PANDAS_UDF_PLACEMENT): an all-UDAF aggregation list keeps
    companion counts next to custom statistics."""
    return len(v)


@pandas_udf("double")
def median_disc(v: pd.Series) -> float:
    """Discrete (lower) median: the value at sorted index (n-1)//2 — the
    smallest value whose cumulative fraction reaches 0.5, identical to
    SQL-standard PERCENTILE_DISC(0.5) WITHIN GROUP for every n (indices
    coincide: ceil(n/2)-1 == (n-1)//2)."""
    a = np.sort(v.to_numpy(dtype=np.float64))
    if len(a) == 0:  # empty group after filters
        return float("nan")
    return float(a[(len(a) - 1) // 2])
