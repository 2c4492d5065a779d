"""Query plans: named, oracle-checked DataFrame programs.

Each plan module exposes ``REGISTRY: dict[str, QuerySpec]``. A ``QuerySpec``
pairs a PySpark query (``(spark, sf_dir) -> DataFrame``) with the equivalent
ANSI SQL for the DuckDB oracle (``None`` for non-SQL-expressible operators —
the driver then records a weaker rows-only check; SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One oracle-checked query: Spark implementation + DuckDB oracle SQL."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => not SQL-expressible; rows-only check


def collect_registry() -> dict[str, QuerySpec]:
    """Union of all plan modules' registries (stable names across rounds)."""
    from candyspark.plans import (
        analytics,
        behavior,
        candy,
        corpus,
        extensions,
        geo,
        graph,
        ml,
        mutation,
        outliers,
        profiling,
        quality,
        relational,
        retrieval,
        sequences,
        sketches,
        temporal,
        tpch,
        tpch2,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        candy,
        extensions,
        temporal,
        analytics,
        profiling,
        corpus,
        tpch,
        tpch2,
        mutation,
        geo,
        ml,
        quality,
        graph,
        retrieval,
        sketches,
        outliers,
        behavior,
        sequences,
    ):
        overlap = merged.keys() & mod.REGISTRY.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        merged.update(mod.REGISTRY)
    return merged
