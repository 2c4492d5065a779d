"""Empty-input robustness: every registry query must plan and execute
against zero-row tables without crashing (schema preserved, 0..N rows out).

Why this gate exists: at 100 TB the empty case is routine — a new date
partition, a filter that matches nothing, a tenant with no data yet — and
operators that collect().head(), assert non-emptiness, or divide by a
global count crash exactly there. The sweep runs every query once against
a schema-identical zero-row copy of the testdata.

The fixture copies the RAW physical schema (events.ts stays int64 nanos,
as in the driver parquet — readers.load_table owns the ns→µs
normalization), so the sweep exercises the exact ingest path.
"""

from __future__ import annotations

import pytest

from candyspark.plans import collect_registry
from candyspark.schemas import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.001"

REGISTRY = collect_registry()

RUNNABLE = sorted(REGISTRY)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for table in TESTDATA_TABLES:
        raw = spark.read.parquet(f"{SF_DIR}/{table}.parquet").limit(0)
        raw.write.mode("overwrite").parquet(str(root / f"{table}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", RUNNABLE)
def test_query_survives_empty_input(spark, empty_sf_dir, name):
    df = REGISTRY[name].fn(spark, empty_sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
