"""JDBC source/sink contract tests (S3/S5/S8) against embedded Derby — the
one JDBC engine Spark ships in its own jars directory, so the write →
create-table → read-back path runs for real with no external database.
MySQL/Mongo remain deployment configs (no server in this sandbox); what
these tests pin is everything the engine owns: Spark's JDBC type mapping,
overwrite semantics, partitioned reads, and the S8 bootstrap composition.
"""

from __future__ import annotations

import pytest

from candyspark.sources.readers import load_jdbc
from candyspark.sources.sinks import initialize_databases, save_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
REF_DATA = "/root/reference/data/dataset_32"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "bonbon", 2.5), (2, "taffy", 1.25), (3, "fudge", 3.75)],
        "id int, name string, price double",
    )
    save_jdbc(df, derby_url, "sweets", "", "", driver=DERBY_DRIVER)
    back = load_jdbc(spark, derby_url, "sweets", "", "", driver=DERBY_DRIVER)
    rows = {r["id"]: (r["name"], r["price"]) for r in back.collect()}
    assert rows == {1: ("bonbon", 2.5), 2: ("taffy", 1.25), 3: ("fudge", 3.75)}
    # overwrite mode replaces, not appends (the reference's S5 contract)
    save_jdbc(df.limit(1), derby_url, "sweets", "", "", driver=DERBY_DRIVER)
    assert load_jdbc(spark, derby_url, "sweets", "", "", driver=DERBY_DRIVER).count() == 1


def test_jdbc_partitioned_read(spark, derby_url):
    df = spark.range(0, 100).selectExpr("CAST(id AS INT) AS id", "id * 2 AS v")
    save_jdbc(df, derby_url, "parts", "", "", driver=DERBY_DRIVER)
    back = load_jdbc(
        spark,
        derby_url,
        "parts",
        "",
        "",
        driver=DERBY_DRIVER,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(2 * i for i in range(100))


def test_initialize_databases_jdbc_half(spark, derby_url):
    """S8 bootstrap (reference src/data_processor.py:257-293): both CSV dims
    land as JDBC tables with the reference's row counts (30 each)."""
    written = initialize_databases(
        spark,
        REF_DATA,
        jdbc_cfg={
            "url": derby_url,
            "user": "",
            "password": "",
            "driver": DERBY_DRIVER,
            "customers_table": "customers",
            "products_table": "products",
        },
        mongo_cfg=None,  # no Mongo server in the sandbox
    )
    assert written == {"jdbc:customers": 30, "jdbc:products": 30}
    cust = load_jdbc(spark, derby_url, "customers", "", "", driver=DERBY_DRIVER)
    assert cust.count() == 30
    assert {f.name for f in cust.schema.fields} >= {"customer_id", "email"}
    prod = load_jdbc(spark, derby_url, "products", "", "", driver=DERBY_DRIVER)
    assert prod.filter("stock IS NOT NULL").count() == 30
