"""Explicit schemas for every table the engine touches.

The reference infers every schema (``inferSchema=True`` everywhere —
/root/reference/src/data_processor.py:105-107,112,128; SURVEY.md §1.3), which
is nondeterministic and forces a full extra pass over CSV/JSON at 100-TB
scale. Here every source has a pinned ``StructType``: scans are single-pass,
plans are stable, and schema drift fails loudly at ingest.

Two families (FIXTURES.md):
  A. the candy-store dataset (reference parity),
  B. the driver's TPC-H-ish synthetic tables (oracle checks).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- A. candy-store dataset (reference data model, SURVEY.md §1.1) ----------

# /root/reference/data/dataset_32/customers.csv (FIXTURES.md §A1): phone must
# stay string (heterogeneous formats), address contains quoted commas.
CUSTOMERS = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("phone", T.StringType()),
    ]
)

# /root/reference/data/dataset_32/products.csv (FIXTURES.md §A2). Money stays
# double internally (SURVEY.md §1.4 — reference CI tolerance rtol=1e-2).
PRODUCTS = T.StructType(
    [
        T.StructField("product_id", T.IntegerType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("product_category", T.StringType()),
        T.StructField("product_subcategory", T.StringType()),
        T.StructField("product_shape", T.StringType()),
        T.StructField("sales_price", T.DoubleType()),
        T.StructField("cost_to_make", T.DoubleType()),
        T.StructField("stock", T.IntegerType()),
    ]
)

# /root/reference/data/dataset_32/transactions_*.json (FIXTURES.md §A3):
# top-level JSON array per file, nested items array<struct>, qty nullable
# (~8% null — load-bearing, SURVEY.md §1.2). Timestamp arrives as an ISO-8601
# string with microseconds; parsed to TimestampType once at ingest
# (SURVEY.md §1.4), not re-parsed per use like the reference.
TRANSACTIONS_RAW = T.StructType(
    [
        T.StructField("transaction_id", T.LongType()),
        T.StructField("customer_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("product_id", T.LongType()),
                        T.StructField("product_name", T.StringType()),
                        T.StructField("qty", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)

# --- B. driver synthetic tables (/root/testdata/sf*/, FIXTURES.md §B) -------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
