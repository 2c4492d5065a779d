"""In-engine synthetic data generator (dbgen-style), for scale validation.

The driver's fixtures stop at sf0.1 (~600k lineitem — BASELINE.md's own
cross-SF check shows that scale is still fixed-overhead-dominated), so every
100-TB claim above it was design-verified only. This module generates the
SAME star schema at ANY scale factor entirely inside Spark — `spark.range`
rows, `xxhash64`-derived deterministic pseudo-randomness, zero Python UDFs,
zero driver-side data — so the generation itself exercises (and scales with)
the engine, and `scale_bench.py` can measure the heavy query families under
real data-volume pressure (sf0.1 → sf1 → …).

Distributions mirror `/root/testdata` (TESTDATA.md): same schemas/dtypes,
same value ranges, same dimension-to-fact ratios, the same 31-word document
lexicon (tokenizer/shingle behavior must match for the dedup families), and
clustered embeddings (labels carry real centroid structure so the
quantizer-based families do real work). Values are NOT bit-identical to the
driver fixtures — this generator feeds the perf harness, not the oracle.

Determinism: every column is a pure function of (table salt, row id), so the
same (sf, seed) always produces the same dataset on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: the corpus lexicon used by the driver fixtures — reused verbatim so
#: token/shingle statistics (and therefore dedup candidate rates) match
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_LANGS = ["en", "en", "de", "es", "fr", "zh"]  # en ~2× weighted, as fixtures

_P = 1_000_000_007  # modulus for hash→uniform


def _h(salt: str, *cols: Column) -> Column:
    """Deterministic 64-bit hash of (salt, cols) — the randomness source."""
    return F.xxhash64(F.lit(salt), *cols)


def _u(salt: str, *cols: Column) -> Column:
    """Uniform double in [0, 1), JVM-side, deterministic."""
    return F.pmod(_h(salt, *cols), F.lit(_P)).cast("double") / float(_P)


def _pick(salt: str, values: list[str], *cols: Column) -> Column:
    """Deterministic uniform pick from a small literal list."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.pmod(_h(salt, *cols), F.lit(len(values))) + 1).cast("int"))


def _slices(n: int) -> int:
    return max(32, min(512, n // 200_000 + 1))


def _ids(spark: SparkSession, n: int, name: str = "id") -> DataFrame:
    return spark.range(0, n, 1, _slices(n)).withColumnRenamed("id", name)


def gen_region(spark: SparkSession, sf: float) -> DataFrame:
    return spark.createDataFrame(
        [(i, r) for i, r in enumerate(_REGIONS)], "r_regionkey int, r_name string"
    )


def gen_nation(spark: SparkSession, sf: float) -> DataFrame:
    return spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


def gen_customer(spark: SparkSession, sf: float) -> DataFrame:
    n = int(150_000 * sf)
    c = F.col("c_custkey")
    return _ids(spark, n, "c_custkey").select(
        "c_custkey",
        F.format_string("Customer#%09d", c).alias("c_name"),
        F.pmod(_h("cnat", c), F.lit(25)).cast("int").alias("c_nationkey"),
        F.round(-1000.0 + _u("cbal", c) * 11_000.0, 2).alias("c_acctbal"),
        _pick("cseg", _SEGMENTS, c).alias("c_mktsegment"),
    )


def gen_supplier(spark: SparkSession, sf: float) -> DataFrame:
    n = int(10_000 * sf)
    s = F.col("s_suppkey")
    return _ids(spark, n, "s_suppkey").select(
        "s_suppkey",
        F.format_string("Supplier#%09d", s).alias("s_name"),
        F.pmod(_h("snat", s), F.lit(25)).cast("int").alias("s_nationkey"),
        F.round(-1000.0 + _u("sbal", s) * 11_000.0, 2).alias("s_acctbal"),
    )


def gen_part(spark: SparkSession, sf: float) -> DataFrame:
    n = int(200_000 * sf)
    p = F.col("p_partkey")
    return _ids(spark, n, "p_partkey").select(
        "p_partkey",
        F.concat(
            _pick("padj", _ADJ, p), F.lit(" "), _pick("pnoun", _NOUN, p)
        ).alias("p_name"),
        F.format_string(
            "Brand#%d", (F.pmod(_h("pbrand", p), F.lit(25)) + 1).cast("int")
        ).alias("p_brand"),
        _pick("ptype", _PTYPES, p).alias("p_type"),
        (F.pmod(_h("psize", p), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(900.0 + F.pmod(_h("pprice", p), F.lit(1000)).cast("double") / 10.0, 2)
        .alias("p_retailprice"),
    )


_EPOCH_1995 = "1995-01-01"


def gen_orders(spark: SparkSession, sf: float) -> DataFrame:
    n = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    o = F.col("o_orderkey")
    return _ids(spark, n, "o_orderkey").select(
        "o_orderkey",
        F.pmod(_h("ocust", o), F.lit(n_cust)).alias("o_custkey"),
        _pick("ostat", ["F", "O", "P"], o).alias("o_orderstatus"),
        F.round(1000.0 + _u("oprice", o) * 499_000.0, 2).alias("o_totalprice"),
        F.date_add(
            F.lit(_EPOCH_1995).cast("date"),
            F.pmod(_h("odate", o), F.lit(2405)).cast("int"),
        ).cast("timestamp").alias("o_orderdate"),
        _pick("oprio", _PRIORITIES, o).alias("o_orderpriority"),
    )


def gen_lineitem(spark: SparkSession, sf: float) -> DataFrame:
    n_orders = int(1_500_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    o = F.col("o_orderkey")
    base = _ids(spark, n_orders, "o_orderkey").select(
        "o_orderkey",
        F.date_add(
            F.lit(_EPOCH_1995).cast("date"),
            F.pmod(_h("odate", o), F.lit(2405)).cast("int"),
        ).alias("odate"),
        # 1..7 lines per order, mean ≈ 4 (the fixture's 4.08)
        (F.pmod(_h("olines", o), F.lit(7)) + 1).cast("int").alias("n_lines"),
    )
    li = base.select(
        "o_orderkey",
        "odate",
        F.explode(F.sequence(F.lit(1), F.col("n_lines"))).alias("l_linenumber"),
    )
    k = F.col("o_orderkey")
    ln = F.col("l_linenumber")
    return li.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.pmod(_h("lpart", k, ln), F.lit(n_part)).alias("l_partkey"),
        F.pmod(_h("lsupp", k, ln), F.lit(n_supp)).alias("l_suppkey"),
        "l_linenumber",
        (F.pmod(_h("lqty", k, ln), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        F.round(900.0 + _u("lprice", k, ln) * 104_100.0, 2).alias("l_extendedprice"),
        (F.pmod(_h("ldisc", k, ln), F.lit(11)).cast("double") / 100.0).alias("l_discount"),
        (F.pmod(_h("ltax", k, ln), F.lit(9)).cast("double") / 100.0).alias("l_tax"),
        _pick("lflag", ["A", "N", "R"], k, ln).alias("l_returnflag"),
        _pick("lstat", ["F", "O"], k, ln).alias("l_linestatus"),
        F.date_add(
            F.col("odate"), (F.pmod(_h("lship", k, ln), F.lit(95)) + 1).cast("int")
        ).cast("timestamp").alias("l_shipdate"),
    )


def gen_events(spark: SparkSession, sf: float) -> DataFrame:
    n = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    e = F.col("event_id")
    micros_30d = 30 * 24 * 3600 * 1_000_000
    return _ids(spark, n, "event_id").select(
        "event_id",
        F.timestamp_micros(
            F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
            + F.pmod(_h("ets", e), F.lit(micros_30d))
        ).alias("ts"),
        F.pmod(_h("euser", e), F.lit(n_users)).alias("user_id"),
        _pick("etype", _EVENT_TYPES, e).alias("event_type"),
        F.round(_u("eval", e) * 560.0, 2).alias("value"),
        F.format_string(
            '{"k": %d}', F.pmod(_h("eprops", e), F.lit(100)).cast("int")
        ).alias("props"),
    )


def gen_documents(spark: SparkSession, sf: float) -> DataFrame:
    n = int(50_000 * sf)
    d = F.col("doc_id")
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    n_toks = (F.pmod(_h("dlen", d), F.lit(91)) + 10).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_toks),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(F.lit("dtok"), d, i), F.lit(len(VOCAB))) + 1).cast("int")
            ),
        ),
        " ",
    )
    return _ids(spark, n, "doc_id").select(
        "doc_id",
        text.alias("text"),
        _pick("dlang", _LANGS, d).alias("lang"),
        F.format_string(
            "src%d", F.pmod(_h("dsrc", d), F.lit(20)).cast("int")
        ).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, sf: float) -> DataFrame:
    n = int(20_000 * sf)
    v = F.col("vec_id")
    label = F.pmod(_h("elabel", v), F.lit(10)).cast("int")
    # per-(label, dim) centroid + per-(vec, dim) noise → real cluster
    # structure (std ≈ 0.12, range ≈ ±0.4, as the fixture)
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda dim: (
            (
                F.pmod(F.xxhash64(F.lit("ecent"), F.col("label"), dim), F.lit(_P)).cast("double")
                / float(_P)
                - 0.5
            )
            * 0.25
            + (
                F.pmod(F.xxhash64(F.lit("enoise"), v, dim), F.lit(_P)).cast("double")
                / float(_P)
                - 0.5
            )
            * 0.35
        ).cast("float"),
    )
    return (
        _ids(spark, n, "vec_id")
        .withColumn("label", label)
        .select("vec_id", emb.alias("embedding"), "label")
    )


GENERATORS = {
    "region": gen_region,
    "nation": gen_nation,
    "customer": gen_customer,
    "supplier": gen_supplier,
    "part": gen_part,
    "orders": gen_orders,
    "lineitem": gen_lineitem,
    "events": gen_events,
    "documents": gen_documents,
    "embeddings": gen_embeddings,
}


def generate(
    spark: SparkSession, out_dir: str, sf: float, tables: list[str] | None = None
) -> dict[str, int]:
    """Generate the star schema at scale factor ``sf`` under ``out_dir``
    (one ``<table>.parquet`` directory per table, the TESTDATA layout).
    Returns row counts per table."""
    counts: dict[str, int] = {}
    for name in tables or list(GENERATORS):
        df = GENERATORS[name](spark, sf)
        path = f"{out_dir}/{name}.parquet"
        df.write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()
    return counts
