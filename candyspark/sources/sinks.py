"""Sink operators (SURVEY.md §2.1, S5-S7).

Parquet (optionally ``partitionBy`` date) is the engine's default sink —
partition-pruned downstream scans are the single biggest win at 100-TB scale
(SURVEY.md §4.3). The single-file CSV sink reproduces the reference's
golden-file output contract (src/data_processor.py:584-610) and is only for
small finals: ``coalesce(1)`` serializes the write through one task.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def save_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def save_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (hash-clustered on ``bucket_cols``): joins and
    aggregations on the bucket key read co-located data and skip the exchange
    entirely — at 100 TB the shuffle this removes from every downstream
    fact-fact join is the single largest cost in the plan (SURVEY.md §4.3;
    both sides must share bucket count and key). ``sortBy`` additionally
    pre-sorts within buckets so sort-merge joins skip their sort. Bucketing
    requires a table (metastore entry) — the ``path`` option keeps the data
    external at a caller-chosen location.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files sized
    toward ``target_bytes`` (default 128 MiB — the classic HDFS/object-store
    sweet spot). Returns the output file count.

    The small-files problem is a first-order cost at 100 TB: a directory of
    10⁶ kilobyte-files makes every downstream scan pay 10⁶ opens, footer
    reads, and scheduler tasks, and object stores throttle the LISTs. A
    streaming ingest or an over-partitioned shuffle produces exactly that;
    periodic compaction is the standard maintenance pass (table formats run
    it as OPTIMIZE). Target count comes from the directory's actual on-disk
    bytes (compressed) — not row counts — and the rewrite is ``coalesce``,
    not ``repartition``: coalesce merges input splits without a shuffle, so
    compaction is scan + write only. Writes to a NEW directory (``dst``):
    parquet sources cannot overwrite a path they are reading, and at scale
    the swap must be atomic-rename anyway (done by the table format or the
    orchestrator, not mid-job)."""
    files = glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_bytes))  # ceil
    spark.read.parquet(src).coalesce(n_out).write.mode("overwrite").parquet(dst)
    return len(glob.glob(os.path.join(dst, "*.parquet")))


def save_single_csv(
    df: DataFrame,
    out_dir: str,
    filename: str,
    sort_cols: list[str] | None = None,
) -> str:
    """Single-file CSV sink (S7 — reference src/data_processor.py:584-610):
    coalesce(1) → temp dir → move the part file to ``out_dir/filename``.

    Row order is part of the golden-file contract (positional CI compare,
    SURVEY.md §5.1). Pass ``sort_cols`` rather than pre-sorting with
    ``orderBy``: a global ``orderBy`` plans a RangePartitioner whose
    boundary-SAMPLING pass re-executes the whole upstream plan (a second
    scan per output — and it double-fires any ``observe()`` accumulators
    riding the frame); sorting WITHIN the single coalesced partition is the
    same total order in one pass. Callers that already sorted still work:
    coalesce(1) concatenates range partitions in index order.
    """
    os.makedirs(out_dir, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="candyspark_csv_", dir=out_dir)
    try:
        out = df.coalesce(1)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.mode("overwrite").option("header", True).csv(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.csv"))
        final = os.path.join(out_dir, filename)
        shutil.move(part, final)
        return final
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def save_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "com.mysql.cj.jdbc.Driver",
    mode: str = "overwrite",
) -> None:
    """JDBC sink (S5 — reference src/data_processor.py:116-153)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .mode(mode)
        .save()
    )


def save_mongodb(
    df: DataFrame, uri: str, database: str, collection: str, mode: str = "overwrite"
) -> None:
    """MongoDB sink (S6 — reference src/data_processor.py:155-179)."""
    (
        df.write.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .mode(mode)
        .save()
    )


def initialize_databases(
    spark,
    data_dir: str,
    jdbc_cfg: dict | None = None,
    mongo_cfg: dict | None = None,
) -> dict[str, int]:
    """DB bootstrap (S8 — reference ``initialize_databases``,
    src/data_processor.py:257-293): CSV dims → JDBC tables, one Mongo
    collection per transactions_YYYYMMDD.json file (collection name = file
    stem, exactly the reference's convention).

    ``jdbc_cfg``: {url, user, password, driver?, customers_table?,
    products_table?} — driver defaults to MySQL like the reference; any
    JDBC backend works (tests round-trip through embedded Derby, the one
    JDBC engine shipped with Spark itself). ``mongo_cfg``: {uri, database}.
    Pass None to skip a half (e.g. bootstrap only the relational side).
    Returns {target_name: rows_written} so callers can reconcile counts
    without re-scanning (the reference re-reads each table and count()s —
    SURVEY.md §4.2's count-as-control-flow anti-pattern)."""
    from candyspark.schemas import CUSTOMERS, PRODUCTS, TRANSACTIONS_RAW
    from candyspark.sources.readers import load_csv, load_json_array_files

    written: dict[str, int] = {}
    if jdbc_cfg is not None:
        driver = jdbc_cfg.get("driver", "com.mysql.cj.jdbc.Driver")
        for fname, schema, key in (
            ("customers.csv", CUSTOMERS, "customers_table"),
            ("products.csv", PRODUCTS, "products_table"),
        ):
            table = jdbc_cfg.get(key, key.removesuffix("_table"))
            df = load_csv(spark, os.path.join(data_dir, fname), schema)
            save_jdbc(
                df,
                jdbc_cfg["url"],
                table,
                jdbc_cfg.get("user", ""),
                jdbc_cfg.get("password", ""),
                driver=driver,
            )
            written[f"jdbc:{table}"] = df.count()
    if mongo_cfg is not None:
        for path in sorted(glob.glob(os.path.join(data_dir, "transactions_*.json"))):
            coll = os.path.splitext(os.path.basename(path))[0]
            df = load_json_array_files(spark, path, TRANSACTIONS_RAW)
            save_mongodb(df, mongo_cfg["uri"], mongo_cfg["database"], coll)
            written[f"mongo:{coll}"] = df.count()
    return written


def save_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """ORC sink — columnar alternative when the consuming lake standardizes
    on ORC; same partitioning discipline as save_parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def save_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink (Spark 4 built-in) — one ``row_tag`` element per row, for
    interchange with XML-standardized consumers. Avro is NOT bundled in
    this runtime (external module since Spark 2.4) — deployments that need
    it add the spark-avro jar; the parquet/ORC/JSONL/CSV/XML surface here
    is the in-repo-tested set."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def save_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line, splittable on re-read) — the
    interchange format for text-corpus pipelines whose downstream tooling
    expects JSONL rather than parquet."""
    df.write.mode(mode).json(path)


def zorder_key(c1, c2, bounds1, bounds2, bits: int = 12):
    """Morton (Z-order) key: min-max-normalize two integer columns into the
    SAME ``bits``-wide domain, then interleave (c1 → even bit positions,
    c2 → odd).

    The normalization is the load-bearing step: interleaving raw bits lets
    whichever column has the wider domain dominate the sort (its high bits
    have no counterpart to alternate with), degenerating Z-order into a
    plain sort on that column. Scaling both to [0, 2^bits) first is what
    Delta's OPTIMIZE ZORDER achieves via range_partition_id. Pure integer
    bitwise expressions, fully whole-stage-codegen'd; no UDF.
    """
    from pyspark.sql import functions as F

    top = (1 << bits) - 1

    def norm(c, lo, hi):
        span = max(hi - lo, 1)
        return ((c.cast("long") - F.lit(lo)) * top / F.lit(span)).cast("long")

    n1, n2 = norm(c1, *bounds1), norm(c2, *bounds2)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(n1, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(n2, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def save_zordered(
    df: DataFrame, path: str, col1: str, col2: str, n_files: int = 8, bits: int = 12
) -> None:
    """Z-order-clustered parquet layout over two integer columns.

    Every output file then covers a NARROW min/max band of BOTH columns
    (≈ global_span/√n_files each under uniform data), so parquet footer
    stats let a scan skip files for predicates on either dimension — where
    a linear sort narrows only its leading column and leaves the second
    column spanning the full range in every file
    (tests/test_layout.py::test_zorder_layout_narrows_both_dimensions).

    The domain bounds come from one tiny min/max aggregate (a 1-row
    collect — driver-side scalars for a layout decision, not data).
    """
    from pyspark.sql import functions as F

    b = df.agg(
        F.min(col1).alias("lo1"),
        F.max(col1).alias("hi1"),
        F.min(col2).alias("lo2"),
        F.max(col2).alias("hi2"),
    ).first()
    key = zorder_key(
        F.col(col1), F.col(col2), (b["lo1"], b["hi1"]), (b["lo2"], b["hi2"]), bits
    )
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.parquet(path)
    )
