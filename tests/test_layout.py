"""Storage-layout posture tests (SURVEY.md §4.3 "partition pruning" and
"co-located joins"): the two layout decisions that dominate 100-TB cost —
date-partitioned sinks whose downstream scans prune to the queried days, and
bucketed tables whose key joins skip the shuffle — verified on explain
output, not assumed."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from candyspark.sources.readers import load_table
from candyspark.sources.sinks import save_bucketed, save_parquet

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_sink_prunes_downstream_scans(spark, tmp_path):
    """events written partitionBy(event_date): a day-filtered read must show
    the predicate as a PartitionFilter (directory pruning — row groups for
    other days are never opened), not a post-scan Filter."""
    ev = load_table(spark, SF, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_date")
    save_parquet(ev, out, partition_by=["event_date"])
    day = str(ev.agg(F.min("event_date")).collect()[0][0])

    one_day = spark.read.parquet(out).filter(F.col("event_date") == day)
    plan = plan_of(one_day)
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("event_date" in ln for ln in pf), pf
    # pruning is semantic too: only that day's rows come back
    dates = [r.event_date for r in one_day.select("event_date").distinct().collect()]
    assert [str(d) for d in dates] == [day]


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """lineitem and orders bucketed 8-way on the join key: the key join must
    be exchange-free on both sides (bucket info replaces the shuffle). This
    is the layout contract save_bucketed exists for."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    save_bucketed(li, "li_b", str(tmp_path / "li_b"), ["l_orderkey"], num_buckets=8)
    save_bucketed(o, "o_b", str(tmp_path / "o_b"), ["o_orderkey"], num_buckets=8)
    try:
        with _no_broadcast(spark):  # force SMJ so the assertion is about buckets
            joined = spark.table("li_b").join(
                spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
            )
            plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == load_table(spark, SF, "lineitem").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_unbucketed_same_join_does_exchange(spark):
    """Control for the bucketed test: the identical join over plain parquet
    shuffles both sides — proving the assertion above is the layout's doing,
    not the optimizer eliding the exchange for size reasons."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    with _no_broadcast(spark):
        plan = plan_of(li.join(o, F.col("l_orderkey") == F.col("o_orderkey")))
    assert "hashpartitioning" in plan, plan


@contextlib.contextmanager
def _no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_orc_roundtrip_preserves_and_pushes_down(spark, tmp_path):
    """ORC sink → scan: lossless for every documents column, and a
    predicate on the re-read reaches the ORC scan as a pushed filter
    (stripe-level skipping — same posture as parquet)."""
    from candyspark.sources.readers import load_orc
    from candyspark.sources.sinks import save_orc

    d = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_orc")
    save_orc(d, path)
    back = load_orc(spark, path)
    assert back.count() == d.count()
    assert back.exceptAll(d).count() == 0 and d.exceptAll(back).count() == 0
    plan = plan_of(back.filter(F.col("doc_id") > 100).select("doc_id"))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("PushedFilters: []" not in ln for ln in pushed), plan


def test_jsonl_roundtrip_is_lossless_and_splittable(spark, tmp_path):
    """JSON-lines sink → schema'd scan: lossless (unicode text, embedded
    newlines escaped) and NOT single-task — unlike multiLine JSON arrays,
    JSONL splits by line (SURVEY.md §2.1 S2)."""
    from candyspark.sources.readers import load_jsonl
    from candyspark.sources.sinks import save_jsonl

    d = load_table(spark, SF, "documents").repartition(4)
    path = str(tmp_path / "docs_jsonl")
    save_jsonl(d, path)
    back = load_jsonl(spark, path, schema=d.schema)
    assert back.exceptAll(d).count() == 0 and d.exceptAll(back).count() == 0
    assert back.rdd.getNumPartitions() > 1  # multiple line-splittable files


def test_dynamic_partition_overwrite_is_idempotent_backfill(spark, tmp_path):
    """Re-landing ONE day with partitionOverwriteMode=dynamic must replace
    only that day's partition and leave every sibling intact — the
    idempotent-backfill contract a 100-TB daily pipeline depends on
    (STATIC overwrite mode would clobber the whole table root on retry)."""
    ev = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    out = str(tmp_path / "events_dyn")
    save_parquet(ev, out, partition_by=["event_date"])
    before = spark.read.parquet(out).count()
    days = sorted(
        str(r.event_date)
        for r in spark.read.parquet(out).select("event_date").distinct().collect()
    )
    target = days[0]

    # backfill the earliest day with a corrected copy (value doubled)
    corrected = ev.filter(F.col("event_date") == target).withColumn(
        "value", F.col("value") * 2
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        save_parquet(corrected, out, partition_by=["event_date"])
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    after = spark.read.parquet(out)
    assert after.count() == before  # no sibling partition lost
    assert sorted(
        str(r.event_date) for r in after.select("event_date").distinct().collect()
    ) == days
    # the target day really was replaced, others untouched
    orig_sum = ev.filter(F.col("event_date") == target).agg(F.sum("value")).collect()[0][0]
    new_sum = (
        after.filter(F.col("event_date") == target).agg(F.sum("value")).collect()[0][0]
    )
    assert abs(new_sum - 2 * orig_sum) < 1e-6


def test_python_datasource_partition_planning(spark):
    """The custom source must parallelize via its own InputPartitions (8
    requested → 8 task slices covering [0, rows) disjointly) and generate
    rows derivable purely from the index — re-reading any slice yields
    identical bytes."""
    from candyspark.sources.pydatasource import (
        SyntheticEventsReader,
        register_synthetic_source,
        row_for_index,
    )

    reader = SyntheticEventsReader({"rows": 1000, "partitions": 8})
    parts = reader.partitions()
    assert len(parts) == 8
    covered = sorted((p.start, p.end) for p in parts)
    assert covered[0][0] == 0 and covered[-1][1] == 1000
    assert all(a[1] == b[0] for a, b in zip(covered, covered[1:]))

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 100)
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(row_for_index(i) for i in range(100))


def test_corrupt_json_records_are_captured_not_dropped(spark, tmp_path):
    """PERMISSIVE + columnNameOfCorruptRecord: malformed lines must land in
    the corrupt column verbatim (data fields null) while good lines parse —
    the ingest contract that lets a 100-TB load quarantine bad input
    relationally instead of failing or silently nulling."""
    from pyspark.sql import types as T

    from candyspark.sources.readers import load_jsonl

    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{broken json here}\n"
        '{"id": 3, "name": "also ok"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("_bad", T.StringType()),
        ]
    )
    df = load_jsonl(spark, str(src), schema, corrupt_col="_bad").cache()
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows[1]["name"] == "ok" and rows[1]["_bad"] is None
    assert rows[3]["name"] == "also ok"
    bad = rows[None]
    assert bad["_bad"] == "{broken json here}" and bad["name"] is None
    df.unpersist()


def test_parquet_schema_evolution_merges(spark, tmp_path):
    """Schema evolution: files written before a column existed must read
    together with newer files under mergeSchema — old rows null-fill the
    new column. This is the append-only-dataset upgrade path at scale (no
    rewrite of history)."""
    d = str(tmp_path / "data")
    spark.createDataFrame([(1, "a")], "id long, v1 string").write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame([(2, "b", 9.5)], "id long, v1 string, v2 double").write.mode(
        "append"
    ).parquet(d)
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"id", "v1", "v2"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["v2"] is None and rows[2]["v2"] == 9.5


def test_dynamic_partition_pruning_from_filtered_dim(spark, tmp_path):
    """DPP: a date-partitioned fact joined to a selectively-filtered dim
    must get a dynamicpruning subquery on its PartitionFilters — only the
    dim's surviving dates are read, decided at RUNTIME from the broadcast.
    At 100 TB this is the difference between scanning 10 years and
    scanning the quarter the dim selects."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    d = str(tmp_path / "fact")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "day", F.to_date(F.col("ts").cast("timestamp"))
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(d)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    dim = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderdate").cast("date").alias("day"))
        .distinct()
    )
    j = spark.read.parquet(d).join(dim, "day").groupBy("day").count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain(True)
    plan = buf.getvalue()
    assert "dynamicpruning" in plan, plan


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """64 tiny files → compaction produces far fewer files sized toward the
    target, without a shuffle, and preserves content exactly."""
    from candyspark.sources.sinks import compact_parquet

    src, dst = str(tmp_path / "shattered"), str(tmp_path / "compacted")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    li.repartition(64).write.parquet(src)
    import glob as _glob
    import os as _os

    n_in = len(_glob.glob(_os.path.join(src, "*.parquet")))
    assert n_in == 64

    n_out = compact_parquet(spark, src, dst, target_bytes=512 * 1024)
    assert n_out < n_in

    # coalesce, not repartition: the compaction job plans no exchange
    reread = spark.read.parquet(src).coalesce(max(1, n_out))
    assert "Exchange" not in plan_of(reread)

    before = sorted(r["l_orderkey"] for r in spark.read.parquet(src).collect())
    after = sorted(r["l_orderkey"] for r in spark.read.parquet(dst).collect())
    assert before == after


def test_range_sorted_write_has_disjoint_file_ranges(spark, tmp_path):
    """Global-sort layout (repartitionByRange + sortWithinPartitions on
    l_shipdate): every output file covers a DISJOINT key range, so a
    time-predicate scan skips whole files/row-groups on parquet min/max
    stats — the poor man's clustering index at 100 TB. A hash-shuffled
    write of the same data has every file spanning the full range (nothing
    skippable); both properties asserted from the actual parquet footers."""
    import pyarrow.parquet as pq

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_shipdate")
    sorted_dir = str(tmp_path / "sorted")
    shuffled_dir = str(tmp_path / "shuffled")
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.parquet(sorted_dir)
    )
    li.repartition(8, "l_orderkey").write.parquet(shuffled_dir)

    def file_ranges(d):
        import glob as g
        import os as o

        ranges = []
        for f in sorted(g.glob(o.path.join(d, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                continue
            los, his = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "l_shipdate"
                )
                los.append(col.statistics.min)
                his.append(col.statistics.max)
            ranges.append((min(los), max(his)))
        return ranges

    rs = sorted(file_ranges(sorted_dir))
    assert len(rs) > 1
    for (lo1, hi1), (lo2, hi2) in zip(rs, rs[1:]):
        assert hi1 <= lo2, f"sorted layout has overlapping file ranges: {rs}"

    ru = file_ranges(shuffled_dir)
    overlaps = sum(
        1 for i, a in enumerate(ru) for b in ru[i + 1 :] if a[0] <= b[1] and b[0] <= a[1]
    )
    assert overlaps > 0, "hash layout unexpectedly produced disjoint ranges"


def test_metadata_columns_expose_file_provenance(spark, tmp_path):
    """The parquet reader's hidden _metadata struct gives per-row file
    provenance (path, size, mod time) without any engine code — the
    debugging handle for bad-file triage at 100 TB (pair with a file_name
    filter to re-scan one suspect file). Asserted: every distinct
    _metadata.file_name is a real part file, and per-file row counts sum
    to the table count."""
    import glob as g
    import os as o

    d = str(tmp_path / "prov")
    li = load_table(spark, SF, "lineitem").select("l_orderkey")
    li.repartition(4).write.parquet(d)

    per_file = (
        spark.read.parquet(d)
        .groupBy(F.col("_metadata.file_name").alias("file_name"))
        .count()
        .collect()
    )
    on_disk = {o.path.basename(p) for p in g.glob(o.path.join(d, "*.parquet"))}
    assert {r["file_name"] for r in per_file} == on_disk
    assert sum(r["count"] for r in per_file) == li.count()


def test_zorder_layout_narrows_both_dimensions(spark, tmp_path):
    """Z-order clustering (sinks.save_zordered): after Morton-interleaving
    (l_partkey, l_orderkey) and range-writing on the key, EVERY file's
    min/max band is a fraction of the global span on BOTH columns — so
    footer stats can skip files for predicates on either dimension. The
    control (linear sort on l_partkey alone) narrows only its leading
    column: l_orderkey spans ~the full range in every file. Asserted from
    the actual parquet footers, same method as the range-sorted test."""
    import glob as g
    import os as o

    import pyarrow.parquet as pq

    from candyspark.sources.sinks import save_zordered

    li = load_table(spark, SF, "lineitem").select("l_partkey", "l_orderkey")
    zdir, ldir = str(tmp_path / "zorder"), str(tmp_path / "linear")
    save_zordered(li, zdir, "l_partkey", "l_orderkey", n_files=8)
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(ldir)
    )

    def spans(d, col):
        out = []
        for f in sorted(g.glob(o.path.join(d, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                continue
            los, his = [], []
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                los.append(c.statistics.min)
                his.append(c.statistics.max)
            out.append((min(los), max(his)))
        return out

    def avg_frac(d, col):
        s = spans(d, col)
        glo = min(lo for lo, _ in s)
        ghi = max(hi for _, hi in s)
        return sum(hi - lo for lo, hi in s) / len(s) / max(ghi - glo, 1)

    assert len(spans(zdir, "l_partkey")) > 1
    # z-order: both dimensions narrowed (ideal = 1/sqrt(8) ≈ 0.35)
    assert avg_frac(zdir, "l_partkey") < 0.7, spans(zdir, "l_partkey")
    assert avg_frac(zdir, "l_orderkey") < 0.7, spans(zdir, "l_orderkey")
    # linear control: leading column narrow, second column ~full-span
    assert avg_frac(ldir, "l_partkey") < 0.5, spans(ldir, "l_partkey")
    assert avg_frac(ldir, "l_orderkey") > 0.9, spans(ldir, "l_orderkey")


def test_nested_struct_schema_pruning(spark, tmp_path):
    """Selecting one subfield of a struct column must prune the parquet
    ReadSchema down to that subfield (nestedSchemaPruning) — at 100 TB a
    wide metadata struct read whole for one flag is a full extra column
    family off disk."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    src = spark.range(100).select(
        F.col("id"),
        F.struct(
            F.col("id").alias("a"),
            (F.col("id") * 2).alias("b"),
            F.lit("x").alias("c"),
        ).alias("meta"),
    )
    path = str(tmp_path / "nested")
    src.write.mode("overwrite").parquet(path)

    df = spark.read.parquet(path).select("id", F.col("meta.b").alias("b"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_lines, plan
    line = schema_lines[0]
    assert "meta:struct<b:" in line.replace(" ", ""), line
    assert ":a" not in line.replace(" ", "") and "c:string" not in line, line


def test_xml_roundtrip_with_explicit_schema(spark, tmp_path):
    """XML sink → scan (Spark 4 built-in source): lossless for the scalar
    documents columns under an EXPLICIT schema (the no-inferSchema rule —
    XML inference reads the data twice and is sampling-dependent)."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from candyspark.sources.readers import load_xml
    from candyspark.sources.sinks import save_xml

    d = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = str(tmp_path / "docs_xml")
    save_xml(d, path, row_tag="doc")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", IntegerType()),
        ]
    )
    back = load_xml(spark, path, row_tag="doc", schema=schema).select(
        "doc_id", "lang", "source", "n_chars"
    )
    assert back.count() == d.count()
    assert back.exceptAll(d).count() == 0 and d.exceptAll(back).count() == 0
