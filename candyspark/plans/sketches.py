"""Sketch aggregates and binned analytics: mergeable HLL distinct-count
sketches, equi-width histograms, OHLC time bars (extension surface; the
reference's only aggregates are sum/count/countDistinct — SURVEY.md §2.5).

Why sketches are first-class at 100 TB: an exact countDistinct shuffles
every distinct value; an HLL sketch is a fixed-size (~KB) commutative
accumulator, so per-partition sketches merge in one tiny exchange AND can
be persisted per partition/day and re-merged later without rescanning —
the incremental-rollup pattern. Spark 4 ships Apache DataSketches HLL as
built-in aggregates (hll_sketch_agg / hll_union_agg / hll_sketch_estimate).
Estimates are approximate by design → rows-only driver check; the error
bound vs exact is pinned in tests/test_sketches.py.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from candyspark.functions.numeric import snap_round
from candyspark.operators.text import char_hash32, tokens
from candyspark.plans import QuerySpec
from candyspark.sources.readers import load_table


def q_hll_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via HLL sketches, plus the '__all__'
    row built by MERGING the per-type sketches (hll_union_agg) — proving
    the rollup needs no second scan. lgConfigK=14 → ~0.8% relative error."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count(F.lit(1)).alias("num_events"),
    )
    typed = per.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "num_events",
    )
    merged = per.agg(
        F.hll_union_agg("sk").alias("sk"), F.sum("num_events").alias("num_events")
    ).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "num_events",
    )
    return typed.unionByName(merged).orderBy("event_type")


def q_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of lineitem extended price: 24 fixed buckets of
    width 5,000, top-clamped. Fixed bounds (not data-driven min/max) keep
    the plan one-pass: a single hash aggregate on a derived int key whose
    cardinality is 24 regardless of SF — the exchange is ~constant size."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(F.floor(F.col("l_extendedprice") / 5000).cast("int"), F.lit(23))
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("num_items"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * 5000).cast("double"))
        .select("bucket", "bucket_lo", "num_items", "total_price")
        .orderBy("bucket")
    )


HISTOGRAM_PRICES_SQL = """
SELECT bucket,
       CAST(bucket * 5000 AS DOUBLE) AS bucket_lo,
       COUNT(*) AS num_items,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
FROM (
    SELECT LEAST(CAST(FLOOR(l_extendedprice / 5000) AS INT), 23) AS bucket,
           l_extendedprice
    FROM lineitem
)
GROUP BY bucket
ORDER BY bucket
"""


def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucket) histogram of lineitem extended price:
    ntile(10) over the totally-ordered values, then per-bucket min/max/
    count/sum — the companion to the equi-width form above when the
    distribution is skewed (each bucket carries ~equal mass, so bucket
    bounds ARE the deciles).

    The ntile window is a global sort — single-partition by definition,
    same caveat as RFM (plans/behavior.py): exact and oracle-checkable
    here; at 100-TB cardinality the swap-in is approx-quantile cutoffs
    (one pass, mergeable sketch) with bucket assignment as a scan-stage
    comparison against the broadcast cutoff array. The tie-break
    (l_orderkey, l_linenumber) makes bucket assignment a total order, so
    both engines cut identically."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    return (
        li.withColumn("bucket", F.ntile(10).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("num_items"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("bucket")
    )


HISTOGRAM_EQUIDEPTH_SQL = """
SELECT bucket, COUNT(*) AS num_items,
       MIN(l_extendedprice) AS lo,
       MAX(l_extendedprice) AS hi,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
FROM (
    SELECT l_extendedprice,
           NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
    FROM lineitem
)
GROUP BY bucket
ORDER BY bucket
"""


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type: open/close = first/last value under
    the total order (ts, event_id), high/low = max/min, volume, turnover.

    Scale: one shuffle on (hour, event_type) serves both row_number windows
    AND the final aggregate (same partitioning, AQE reuses the exchange);
    open/close via rank-1 conditional aggregation rather than a collect or
    a self-join. The (ts, event_id) tie-break makes first/last total — a
    bare first_value over ts alone is nondeterministic under equal
    timestamps, the classic silent-flakiness bug in bar builders."""
    e = load_table(spark, sf_dir, "events")
    bars = e.select(
        F.date_trunc("hour", "ts").alias("bar_start"),
        "event_type",
        "ts",
        "event_id",
        "value",
    )
    asc = Window.partitionBy("bar_start", "event_type").orderBy("ts", "event_id")
    desc = Window.partitionBy("bar_start", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        bars.withColumn("rn_a", F.row_number().over(asc))
        .withColumn("rn_d", F.row_number().over(desc))
        .groupBy("bar_start", "event_type")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("turnover"),
        )
        .orderBy("bar_start", "event_type")
    )


OHLC_BARS_SQL = """
WITH b AS (
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_start,
           event_type, ts, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
                              ORDER BY ts, event_id) AS rn_a,
           ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
)
SELECT bar_start, event_type,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS volume,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS turnover
FROM b
GROUP BY bar_start, event_type
ORDER BY bar_start, event_type
"""


def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event_type via bitmap aggregation — the
    exact counterpart of the HLL sketch, still fully mergeable: each
    (group, bucket) holds a fixed-width bitmap of bit positions, bitmaps
    OR-combine map-side, and the per-group count is the sum of bucket
    popcounts. At 100 TB this replaces countDistinct's expand-shuffle of
    every distinct value with a bounded-width bitmap exchange — and daily
    bitmaps OR-merge into rollups with no rescan. Being exact, it
    hash-checks against plain COUNT(DISTINCT) in the oracle."""
    e = load_table(spark, sf_dir, "events")
    per_bucket = (
        e.groupBy("event_type", F.bitmap_bucket_number("user_id").alias("bucket"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("exact_users"))
        .orderBy("event_type")
    )


BITMAP_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches: set-operation cardinalities (union / intersection of
    clicker and purchaser user sets) from mergeable fixed-size sketches —
    the sketch family HLL cannot provide (HLL unions but never intersects).
    Approximate by design → rows-only check; error vs exact is pinned in
    tests/test_sketches.py."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    purchases = e.filter(F.col("event_type") == "purchase").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    both = clicks.select(F.lit("click").alias("side"), "sk").unionByName(
        purchases.select(F.lit("purchase").alias("side"), "sk")
    )
    merged = both.agg(
        F.theta_sketch_estimate(F.theta_union_agg("sk")).alias("union_users"),
        F.theta_sketch_estimate(F.theta_intersection_agg("sk")).alias(
            "intersect_users"
        ),
    )
    return merged.select(
        F.lit("click_x_purchase").alias("pair"), "union_users", "intersect_users"
    )


def q_ordered_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic aggregation-to-string: per lang, the sorted id list of
    a hash-thinned document sample, joined with commas. collect_list alone
    is partition-order-nondeterministic — sort_array before array_join is
    what makes string aggregation reproducible (same contract as DuckDB's
    string_agg ... ORDER BY). The thinning keeps the string bounded; an
    unbounded listagg over a group is a driver-OOM shape at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    sample = d.filter(F.col("doc_id") % 97 == 0)
    ids = F.array_join(
        F.transform(
            F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
        ),
        ",",
    )
    return (
        sample.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), ids.alias("doc_ids"))
        .orderBy("lang")
    )


ORDERED_LISTAGG_SQL = """
SELECT lang,
       COUNT(*) AS n_docs,
       array_to_string(list_transform(list_sort(list(doc_id)), x -> CAST(x AS VARCHAR)), ',')
           AS doc_ids
FROM documents
WHERE doc_id % 97 = 0
GROUP BY lang
ORDER BY lang
"""


# Rows-only by documented impossibility (round-6 verdict item 7): the HLL /
# theta estimates come from Spark's built-in Apache DataSketches aggregates.
# DuckDB's approx_count_distinct is a DIFFERENT HLL (different hash +
# estimator), so no DuckDB SQL can hash-match these by construction, and
# datasketches-python (the only independent same-format implementation) is
# not installed in this environment. Coverage instead: exact-error-bound
# tests (test_sketches.py, 3σ at each sketch's published RSE) + a
# cross-impl deserialize test that activates wherever datasketches IS
# importable (test_hll_sketch_bytes_cross_impl).
REGISTRY: dict[str, QuerySpec] = {
    "hll_sketches": QuerySpec(q_hll_sketches, None),  # approximate; tests pin error
    "histogram_prices": QuerySpec(q_histogram_prices, HISTOGRAM_PRICES_SQL),
    "histogram_equidepth": QuerySpec(q_histogram_equidepth, HISTOGRAM_EQUIDEPTH_SQL),
    "ohlc_bars": QuerySpec(q_ohlc_bars, OHLC_BARS_SQL),
    "bitmap_distinct": QuerySpec(q_bitmap_distinct, BITMAP_DISTINCT_SQL),
    "theta_set_ops": QuerySpec(q_theta_set_ops, None),  # approximate; tests pin error
    "ordered_listagg": QuerySpec(q_ordered_listagg, ORDERED_LISTAGG_SQL),
}


def q_sliding_hll_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from MERGED daily HLL
    sketches — the sketch answer to the sliding COUNT(DISTINCT) problem
    (plans/sequences.q_active_user_windows is the exact form; its
    contribute-then-count explodes per-user-day ROWS, this explodes
    per-day SKETCHES). At 100 TB the exact form inflates the dedup'd
    user-day relation 7×; here each day collapses to one ~KB sketch
    first, and the window merge moves 7 sketches per report day — the
    whole point of mergeable summaries (DataSketches HLL: union is
    lossless across splits).

    Approximate by design (lgConfigK=14 → ~0.8% RSE), so rows-only in
    the driver; test_sketches pins the error against the exact WAU.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
            "user_id",
        )
        .groupBy("d")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    )
    contrib = daily.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("day"), "sk"
    )
    days = daily.select(F.col("d").alias("day"))  # report only observed days
    return (
        contrib.groupBy("day")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .join(days, "day")
        .select(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("day").cast("int")).alias(
                "day"
            ),
            F.hll_sketch_estimate("sk").cast("long").alias("approx_wau"),
        )
        .orderBy("day")
    )


REGISTRY["sliding_hll_wau"] = QuerySpec(q_sliding_hll_wau, None)  # approximate


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch frequency estimation: build a d=4 × w=256 CMS over
    lineitem part keys, then probe it for the exact top-15 parts and
    report estimate vs truth (overestimate ≥ 0 is the CMS contract — min
    over rows can only collide upward, never undercount). Unlike the HLL
    family above this sketch is EXACTLY reproducible — the d row-hashes
    derive from md5, which both engines share bit-for-bit — so it gets a
    full DuckDB oracle, not a rows-only check. Build, probe, and the
    streaming form all share ONE cell definition
    (operators/sketch.cms_cells / cms_hash_pairs).

    Scale: the sketch is a fixed d·w = 1,024-cell aggregate no matter the
    input size — cells partial-aggregate map-side, the exchange carries
    ≤1,024 rows, and per-day sketches merge by cell-wise sum without
    rescanning (the same incremental-rollup property as the HLL rollup).
    The probe side broadcasts the tiny sketch; exact top-15 is a
    TakeOrdered over the one part-keyed aggregate.
    """
    from candyspark.operators.sketch import cms_cells, cms_hash_pairs
    from candyspark.sources.readers import fan_out

    d_rows, width = 4, 256
    # the 4 md5 row-hashes per line are the dominant compute and the compact
    # parquet lands in ~3 byte-sized splits (profiled: 2.8 s in a 3-task
    # stage) — fan out so the hash work parallelizes; no-op at real scale
    li = fan_out(load_table(spark, sf_dir, "lineitem").select("l_partkey"))
    cells = cms_cells(li, "l_partkey", d_rows, width)
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "l_partkey").limit(15)
    probes = top.select(
        "l_partkey",
        "exact_cnt",
        F.explode(cms_hash_pairs(F.col("l_partkey"), d_rows, width)).alias("rb"),
    ).select("l_partkey", "exact_cnt", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    return (
        probes.join(F.broadcast(cells), ["r", "b"])
        .groupBy("l_partkey", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "l_partkey",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "l_partkey")
    )


_CMS_H = (
    "CAST(CAST(concat('0x', substr(md5(concat(r, ':', CAST(l_partkey AS VARCHAR)))"
    ", 1, 8)) AS BIGINT) % 256 AS INT)"
)

CMS_HEAVY_HITTERS_SQL = f"""
WITH keys AS (SELECT l_partkey FROM lineitem),
cells AS (
    SELECT r, {_CMS_H} AS b, COUNT(*) AS cnt
    FROM keys CROSS JOIN (SELECT unnest([0,1,2,3]) AS r)
    GROUP BY 1, 2
),
exact AS (
    SELECT l_partkey, COUNT(*) AS exact_cnt FROM keys GROUP BY 1
),
top AS (
    SELECT l_partkey, exact_cnt FROM exact
    ORDER BY exact_cnt DESC, l_partkey LIMIT 15
),
probes AS (
    SELECT l_partkey, exact_cnt, r, {_CMS_H} AS b
    FROM top CROSS JOIN (SELECT unnest([0,1,2,3]) AS r)
)
SELECT l_partkey, exact_cnt, MIN(cnt) AS cms_est,
       MIN(cnt) - exact_cnt AS overestimate
FROM probes JOIN cells USING (r, b)
GROUP BY l_partkey, exact_cnt
ORDER BY exact_cnt DESC, l_partkey
"""


REGISTRY["cms_heavy_hitters"] = QuerySpec(q_cms_heavy_hitters, CMS_HEAVY_HITTERS_SQL)


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter semi-join pruning, made checkable: build an
    m=4096-bit, k=3 Bloom filter over the distinct customers with any
    order over $400k, probe EVERY customer through it, and report per
    market segment how many probe positive, how many truly belong, and
    the false positives — the filter's no-false-negative contract is
    enforced by construction (true_members ≤ bloom_positive per group).
    The k hashes derive from md5, so the filter — and therefore the FP
    set — is bit-for-bit reproducible in DuckDB: a sketch with a FULL
    value oracle. This is the same mechanism as Spark's runtime
    bloomFilter join pruning (exercised as posture in test_plans), here
    surfaced as a first-class, verifiable operator.

    Scale: the filter collapses to ONE row carrying the sorted array of
    set bit positions (≤m elements regardless of the build side's size;
    bit positions partial-aggregate map-side before the collect_set).
    That row broadcasts to the probe side, where membership is k
    array_contains expressions — pure scan-stage, the probe side never
    shuffles and never explodes. The only exchanges are the build side's
    distinct and the final ≤|segments| aggregate.
    """
    m_bits, k = 4096, 3
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    members = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select("o_custkey")
        .distinct()
        .localCheckpoint()  # build side reused: filter bits + truth join
    )

    def bit(i: int, key: F.Column) -> F.Column:
        return (
            char_hash32(F.concat(F.lit(f"{i}:"), key.cast("string"))) % m_bits
        ).cast("int")

    bloom = members.select(
        F.explode(F.array(*[bit(i, F.col("o_custkey")) for i in range(k)])).alias(
            "pos"
        )
    ).agg(F.array_sort(F.collect_set("pos")).alias("bitset"))
    probe = cust.select("c_custkey", "c_mktsegment").crossJoin(F.broadcast(bloom))
    hits = probe.select(
        "c_custkey",
        "c_mktsegment",
        functools.reduce(
            lambda a, b: a & b,
            [F.array_contains("bitset", bit(i, F.col("c_custkey"))) for i in range(k)],
        ).alias("positive"),
    )
    truth = members.select(F.col("o_custkey").alias("c_custkey")).withColumn(
        "is_member", F.lit(1)
    )
    return (
        hits.join(F.broadcast(truth), "c_custkey", "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum(F.col("positive").cast("int")).alias("bloom_positive"),
            F.sum(F.coalesce(F.col("is_member"), F.lit(0))).alias("true_members"),
            F.sum(
                F.when(F.col("positive") & F.col("is_member").isNull(), 1).otherwise(0)
            ).alias("false_positives"),
        )
        .orderBy("c_mktsegment")
    )


_BLOOM_H_AT = (
    "CAST(CAST(concat('0x', substr(md5(concat('{i}:', CAST({key} AS VARCHAR)))"
    ", 1, 8)) AS BIGINT) % 4096 AS INT)"
)

_BLOOM_H = (
    "CAST(CAST(concat('0x', substr(md5(concat(i, ':', CAST({key} AS VARCHAR)))"
    ", 1, 8)) AS BIGINT) % 4096 AS INT)"
)

BLOOM_MEMBERSHIP_SQL = f"""
WITH members AS (
    SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
),
bloom AS (
    SELECT list_sort(list(DISTINCT pos)) AS bitset FROM (
        SELECT {_BLOOM_H.format(key="o_custkey")} AS pos
        FROM members CROSS JOIN (SELECT unnest([0,1,2]) AS i)
    )
),
hits AS (
    SELECT c_custkey, c_mktsegment,
           list_contains(bitset, {_BLOOM_H_AT.format(key="c_custkey", i=0)})
       AND list_contains(bitset, {_BLOOM_H_AT.format(key="c_custkey", i=1)})
       AND list_contains(bitset, {_BLOOM_H_AT.format(key="c_custkey", i=2)})
           AS positive
    FROM customer CROSS JOIN bloom
)
SELECT c_mktsegment,
       COUNT(*) AS customers,
       CAST(SUM(CASE WHEN positive THEN 1 ELSE 0 END) AS BIGINT) AS bloom_positive,
       CAST(SUM(CASE WHEN m.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS true_members,
       CAST(SUM(CASE WHEN positive AND m.o_custkey IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS false_positives
FROM hits LEFT JOIN members m ON hits.c_custkey = m.o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


REGISTRY["bloom_membership"] = QuerySpec(q_bloom_membership, BLOOM_MEMBERSHIP_SQL)


def q_kmv_set_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) sketches with FULL value oracle:
    distinct-count, union, and Jaccard/intersection estimates between the
    urgent-order and high-value-order customer sets. The KMV estimator is
    the one mergeable sketch family that supports INTERSECTION (via the
    union sketch's Jaccard), which HLL cannot; unlike the built-in
    theta_sketch_agg (q_theta_set_ops — JVM-internal hashing, rows-only
    check), the k minimum md5-derived hash values are bit-for-bit
    reproducible in DuckDB, so every estimate here hash-checks.

    Estimators (Beyer et al., "On Synopses for Distinct-Value Estimation
    Under Multiset Operations", SIGMOD'07): with ν the k-th smallest of
    the 60-bit hashes normalized by 2^60, D̂ = (k−1)/ν; the union sketch
    is bottom-k of the MERGED sketches (never the raw union — that's the
    mergeability property); Jaccard ≈ |{h ∈ S_∪ : h ∈ S_A ∧ h ∈ S_B}|/k';
    D̂_∩ = J · D̂_∪. When a side has fewer than k distinct values its
    sketch IS the set and the count is exact — both engines share the
    branch.

    Scale: each sketch is a TakeOrdered over the side's distinct keys —
    k=64 rows ever cross an exchange; the membership joins run between
    ≤k-row broadcast relations. The build sides share ONE orders scan
    (the two predicates are conditional aggregates of the same pass is
    not possible for DISTINCT keys — but the scan is columnar and both
    filters push down; at 100 TB per-partition bottom-k partials merge,
    which is exactly what TakeOrdered does).
    """
    k = 64
    orders = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
    ).cast("bigint")

    def sketch(pred: F.Column) -> DataFrame:
        return (
            orders.filter(pred)
            .select(F.col("o_custkey"))
            .distinct()
            .select(h.alias("h"))
            .orderBy("h")
            .limit(k)
        )

    ska = sketch(F.col("o_orderpriority") == "1-URGENT").localCheckpoint()
    skb = sketch(F.col("o_totalprice") > 150000).localCheckpoint()
    sku = (
        ska.unionByName(skb).distinct().orderBy("h").limit(k).localCheckpoint()
    )

    def est(sk: DataFrame, name: str) -> DataFrame:
        # exact when the sketch didn't fill (fewer than k distinct)
        return sk.agg(
            F.count(F.lit(1)).alias("sz"), F.max("h").alias("nu")
        ).select(
            F.lit(name).alias("which"),
            F.when(
                F.col("sz") < k, F.col("sz").cast("double")
            )
            .otherwise(
                (F.lit(float(k - 1)) * F.pow(F.lit(2.0), F.lit(60.0)))
                / F.col("nu").cast("double")
            )
            .alias("raw"),
        )

    ests = (
        est(ska, "a")
        .unionByName(est(skb, "b"))
        .unionByName(est(sku, "u"))
        .groupBy()
        .pivot("which", ["a", "b", "u"])
        .agg(F.first("raw"))
    )
    inter = (
        sku.join(ska, "h", "left_semi")
        .join(skb, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    szu = sku.agg(F.count(F.lit(1)).alias("szu"))
    jac = F.col("n_both").cast("double") / F.col("szu").cast("double")
    return (
        ests.crossJoin(inter)
        .crossJoin(szu)
        .select(
            F.lit(k).alias("k"),
            snap_round(F.col("a"), 4).alias("est_urgent"),
            snap_round(F.col("b"), 4).alias("est_highvalue"),
            snap_round(F.col("u"), 4).alias("est_union"),
            F.col("n_both").alias("n_both"),
            snap_round(jac, 6).alias("jaccard_kmv"),
            snap_round(jac * F.col("u"), 4).alias("est_intersection"),
        )
    )


_KMV_H = (
    "CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT)"
)

KMV_SET_CARDINALITY_SQL = f"""
WITH ska AS (
    SELECT {_KMV_H} AS h
    FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    ORDER BY h LIMIT 64
),
skb AS (
    SELECT {_KMV_H} AS h
    FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000)
    ORDER BY h LIMIT 64
),
sku AS (
    SELECT h FROM (SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb))
    ORDER BY h LIMIT 64
),
est AS (
    SELECT
      (SELECT CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                   ELSE 63.0 * POW(2.0, 60.0) / CAST(MAX(h) AS DOUBLE) END
       FROM ska) AS a,
      (SELECT CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                   ELSE 63.0 * POW(2.0, 60.0) / CAST(MAX(h) AS DOUBLE) END
       FROM skb) AS b,
      (SELECT CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                   ELSE 63.0 * POW(2.0, 60.0) / CAST(MAX(h) AS DOUBLE) END
       FROM sku) AS u,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM sku
        WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)) AS n_both,
      (SELECT COUNT(*) FROM sku) AS szu
)
SELECT 64 AS k,
       CAST(ROUND(CAST(a AS DECIMAL(28,8)), 4) AS DOUBLE) AS est_urgent,
       CAST(ROUND(CAST(b AS DECIMAL(28,8)), 4) AS DOUBLE) AS est_highvalue,
       CAST(ROUND(CAST(u AS DECIMAL(28,8)), 4) AS DOUBLE) AS est_union,
       n_both,
       CAST(ROUND(CAST(CAST(n_both AS DOUBLE) / CAST(szu AS DOUBLE)
            AS DECIMAL(28,8)), 6) AS DOUBLE) AS jaccard_kmv,
       CAST(ROUND(CAST(CAST(n_both AS DOUBLE) / CAST(szu AS DOUBLE) * u
            AS DECIMAL(28,8)), 4) AS DOUBLE) AS est_intersection
FROM est
"""


REGISTRY["kmv_set_cardinality"] = QuerySpec(
    q_kmv_set_cardinality, KMV_SET_CARDINALITY_SQL
)


def q_hll_md5_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from first principles with md5-derived hashes —
    the FULLY ORACLE-CHECKED counterpart of q_hll_sketches (whose built-in
    DataSketches aggregate hashes JVM-side and can only be rows-checked).
    Estimates distinct customers per order priority, plus a '__all__' row
    whose registers are the per-priority registers MERGED BY MAX — the
    HLL union, proving the rollup needs no rescan of the fact table.

    Register math (Flajolet et al. 2007): m=256 registers; register index
    = first 8 bits of md5(custkey); rho = 1 + leading-zero count of the
    next 52 bits, computed EXACTLY from the hex string (zero-run length ×4
    plus a 16-way CASE on the first nonzero digit — no float log2, which
    is off-by-one at powers of two). The harmonic sum Σ 2^−M_j is scaled
    by 2^55 into an exact int64 (ρ ≤ 53 ⇒ every term is an integer ≥ 4;
    256 terms ≤ 2^62), so the sum is order-free and engine-exact; empty
    registers contribute 2^55 each via the register count. Small-range
    correction E ≤ 2.5m ∧ V>0 → m·ln(m/V) — the branch predicate runs on
    exact integers, so both engines take the same branch, and the single
    ln is snapped.

    Scale: the sketch is a fixed ≤|groups|·256-row aggregate whatever the
    input; register partials combine map-side by max; per-day/priority
    register sets merge by max without rescanning — the incremental
    rollup HLL exists for.
    """
    m = 256
    orders = load_table(spark, sf_dir, "orders")
    hexd = F.md5(F.col("o_custkey").cast("string"))
    idx = F.conv(F.substring(hexd, 1, 2), 16, 10).cast("int")
    w_hex = F.substring(hexd, 3, 13)
    lz = F.length(F.regexp_extract(w_hex, "^0*", 0))
    first_nz = F.substring(w_hex, (lz + 1).cast("int"), 1)
    extra = (
        F.when(first_nz == "1", 3)
        .when(first_nz.isin("2", "3"), 2)
        .when(first_nz.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(lz == 13, F.lit(53)).otherwise(lz * 4 + extra + 1)

    regs = (
        orders.select(
            F.col("o_orderpriority").alias("grp"), idx.alias("j"), rho.alias("rho")
        )
        .groupBy("grp", "j")
        .agg(F.max("rho").alias("mj"))
        # ≤|groups|·256 rows feeding BOTH the per-group and merged branches:
        # materialized once so the fact scan happens exactly once (lineage
        # re-derivation otherwise scans orders per consumer)
        .localCheckpoint()
    )
    merged = regs.groupBy("j").agg(F.max("mj").alias("mj")).select(
        F.lit("__all__").alias("grp"), "j", "mj"
    )
    all_regs = regs.unionByName(merged)

    alpha_m2 = (0.7213 / (1 + 1.079 / m)) * m * m
    per_grp = all_regs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("occupied"),
        F.sum(F.pow(F.lit(2.0), (F.lit(55) - F.col("mj")).cast("double")).cast("bigint"))
        .alias("s_occ"),
    )
    v = (F.lit(m) - F.col("occupied")).cast("long")
    total_scaled = (F.col("s_occ") + v * F.lit(2**55)).cast("double")
    raw = F.lit(alpha_m2) * F.lit(float(2**55)) / total_scaled
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return per_grp.select(
        F.col("grp").alias("o_orderpriority"),
        F.col("occupied").alias("occupied_registers"),
        snap_round(est, 4).alias("est_customers"),
    ).orderBy("o_orderpriority")


_HLL_RHO = """
CASE WHEN length(regexp_extract(w_hex, '^0*')) = 13 THEN 53
     ELSE length(regexp_extract(w_hex, '^0*')) * 4
          + CASE substr(w_hex, length(regexp_extract(w_hex, '^0*')) + 1, 1)
                 WHEN '1' THEN 3
                 WHEN '2' THEN 2 WHEN '3' THEN 2
                 WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                 ELSE 0 END
          + 1
END
"""

HLL_MD5_REGISTERS_SQL = f"""
WITH hashed AS (
    SELECT o_orderpriority AS grp,
           CAST(CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 2))
                AS BIGINT) AS INT) AS j,
           substr(md5(CAST(o_custkey AS VARCHAR)), 3, 13) AS w_hex
    FROM orders
),
rho AS (
    SELECT grp, j, {_HLL_RHO} AS rho FROM hashed
),
regs AS (
    SELECT grp, j, MAX(rho) AS mj FROM rho GROUP BY grp, j
),
all_regs AS (
    SELECT grp, j, mj FROM regs
    UNION ALL
    SELECT '__all__' AS grp, j, MAX(mj) AS mj FROM regs GROUP BY j
),
per_grp AS (
    SELECT grp,
           COUNT(*) AS occupied,
           SUM(CAST(POW(2.0, CAST(55 - mj AS DOUBLE)) AS BIGINT)) AS s_occ
    FROM all_regs GROUP BY grp
),
est AS (
    SELECT grp, occupied,
           (0.7213 / (1 + 1.079 / 256)) * 256 * 256 * POW(2.0, 55.0)
             / CAST(s_occ + (256 - occupied) * CAST(2 AS BIGINT) ** 55 AS DOUBLE)
             AS raw,
           CAST(256 - occupied AS BIGINT) AS v
    FROM per_grp
)
SELECT grp AS o_orderpriority,
       occupied AS occupied_registers,
       CAST(ROUND(CAST(
           CASE WHEN raw <= 2.5 * 256 AND v > 0
                THEN 256.0 * LN(256.0 / CAST(v AS DOUBLE))
                ELSE raw END
           AS DECIMAL(28,8)), 4) AS DOUBLE) AS est_customers
FROM est
ORDER BY o_orderpriority
"""


REGISTRY["hll_md5_registers"] = QuerySpec(q_hll_md5_registers, HLL_MD5_REGISTERS_SQL)


def q_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy 1996) second-frequency-moment sketch over
    the corpus token distribution, audited against the exact F2 = Σ_t tf_t²
    — the sketch family's "repeat rate / self-join size" member (HLL
    estimates distinct counts = F0; this estimates F2, the quantity that
    sizes a token-keyed self-join and measures corpus skew).

    16 independent estimators: estimator r signs each term by the parity
    of md5(r:term) (4-wise-independent stand-in both engines share
    bit-for-bit), Z_r = Σ_t ±tf_t is one exact decimal aggregate, and
    E[Z²] = F2. The median of the 16 Z² values (two middle order
    statistics of a 16-row relation) is the variance-reduced estimate.
    Scale: the tf relation shuffles once (term-keyed, map-side combined);
    the 16-way sign expansion is a broadcast cross join — 16·|vocab|
    rows, one more aggregate, constant-size tail.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("decimal(18,0)").alias("tf"))
        .localCheckpoint()  # consumers: exact F2 + 16-estimator expansion
    )
    exact = tf.agg(F.sum(F.col("tf") * F.col("tf")).alias("f2_exact"))
    rs = spark.range(1, 17).select(F.col("id").cast("int").alias("r"))
    signed = tf.crossJoin(F.broadcast(rs)).select(
        "r",
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("term"))),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("int")
            % 2
            == 0,
            F.col("tf"),
        )
        .otherwise(-F.col("tf"))
        .alias("z_term"),
    )
    zs = signed.groupBy("r").agg(F.sum("z_term").alias("z"))
    est = zs.select((F.col("z") * F.col("z")).cast("decimal(38,0)").alias("est"))
    wv = Window.orderBy("est")
    mid = est.select("est", F.row_number().over(wv).alias("rk")).filter(
        F.col("rk").isin(8, 9)
    )
    med = mid.agg((F.sum("est") / 2).cast("decimal(38,1)").alias("ams_median"))
    out = med.crossJoin(F.broadcast(exact))
    return out.select(
        F.col("f2_exact").cast("double").alias("f2_exact"),
        F.col("ams_median").cast("double").alias("ams_estimate"),
        snap_round(
            F.abs(
                F.col("ams_median").cast("double") - F.col("f2_exact").cast("double")
            )
            / F.col("f2_exact").cast("double"),
            6,
        ).alias("rel_error"),
    )


_AMS_TOKS = r"list_filter(string_split_regex(lower(text), '\W+'), x -> x != '')"

AMS_F2_SKETCH_SQL = f"""
WITH tf AS (
    SELECT term, CAST(COUNT(*) AS DECIMAL(18,0)) AS tf
    FROM (SELECT unnest({_AMS_TOKS}) AS term FROM documents)
    GROUP BY term
),
exact AS (SELECT SUM(tf * tf) AS f2_exact FROM tf),
signed AS (
    SELECT r,
           CASE WHEN CAST(concat('0x', substr(md5(concat(CAST(r AS VARCHAR), ':', term)), 1, 1))
                     AS INTEGER) % 2 = 0
                THEN tf ELSE -tf END AS z_term
    FROM tf CROSS JOIN (SELECT unnest(range(1, 17)) AS r)
),
zs AS (SELECT r, SUM(z_term) AS z FROM signed GROUP BY r),
est AS (SELECT CAST(z * z AS DECIMAL(38,0)) AS est FROM zs),
mid AS (
    SELECT est FROM (SELECT est, ROW_NUMBER() OVER (ORDER BY est) AS rk FROM est)
    WHERE rk IN (8, 9)
),
med AS (SELECT CAST(SUM(est) / 2 AS DECIMAL(38,1)) AS ams_median FROM mid)
SELECT CAST(f2_exact AS DOUBLE) AS f2_exact,
       CAST(ams_median AS DOUBLE) AS ams_estimate,
       CAST(ROUND(CAST(
           ABS(CAST(ams_median AS DOUBLE) - CAST(f2_exact AS DOUBLE))
           / CAST(f2_exact AS DOUBLE)
           AS DECIMAL(28,8)), 6) AS DOUBLE) AS rel_error
FROM med CROSS JOIN exact
"""

REGISTRY["ams_f2_sketch"] = QuerySpec(q_ams_f2_sketch, AMS_F2_SKETCH_SQL)
