"""Physical-plan posture tests (SURVEY.md §4.3): the properties that make
plans survive a 100× scale-up are asserted on explain output, not assumed —
pushdown reaching the scan, column pruning, broadcast dims, and shuffle
discipline all regress silently if an operator is rewritten carelessly."""

from __future__ import annotations

import contextlib
import io

from candyspark.plans import collect_registry

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str, mode: str = "formatted") -> str:
    df = collect_registry()[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_small_dim_join_is_broadcast(spark):
    """J1-class joins against tiny dims must not shuffle the fact side."""
    plan = plan_of(spark, "join_left_broadcast")
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark):
    """P-class predicates must land in the parquet scan, not a post-scan
    Filter only — at 100 TB the difference is reading row groups vs all."""
    plan = plan_of(spark, "filter_project")
    assert "PushedFilters: [" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("PushedFilters: []" not in ln for ln in pushed), pushed


def test_column_pruning_daily_summary(spark):
    """The flagship aggregate projects 3-4 lineitem columns; the scan must
    not read the wide ones (l_comment is the canary)."""
    plan = plan_of(spark, "daily_summary")
    assert "l_comment" not in plan


def test_scan_stage_text_ops_have_no_keyed_shuffle(spark):
    """Per-row text statistics are scan-stage expressions: no data-dependent
    (hash-partitioned) exchange anywhere. A round-robin fan-out exchange is
    permitted — it only fires on small-file scans (readers.fan_out) and is a
    no-op at scale, whereas a hashpartitioning exchange would mean the
    operator grew a keyed shuffle."""
    for name in ("text_stats", "lang_id", "doc_fingerprint", "token_counts", "simhash"):
        plan = plan_of(spark, name)
        assert "hashpartitioning" not in plan, f"{name} plan key-shuffles:\n{plan}"


def test_greedy_allocation_single_shuffle(spark):
    """The allocator is ONE groupBy-applyInPandas pass — exactly one shuffle
    exchange (the reference's per-day loop shuffled 10×, SURVEY.md §4.2);
    the dim attach is a broadcast, not a shuffle."""
    plan = plan_of(spark, "greedy_allocation")
    shuffles = [
        ln for ln in plan.splitlines() if "Arguments: hashpartitioning" in ln
    ]
    assert len(shuffles) == 1, plan


def _plan_nodes(plan: str) -> list[str]:
    """Formatted-explain detail blocks, one per physical node."""
    return plan.split("\n\n")


def test_minhash_band_exchange_carries_no_shingles(spark):
    """The LSH band self-join input is (doc_id, band, band_key) only —
    shingle arrays join back in AFTER candidate pruning. Whether Spark
    broadcasts the band table (tiny sf) or shuffles it (at scale), the
    exchange feeding the band join must not ship shingles."""
    plan = plan_of(spark, "dedup_minhash")
    band_nodes = [
        b
        for b in _plan_nodes(plan)
        if "Exchange" in b.splitlines()[0] and "band_key" in b
    ]
    assert band_nodes, plan
    for block in band_nodes:
        assert "sh#" not in block, block


def test_asof_join_is_single_window_pass(spark):
    """The as-of join is union + running window: one shuffle on the key, no
    range-condition join operator anywhere in the plan."""
    plan = plan_of(spark, "asof_click_attribution")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    shuffles = [ln for ln in plan.splitlines() if "Arguments: hashpartitioning" in ln]
    assert len(shuffles) == 1, plan


def test_range_join_plans_as_equi_join(spark):
    """Interval banding must turn the point-in-range predicate into a plain
    (key, band) equi-join — never a nested-loop join."""
    plan = plan_of(spark, "range_join_error_window")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan


def test_sample_hash_is_scan_stage(spark):
    """Deterministic sampling is a pure scan-stage predicate: no keyed
    shuffle (the final orderBy's range exchange is the only one allowed)."""
    plan = plan_of(spark, "sample_hash")
    assert "hashpartitioning" not in plan, plan


def test_pivot_scans_input_once(spark):
    """The explicit pivot value list means no distinct-discovery job and a
    single scan of lineitem."""
    plan = plan_of(spark, "pivot_linestatus")
    scans = [ln for ln in plan.splitlines() if ln.startswith("Location: InMemoryFileIndex")]
    assert len(scans) == 1, plan


def test_corpus_clean_single_keyed_shuffle(spark):
    """The composite cleaner shuffles once (the dedup window on norm text);
    quality/length gates evaluate before that exchange."""
    plan = plan_of(spark, "corpus_clean")
    shuffles = [ln for ln in plan.splitlines() if "Arguments: hashpartitioning" in ln]
    assert len(shuffles) == 1, plan


def test_cube_expands_without_rescan(spark):
    """CUBE is one Expand over one scan — not a union of per-grouping-set
    re-scans."""
    plan = plan_of(spark, "cube_qty")
    assert "Expand" in plan
    scans = [ln for ln in plan.splitlines() if ln.startswith("Location: InMemoryFileIndex")]
    assert len(scans) == 1, plan


def test_window_family_single_shuffle(spark):
    """lag/lead/movavg/ntile share one partitioning+ordering: the plan must
    contain exactly one keyed exchange (and at most two Window operators —
    running frame vs whole-partition frame)."""
    plan = plan_of(spark, "window_lag_movavg")
    shuffles = [ln for ln in plan.splitlines() if "Arguments: hashpartitioning" in ln]
    assert len(shuffles) == 1, plan


def test_profile_single_scan(spark):
    """The profiler reads lineitem exactly once — per-column loops would be
    N scans at 100 TB."""
    plan = plan_of(spark, "profile_lineitem")
    scans = [ln for ln in plan.splitlines() if ln.startswith("Location: InMemoryFileIndex")]
    assert len(scans) == 1, plan


def test_approx_aggregates_split_distinct_from_sketch(spark):
    """Round 4: the distinct aggregate runs in its OWN groupBy — Spark's
    distinct-agg rewrite (Expand) degrades a co-planned approx_percentile
    ~20× (measured 29.3 s combined vs 1.5 s apart at sf0.1), so the two
    5-row aggregates broadcast-join back together. Pin the split: no
    single aggregate node carries both the distinct rewrite and the
    percentile sketch, and the reassembly is a broadcast join."""
    plan = plan_of(spark, "approx_aggregates")
    assert "BroadcastHashJoin" in plan, plan
    # the Expand (distinct rewrite) subtree must not contain the sketch:
    # in the formatted tree the sketch aggregate appears under a separate
    # aggregate chain from any Expand node
    # the split's observable invariant regardless of how the distinct
    # rewrite is rendered: each aggregate keeps its own scan (2, never the
    # 1 of the co-planned form that carried the 20x regression)
    scans = [
        ln
        for ln in plan.splitlines()
        if ln.startswith("Location: InMemoryFileIndex")
    ]
    assert len(scans) == 2, plan


def test_corpus_ops_are_narrow(spark):
    """Chunking (UDTF shape), PII scrub, and stratified sampling are pure
    per-row plans: zero exchanges — they pipeline inside the scan stage at
    any scale."""
    for name in ("chunk_documents", "pii_scrub", "sample_stratified"):
        plan = plan_of(spark, name)
        assert "Exchange" not in plan, f"{name}: {plan}"


def test_trade_share_nation_joins_broadcast(spark):
    """The six-relation chain joins nation twice; both sides must be
    broadcast (25 rows at any SF) and the lineitem scan must not read
    measure columns the query never touches (l_returnflag is the canary)."""
    plan = plan_of(spark, "local_trade_share")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "l_returnflag" not in plan, plan


def test_shipping_priority_topk_and_pushdown(spark):
    """Q3 shape: the date/segment filters reach the parquet scans, and the
    top-10 is a TakeOrdered — a global Sort before limit would materialize
    the full grouped result at 100 TB."""
    plan = plan_of(spark, "shipping_priority")
    assert "TakeOrderedAndProject" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert sum("PushedFilters: []" not in ln for ln in pushed) >= 3, pushed


def test_exists_shapes_plan_as_semi_and_anti(spark):
    """Q4/Q21 shapes: EXISTS must plan as LeftSemi and NOT EXISTS as
    LeftAnti — a correlated re-execution or inner-join + distinct rewrite
    would re-materialize the fact side at 100 TB."""
    plan = plan_of(spark, "order_priority_check")
    assert "LeftSemi" in plan, plan
    plan = plan_of(spark, "exclusive_return_suppliers")
    assert "LeftAnti" in plan, plan


def test_scalar_subquery_is_broadcast_not_reexecuted(spark):
    """Q11 shape: the global-total compare must be a broadcast nested-loop
    over a ONE-ROW side (fine at any scale) — never a shuffled cross join."""
    plan = plan_of(spark, "important_part_value")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_disjunctive_predicate_pushes_common_factors(spark):
    """Q19 shape: Catalyst extracts pushable factors from the OR-of-ANDs;
    at minimum the partkey/brand-size domain must reach the part scan as
    pushed filters rather than evaluating everything post-join."""
    plan = plan_of(spark, "disjunctive_revenue")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("PushedFilters: []" not in ln for ln in pushed), pushed


def test_scd2_single_window_shuffle(spark):
    """SCD2's lag-collapse and lead-close share ONE hashpartitioning
    exchange on the key — a second exchange would mean the two window
    passes stopped sharing their partitioning."""
    plan = plan_of(spark, "scd2_history")
    shuffles = [ln for ln in plan.splitlines() if "Arguments: hashpartitioning" in ln]
    assert len(shuffles) == 1, plan


def test_merge_and_diff_join_on_keys(spark):
    """MERGE/CDC plan as keyed joins (sort-merge or hash), never a
    nested-loop — a theta rewrite would be quadratic at 100 TB."""
    for name in ("merge_upsert", "snapshot_diff"):
        plan = plan_of(spark, name)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_q6_pushdown_and_pruning(spark):
    """The Q6 shape's whole point: date/discount/quantity predicates reach
    the parquet scan, and the projection prunes to the 4 touched columns."""
    plan = plan_of(spark, "discount_revenue_lift")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("PushedFilters: []" not in ln for ln in pushed), pushed
    assert "l_comment" not in plan and "l_partkey" not in plan, plan


def test_zscore_stats_join_is_broadcast(spark):
    """The per-type moments dim is a handful of rows — the corpus side must
    not shuffle to meet it."""
    plan = plan_of(spark, "zscore_outliers")
    assert "BroadcastHashJoin" in plan, plan


def test_weighted_sample_topk_not_global_sort(spark):
    """A-ES top-k must plan as TakeOrderedAndProject (per-partition top-k +
    k-row driver merge), never a global sort of the corpus."""
    plan = plan_of(spark, "weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan


def test_ohlc_single_shuffle(spark):
    """Both row_number windows and the final aggregate share the ONE
    (bar_start, event_type) exchange."""
    plan = plan_of(spark, "ohlc_bars")
    shuffles = [ln for ln in plan.splitlines() if "Arguments: hashpartitioning" in ln]
    assert len(shuffles) == 1, plan


def test_histogram_exchange_is_constant_width(spark):
    """The histogram aggregates on a derived 24-value int key: the exchange
    after partial aggregation carries ≤ buckets × tasks rows regardless of
    SF — assert the plan is partial-agg → exchange → final-agg with no
    extra shuffles."""
    plan = plan_of(spark, "histogram_prices")
    shuffles = [ln for ln in plan.splitlines() if "Arguments: hashpartitioning" in ln]
    assert len(shuffles) == 1, plan
    assert "HashAggregate" in plan, plan


def test_basket_pairs_topk_and_single_join(spark):
    """Round-6 shape: NO join at all — pairs are generated in-map from each
    order's sorted distinct part array (one groupBy(order) exchange, the
    _copurchase_edges discipline) and counted on a packed long; the top-100
    is TakeOrdered, not a global sort of all pairs."""
    plan = plan_of(spark, "basket_pairs")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan  # pair-gen is in-map, not a self-join
    assert "Generate" in plan, plan  # the explode over per-order pair arrays


def test_peak_concurrency_preaggregates_before_window(spark):
    """Sweep-line deltas are netted per (event_type, t) BEFORE the running
    sum, so the window input is distinct timestamps, not 2× events."""
    plan = plan_of(spark, "peak_concurrency", "simple")
    assert "Window" in plan, plan
    # in simple mode children print below their parent: the netting
    # aggregate on (event_type, t) must appear under the Window operator
    below_window = plan.split("Window")[-1]
    assert "HashAggregate(keys=[event_type" in below_window, plan


def test_repetition_signals_shuffles_on_doc_keys_only(spark):
    """Repetition/entropy rolls up (doc_id, word) → doc_id: every exchange
    is keyed on the document or finer — nothing global, so the shape is
    embarrassingly parallel at corpus scale."""
    plan = plan_of(spark, "repetition_signals")
    for ln in plan.splitlines():
        if "Arguments: hashpartitioning" in ln:
            assert "doc_id" in ln, ln


def test_robust_stats_fact_join_is_broadcast(spark):
    """Round-6 extractor shape: the fact never appears in the RETURNED plan
    at all — median/MAD extraction runs as the extractor's two bounded fact
    passes (operators/quantiles.py; the MAD deviation pass attaches the
    3-row median dim via an explicit F.broadcast, and the extractor's own
    unit/exec-budget tests pin those passes). The assembled result is a
    literal-frame join, so the old invariant (never shuffle the fact for
    the 3-row dim) holds trivially: no parquet scan, no fact exchange."""
    plan = plan_of(spark, "robust_stats")
    assert "Scan parquet" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan


def test_asof_strategies_agree_and_cogroup_plans_flatmap(spark):
    """The window as-of and the cogrouped-map merge_asof are two physical
    strategies behind ONE contract: identical output row-for-row
    (including null-match lefts and same-instant ties), and the cogroup
    form must plan as FlatMapCoGroupsInPandas over two co-partitioned
    exchanges — never a joined/pruned shape (the self-cogroup pruning
    hazard documented in operators/temporal.py)."""
    from candyspark.plans import collect_registry

    reg = collect_registry()
    a = reg["asof_click_attribution"].fn(spark, SF).toPandas()
    b = reg["asof_cogroup_attribution"].fn(spark, SF).toPandas()
    key = ["purchase_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for col in a.columns:
        ca, cb = a[col], b[col]
        assert (ca.isna() == cb.isna()).all(), col
        mask = ~ca.isna()
        assert (ca[mask].astype(str).values == cb[mask].astype(str).values).all(), col

    plan = plan_of(spark, "asof_cogroup_attribution", "simple")
    assert "FlatMapCoGroupsInPandas" in plan, plan


def test_runtime_bloom_filter_reduces_probe_scan(spark):
    """The 100-TB semi-join-reduction posture: when the build side of a
    shuffle join is selective (filtered dim) and too big to broadcast,
    Spark must inject a runtime bloom filter — the probe scan then drops
    non-matching rows BEFORE the shuffle (bloom_filter_agg on the build
    keys, might_contain on the probe). Thresholds are tuned down only
    because test data is tiny; at real scale the defaults fire."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {}
    for k, v in keys.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain(True)
        plan = buf.getvalue()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
