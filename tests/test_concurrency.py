"""Concurrent query execution on one SparkSession: Spark schedules jobs
from multiple driver threads concurrently (the shared-cluster / BI-server
usage mode), and every plan in this engine must be re-entrant — no shared
mutable state between query builds, no temp-view collisions (query
builders that need views mint uuid-suffixed names). Eight dissimilar
queries (joins, windows, kernels, text) race on 8 threads; all must
return their single-threaded answers."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from candyspark.plans import collect_registry

SF = "/root/testdata/sf0.001"

NAMES = [
    "daily_summary",
    "pricing_summary",
    "window_running_sum",
    "text_stats",
    "join_left_broadcast",
    "greedy_allocation",
    "basket_pairs",
    "scalar_functions",
    # round-2 kernels: the quantile extractor's localCheckpoints and the
    # LSH candidate join must also be re-entrant
    "robust_stats",
    "semantic_dedup",
    "containment_pairs",
    "gopher_quality_filter",
    # session-2 kernels: the MMR Arrow kernel, the BPE argmax/fold rounds
    # (driver-side collect per round), bm25's materialized relations, and
    # the salted two-phase top-k must all be re-entrant
    "similarity_mmr",
    "bpe_train_merges",
    "bm25_topk",
    "topk_salted",
]


def test_concurrent_queries_are_reentrant(spark):
    reg = collect_registry()
    serial = {n: reg[n].fn(spark, SF).count() for n in NAMES}

    def run(name: str) -> tuple[str, int]:
        return name, reg[name].fn(spark, SF).count()

    with ThreadPoolExecutor(max_workers=len(NAMES)) as pool:
        concurrent = dict(pool.map(run, NAMES))

    assert concurrent == serial
    assert all(v > 0 for v in serial.values())
