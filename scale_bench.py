#!/usr/bin/env python3
"""Scale validation: measure the heavy query families under real
data-volume pressure (round-2 verdict item 1).

The driver fixtures stop at sf0.1, which BASELINE.md's cross-SF check shows
is fixed-overhead-dominated — so this harness generates the same star schema
at sf0.1 AND sf1 with the in-engine generator (candyspark/sources/datagen.py,
same distributions, 10× the rows) and times each heavy family on both.
The headline number per query is the empirical scaling exponent
    alpha = log10(t_sf1 / t_sf0.1)
(1.0 = linear, <1 = sublinear/overhead-amortized). Each query must stay at
or below its documented complexity bound (the BOUNDS table) — a query whose
wall-time grows worse than its bound fails loudly here long before 100 TB.

Usage: python scale_bench.py [--passes 2] [--skip-gen]
Writes one JSON line (SCALE_BENCH.json-able) and a markdown table to stdout.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from candyspark.plans import collect_registry  # noqa: E402
from candyspark.session import get_spark  # noqa: E402
from candyspark.sources.datagen import generate  # noqa: E402

BASE = os.environ.get("SCALE_DIR", "/root/repo/.scale")
SFS = [float(s) for s in os.environ.get("SCALE_SFS", "0.1,1").split(",")]

#: documented wall-time growth bound for a 10× data step, per query —
#: the exponent alpha must satisfy alpha <= bound + MARGIN. Bounds trace
#: to each operator's docstring complexity argument.
BOUNDS = {
    # banded LSH: signatures O(n), candidate pairs ~O(n) at fixed
    # similarity structure → linear
    "dedup_minhash": 1.0,
    # sqrt(n) centroids: assignment O(n·sqrt(n)) in centroid count but the
    # pair join is Σ|cluster|² = O(n^1.5 / sqrt(n)) = O(n)·cluster_size;
    # with k=sqrt(n) both terms are O(n^1.5) worst-case → 1.5
    "semantic_dedup": 1.5,
    # minhash pairs + bounded-round label propagation → linear-ish in
    # edges; edges grow with candidate pairs → 1.2
    "dedup_clusters": 1.2,
    # degree-oriented wedge join: O(|E|^1.5); |E| grows ~linearly with
    # lineitem at fixed parts-per-order → 1.5
    "triangle_count": 1.5,
    # grouped order-statistic extraction: two linear passes + tiny joins
    "robust_stats": 1.0,
    # mapInPandas batch-carry: one partition-parallel linear pass
    "greedy_allocation": 1.0,
    # tf index + query join: linear in corpus tokens
    "batch_retrieval": 1.0,
    # bigram tokenize is linear; the co-occurrence graph is VOCAB-bounded
    # so the 6 walk rounds are ~flat → linear overall
    "textrank_keywords": 1.0,
    # edge build is the linear pair aggregate; 4 frontier rounds join
    # node-sized relations against edges → edge-linear
    "bfs_hop_histogram": 1.2,
    # session-3 additions that touch corpus/event-scale relations:
    # phrase assembly ≈ token relation; 3 keyed passes → linear
    "rake_keywords": 1.0,
    # tf shuffle + 16× vocab expansion → linear in tokens
    "ams_f2_sketch": 1.0,
    # n·d explode + n·d²/4 pair join, d fixed → linear in vectors
    "linear_cka": 1.0,
    # one lead() window per user + k² aggregate → linear in events
    "markov_entropy_rate": 1.0,
    # per-user firsts + hour-bounded windows → linear in events
    "cumulative_incidence": 1.0,
    # tokenize + two keyed rank windows over per-term candidates → linear
    "interleave_eval": 1.0,
    # part co-purchase pairs bounded per order; club joins on shrinking
    # node sets → pair-linear
    "rich_club": 1.2,
    # session-4 additions:
    # co-purchase edge build (pair-linear) + 6 Katz rounds of edge joins
    "katz_centrality": 1.2,
    # round-6 (verdict item 3): the remaining iterative graph family.
    # HITS: bipartite edge list = distinct (custkey, partkey) purchase
    # pairs (edge-linear in lineitem); 8 rounds of two keyed
    # join+aggregates per round, each linear in edges → 1.2
    "hits_customers_parts": 1.2,
    # PPR: same co-purchase edge build as katz; 8 int64 rounds of one
    # keyed join+aggregate per round, linear in edges → 1.2
    "personalized_pagerank": 1.2,
    # round-6: minhash pair gen + components (both measured ≤0.71/decade)
    # + one cluster-grain rank window → the dedup_clusters bound
    "dedup_keep_best": 1.2,
    # contests = bounded pairs-per-order + part join; MM rounds are flat
    "bradley_terry": 1.2,
    # daily pair matrix is calendar-bounded; only the day aggregate grows
    "distance_correlation": 1.0,
    # two user_id reductions + calendar-bounded Newton rounds
    "cox_ph": 1.0,
    # one fact pass to brands x weeks cells; everything after is bounded
    "abc_xyz": 1.0,
    # per-customer rollup + <=25-nation stages
    "theil_inequality": 1.0,
    # user reduction + O(successes) ladder
    "bayesian_ab_beta": 1.0,
    # tokenize-linear tf index + bounded rank windows
    "average_precision_eval": 1.0,
    # session-4 cont.: 8x code expansion + broadcast ADC table, linear in corpus
    "pq_recall": 1.0,
    # one corpus scan at widest probe; per-level re-rank on candidates
    "ivf_probe_curve": 1.0,
    # unpivoted 4x stack pass, constant cell cardinality
    "mi_feature_ranking": 1.0,
    # backtest-origin window passes, calendar-bounded downstream
    "diebold_mariano": 1.0,
}
MARGIN = 0.25  # host noise allowance on a log10 scale (~78% wall-time slack)


def _unpersist_all(spark) -> None:
    """Drop every pinned block (localCheckpoint RDDs) between timed passes.

    The iterative graph queries eagerly localCheckpoint per round; those
    blocks stay pinned until the async ContextCleaner notices the Python
    references died. Across multiple sf10 passes the accumulation starves
    execution memory (observed: SparkOutOfMemoryError 'got 0' + GCLocker
    retries during the HITS probe). An explicit sweep between passes keeps
    each measurement starting from a clean block manager."""
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    # broadcast blocks (one per F.broadcast join per round) are only
    # reclaimed when the async ContextCleaner sees their JVM references
    # collected — force a GC, then give the cleaner thread a moment to
    # drain its queue, so a multi-pass probe can't OOM on the previous
    # passes' accumulated broadcasts (hits sf10 runs clean standalone
    # but OOM'd mid-probe before this)
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--queries", default=",".join(BOUNDS))
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list of tables to generate (default: all) — probing a "
        "single family only needs the tables it reads",
    )
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]
    tables = args.tables.split(",") if args.tables else None

    # sf1 needs real heap (the 1g JVM default OOMs on the pair joins)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = get_spark(app_name="candyspark-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = collect_registry()

    dirs = {}
    for sf in SFS:
        d = f"{BASE}/gen{sf:g}"
        dirs[sf] = d
        if not args.skip_gen:
            t0 = time.perf_counter()
            counts = generate(spark, d, sf, tables=tables)
            gen_desc = ", ".join(f"{t} {c:,}" for t, c in counts.items())
            print(
                f"# generated sf{sf:g}: {gen_desc} "
                f"in {time.perf_counter() - t0:.0f}s",
                file=sys.stderr,
            )

    # warm-up
    registry[names[0]].fn(spark, dirs[SFS[0]]).write.mode("overwrite").format(
        "noop"
    ).save()

    results = {}
    for name in names:
        per_sf = {}
        for sf in SFS:
            samples = []
            for _ in range(args.passes):
                _unpersist_all(spark)
                t0 = time.perf_counter()
                registry[name].fn(spark, dirs[sf]).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples.append(time.perf_counter() - t0)
            per_sf[sf] = round(_median(samples), 2)
        lo, hi = SFS[0], SFS[-1]
        alpha = round(
            math.log(per_sf[hi] / per_sf[lo]) / math.log(hi / lo), 3
        )
        results[name] = {
            **{f"t_sf{sf:g}": per_sf[sf] for sf in SFS},
            "alpha": alpha,
            "bound": BOUNDS.get(name),
            "ok": BOUNDS.get(name) is None or alpha <= BOUNDS[name] + MARGIN,
        }
        print(f"# {name}: {per_sf[lo]}s -> {per_sf[hi]}s  alpha={alpha}", file=sys.stderr)

    print(json.dumps({"metric": "scale_exponents", "passes": args.passes, "queries": results}))
    sf_cols = " | ".join(f"sf{sf:g} (s)" for sf in SFS)
    print(f"\n| query | {sf_cols} | alpha | bound | ok |", file=sys.stderr)
    print("|---" * (len(SFS) + 4) + "|", file=sys.stderr)
    for n, r in results.items():
        ts = " | ".join(str(r[f"t_sf{sf:g}"]) for sf in SFS)
        print(
            f"| {n} | {ts} | {r['alpha']} "
            f"| {r['bound']} | {'yes' if r['ok'] else 'NO'} |",
            file=sys.stderr,
        )
    bad = [n for n, r in results.items() if not r["ok"]]
    spark.stop()
    if bad:
        print(f"# EXCEEDED BOUNDS: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
