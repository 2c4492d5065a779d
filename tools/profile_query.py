#!/usr/bin/env python3
"""Per-query job profiler: wall vs sum-of-jobs vs driver gaps (guide §1).

Runs each named registry query N times through the noop sink and, per pass,
attributes wall time to Spark jobs via the UI REST API (status tracker):
  wall      = end - start of the fn() + noop write
  n_jobs    = jobs submitted inside the window
  job_sum   = sum of per-job durations (can exceed wall when jobs overlap)
  job_union = wall covered by the union of job intervals
  gap       = wall - job_union  (driver-side: planning, collects, py4j)

Usage: python tools/profile_query.py q1 q2 ... [--passes 3] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candyspark.plans import collect_registry  # noqa: E402
from candyspark.session import get_spark  # noqa: E402


def _jobs(ui: str, app_id: str) -> list[dict]:
    url = f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def _ts(s: str) -> float:
    # "2026-08-18T04:00:00.123GMT"
    return (
        datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="candyspark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    registry = collect_registry()

    # warm-up (JVM/codegen)
    registry[args.queries[0]].fn(spark, args.sf).write.mode("overwrite").format(
        "noop"
    ).save()

    out: dict[str, dict] = {}
    for name in args.queries:
        walls, rows = [], []
        for i in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name}#p{i}")
            t0 = time.time()
            registry[name].fn(spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            t1 = time.time()
            spark.sparkContext.setJobDescription(None)
            walls.append(t1 - t0)
            jobs = [
                j
                for j in _jobs(ui, app_id)
                if "submissionTime" in j and _ts(j["submissionTime"]) >= t0 - 0.05
            ]
            ivs = sorted(
                (_ts(j["submissionTime"]), _ts(j.get("completionTime", j["submissionTime"])))
                for j in jobs
            )
            merged: list[list[float]] = []
            for a, b in ivs:
                if merged and a <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], b)
                else:
                    merged.append([a, b])
            union = sum(b - a for a, b in merged)
            rows.append(
                {
                    "wall": round(t1 - t0, 3),
                    "n_jobs": len(jobs),
                    "job_sum": round(sum(b - a for a, b in ivs), 3),
                    "job_union": round(union, 3),
                    "gap": round((t1 - t0) - union, 3),
                }
            )
        med = sorted(walls)[len(walls) // 2]
        out[name] = {
            "wall_median": round(med, 3),
            "wall_min": round(min(walls), 3),
            "passes": rows,
        }
        print(f"{name}: med {med:.3f}s min {min(walls):.3f}s  " + json.dumps(rows[-1]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
