#!/usr/bin/env python3
"""Capture .explain('formatted') for named queries into plans/<dir>/.

Usage: python tools/capture_plans.py --dir plans/r07 --suffix _before q1 q2 ...
Captures at sf0.1 (the benched SF) — same as the r06 captures.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candyspark.plans import collect_registry  # noqa: E402
from candyspark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--dir", default="plans/r07")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="candyspark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = collect_registry()
    os.makedirs(args.dir, exist_ok=True)
    for name in args.queries:
        df = registry[name].fn(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.dir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
