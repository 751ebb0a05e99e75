#!/usr/bin/env python
"""Capture .explain('formatted') for registry queries into plans/r16/.

Usage: python tools/capture_plans.py <suffix> [name ...]
  suffix: 'before' or 'after' (file becomes plans/r16/<name>_<suffix>.txt)
  names:  query names; default = every driver query + the benched extras.

Plan capture is driver-side (analysis + physical planning, no jobs), so
it is safe to run beside other work; it never executes the queries.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mysql2pg_spark.plans import QUERIES  # noqa: E402
from mysql2pg_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        from mysql2pg_spark.plans import DRIVER_QUERIES

        names = list(
            dict.fromkeys(
                list(DRIVER_QUERIES) + bench.HEADLINE + bench.EXTRA
            )
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r17")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in QUERIES:
            print(f"skip (unknown): {name}")
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture what we can, keep going
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
