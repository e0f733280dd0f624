#!/usr/bin/env python
"""Capture .explain("formatted") for every benched query into
plans/<tag>/<name>_<suffix>.txt (judge evidence for optimization
rounds). Usage:

    python tools/capture_plans.py <tag> <suffix> [name ...]

e.g. ``python tools/capture_plans.py r19 before`` captures all
HEADLINE+ADDITIONS queries; passing names restricts the set.

Queries whose fn() executes eagerly (streaming twins, operators with
bounded driver collects) pay that execution here; the captured plan is
the plan of the RETURNED frame, which is what the bench times.
"""

from __future__ import annotations

import os
import sys
import traceback

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import ADDITIONS, HEADLINE, SF_DIR, bench_layout  # noqa: E402
from dbx_workspace_and_emr_iceberg_spark.plans.explain import (  # noqa: E402
    formatted_plan,
)
from dbx_workspace_and_emr_iceberg_spark.registry import all_queries  # noqa: E402
from dbx_workspace_and_emr_iceberg_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or (HEADLINE + ADDITIONS)
    out_dir = os.path.join(HERE, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    run_dir = bench_layout(SF_DIR)
    spark = get_spark(
        app_name="spark-graft-plan-capture",
        extra_conf={
            "spark.sql.files.openCostInBytes": str(128 * 1024 * 1024),
        },
    )
    queries = all_queries()
    for name in names:
        spark.catalog.clearCache()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = queries[name].fn(spark, run_dir)
            plan = formatted_plan(df)
        except Exception:
            plan = "CAPTURE FAILED:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(plan)
        print(f"captured {name}", flush=True)
    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
