#!/usr/bin/env python
"""Capture .explain("formatted") for every benched query into
plans/<tag>/<name>_<suffix>.txt (judge evidence for optimization
rounds). Usage:

    python tools/capture_plans.py <tag> <suffix> [--nocache] [name ...]

e.g. ``python tools/capture_plans.py r19 before`` captures all
HEADLINE+ADDITIONS queries; passing names restricts the set.
``--nocache`` no-ops DataFrame.cache/persist for the capture so the
plan above an in-query cache boundary is visible (r20).

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
    flags = {a for a in sys.argv[1:] if a in ("--nocache", "--nockpt")}
    argv = [a for a in sys.argv[1:] if a not in flags]
    tag, suffix = argv[0], argv[1]
    names = argv[2:] or (HEADLINE + ADDITIONS)
    # patch the CLASSIC DataFrame class — in Spark 4 pyspark.sql.
    # DataFrame is the abstract base and the classic subclass's own
    # methods would shadow a base-class patch (found empirically: the
    # first --nocache capture still showed InMemoryTableScan)
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover - pre-4.0 layout
        from pyspark.sql import DataFrame
    if "--nocache" in flags:
        # capture ABOVE the cache boundary (VERDICT r19 #5 evidence
        # hygiene: a query whose returned frame sits on an in-query
        # .cache()/.persist() otherwise captures an 8-line
        # InMemoryTableScan stub).  Monkeypatched for THIS capture
        # process only; localCheckpoint is NOT patched by this flag
        # (truncating those lineages is itself a captured plan
        # property) — add --nockpt to see through checkpoints too
        # (x31's dedup stage sits under one).
        DataFrame.cache = lambda self: self  # type: ignore[assignment]
        DataFrame.persist = (  # type: ignore[assignment]
            lambda self, *a, **k: self
        )
    if "--nockpt" in flags:
        DataFrame.localCheckpoint = (  # type: ignore[assignment]
            lambda self, *a, **k: self
        )
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
