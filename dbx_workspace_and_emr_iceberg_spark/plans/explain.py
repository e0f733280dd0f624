"""Physical-plan inspection (SURVEY.md §4).

The optimizations the reference relies on are all Catalyst/DSv2
built-ins (predicate pushdown, column pruning, broadcast selection,
whole-stage codegen); these helpers make them *assertable* so the test
suite fails if a query plan regresses into a shape that wouldn't scale
— scans reading all columns, dim joins that shuffle the fact side,
Python round-trips in pure-relational plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _plan(df: DataFrame, mode: str) -> str:
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(explain_mode)


def formatted_plan(df: DataFrame) -> str:
    return _plan(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _plan(df, "simple")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of every scan node (empty string if the
    scan pushed nothing)."""
    out = []
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            out.append(s)
    return "\n".join(out)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns each Parquet scan actually reads (ReadSchema) — the
    column-pruning witness."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if s.startswith("ReadSchema:"):
            inner = s.split("struct<", 1)[-1].rstrip(">")
            cols.extend(c.split(":")[0] for c in inner.split(",") if c)
    return cols


def read_schema_raw(df: DataFrame) -> str:
    """The scan node's ReadSchema line verbatim ('' if the plan has no
    file scan) — the nested-pruning witness: struct subfields that were
    pruned never appear in it."""
    plan = formatted_plan(df)
    if "ReadSchema:" not in plan:
        return ""
    return plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the plan — the scale
    currency. BroadcastExchange is excluded (it replicates a small side,
    it does not repartition the big one). AQE may remove some at
    runtime; this is the static bound."""
    p = simple_plan(df)
    return p.count("Exchange") - p.count("BroadcastExchange")


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count (codegen explain mode — the
    formatted plan hides codegen boundaries under AQE pre-execution)."""
    return _plan(df, "codegen").count("WholeStageCodegen subtree")


def python_eval_count(df: DataFrame) -> int:
    """Python boundary crossings (BatchEvalPython = row UDF slow path,
    ArrowEvalPython / MapInPandas etc. = vectorized)."""
    p = simple_plan(df)
    return p.count("BatchEvalPython") + p.count("ArrowEvalPython")
