"""Physical-plan inspection (SURVEY.md §4).

The optimizations the reference relies on are all Catalyst/DSv2
built-ins (predicate pushdown, column pruning, broadcast selection,
whole-stage codegen); these helpers make them *assertable* so the test
suite fails if a query plan regresses into a shape that wouldn't scale
— scans reading all columns, dim joins that shuffle the fact side,
Python round-trips in pure-relational plans.
"""

from __future__ import annotations

import re

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
    """TOP-LEVEL columns each Parquet scan actually reads (ReadSchema)
    — the column-pruning witness.  Split depth-aware, not on bare
    commas (review-pass r16, reproduced): a nested
    struct<meta:struct<format:string,orig_chars:int>> otherwise emits
    the phantom top-level column 'orig_chars', so pruning assertions
    fire falsely (or regressions hide behind phantom names)."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if not s.startswith("ReadSchema:"):
            continue
        inner = s.split("struct<", 1)[-1].rstrip(">")
        depth, cur = 0, []
        fields: list[str] = []
        for ch in inner:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                fields.append("".join(cur))
                cur = []
                continue
            cur.append(ch)
        if cur:
            fields.append("".join(cur))
        cols.extend(f.split(":")[0] for f in fields if f)
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
    # ReusedExchange contains the substring 'Exchange' but re-reads an
    # existing exchange's output — it is not an extra shuffle (and may
    # even reuse a BROADCAST exchange); counting it over-stated the
    # bound whenever a plan reuses a subtree (review-pass r16,
    # reproduced under AQE-off where reuse is planned statically)
    p = simple_plan(df)
    return (
        p.count("Exchange")
        - p.count("BroadcastExchange")
        - p.count("ReusedExchange")
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count (codegen explain mode — the
    formatted plan hides codegen boundaries under AQE pre-execution)."""
    return _plan(df, "codegen").count("WholeStageCodegen subtree")


def python_eval_count(df: DataFrame) -> int:
    """Python boundary crossings (BatchEvalPython = row UDF slow path;
    the rest are the Arrow-vectorized family). Counts the FULL family
    (review-pass r13): the old two-node count silently ignored
    MapInPandas/MapInArrow/FlatMapGroupsInPandas, making the
    zero-Python plan guard vacuous for exactly the operators it
    documents."""
    p = simple_plan(df)
    # "MapInArrow" is a substring of the 3.x-era "PythonMapInArrow"
    # spelling, so the one needle covers both without double-counting
    # (review-pass r13)
    # Spark 4 spells the window/aggregate pandas-UDF nodes
    # ArrowWindowPython / ArrowAggregatePython (review-pass r16,
    # reproduced — a pandas UDF in a window or agg position previously
    # kept the count at 0, exactly the r13 vacuous-guard defect for
    # two more node classes); the Spark 3 names are kept for plan
    # strings from older engines. FlatMapCoGroupsInPandas is NOT a
    # substring of FlatMapGroupsInPandas ('Co' breaks it) so cogroup
    # needs its own needle.
    return sum(
        p.count(n)
        for n in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "MapInPandas",
            "MapInArrow",
            "FlatMapGroupsInPandas",
            "FlatMapCoGroupsInPandas",
            "ArrowWindowPython",
            "ArrowAggregatePython",
            "WindowInPandas",
            "AggregateInPandas",
        )
    )


# --- centralized in-query scale guards (ADVICE r10) -------------------------
# Several queries assert their own plan SHAPE at run time (chunked
# windows, broadcast dim sides) — the 100 TB contract enforced on
# every execution, not only under pytest. The plan-string spellings
# below are Spark-version-dependent ("windowspecdefinition(...)",
# "BroadcastHashJoin"), so they live HERE, in one regex-tested place:
# an engine upgrade that reformats plans is a single fix, and
# tests/test_plans.py pins both the match and the non-match direction
# against hand-built frames.

# a sort order carries its direction as the argument's TRAILING token
# (optionally followed by NULLS FIRST/LAST) — matching ASC/DESC
# anywhere misclassified a partition EXPRESSION whose printed form
# merely contains the token (e.g. a CASE/string literal with ' DESC '
# inside) as a sort order, making a correctly partitioned window fail
# the guard (ADVICE r11)
_SORT_DIR = re.compile(r"\b(?:ASC|DESC)\b(?:\s+NULLS\s+(?:FIRST|LAST))?\s*$")


def _parse_window_partition_specs(plan: str) -> list[str]:
    """Pure string half of window_partition_specs — one entry per
    windowspecdefinition in ``plan``: the PARTITION clause text only
    ("" for a global window). Split out so tests can pin the parser
    against hand-written plan strings without building frames.

    Parsed paren-aware, not with a flat regex (review-pass r11): the
    spec's top-level arguments are partition expressions, then sort
    orders (each carrying a top-level ASC/DESC), then the trailing
    specifiedwindowframe(...) — a composite sort key like
    "cast(x#1 as double) ASC" or a windowspec with no ORDER BY at all
    defeats any [^,)]-style regex, and those were exactly the shapes
    that could slip past the old guard."""
    out: list[str] = []
    key = "windowspecdefinition("
    i = 0
    while True:
        j = plan.find(key, i)
        if j < 0:
            break
        k = j + len(key)
        depth, args, cur = 1, [], []
        while k < len(plan) and depth > 0:
            c = plan[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            if c == "," and depth == 1:
                args.append("".join(cur))
                cur = []
            else:
                cur.append(c)
            k += 1
        args.append("".join(cur))
        part = [
            a.strip()
            for a in args
            if a.strip()
            and not _SORT_DIR.search(a.strip())
            and not a.strip().startswith("specifiedwindowframe")
        ]
        out.append(", ".join(part))
        i = k
    return out


def window_partition_specs(df: DataFrame) -> list[str]:
    """One entry per window spec in the OPTIMIZED plan: the PARTITION
    clause text only ("" for a global window). Empty list = no
    windows. See _parse_window_partition_specs for the parse rules."""
    return _parse_window_partition_specs(
        df._jdf.queryExecution().optimizedPlan().toString()
    )


def assert_windows_partitioned_by(
    df: DataFrame, token: str, label: str
) -> None:
    """Every window spec must carry ``token`` in its partition clause —
    the chunked-rank contract (operators/skew.py): a window partitioned
    on the raw low-cardinality key alone (or on nothing) funnels one
    key's rows through ONE task at scale. Also requires at least one
    window to exist, so a silent plan rewrite can't vacuously pass."""
    specs = window_partition_specs(df)
    if not specs:
        raise AssertionError(f"{label}: expected windows in the plan")
    for s in specs:
        if token not in s:
            raise AssertionError(
                f"{label}: window not {token}-partitioned: "
                f"windowspecdefinition({s}...)"
            )


def assert_no_unpartitioned_window(
    df: DataFrame, label: str, require_window: bool = False
) -> None:
    """No window spec may be GLOBAL (empty partition clause) — the
    single-task whole-frame shape. Runs on the parsed spec list, so a
    composite sort key or a no-ORDER-BY running aggregate is caught
    too (review-pass r11: the old flat regex missed both).
    ``require_window=True`` additionally demands at least one window
    exists, so a plan rewrite can't pass vacuously."""
    specs = window_partition_specs(df)
    if require_window and not specs:
        raise AssertionError(f"{label}: expected a window in the plan")
    for s in specs:
        if not s:
            raise AssertionError(
                f"{label}: unpartitioned (single-task) window in plan"
            )


def assert_broadcast_no_cartesian(df: DataFrame, label: str) -> None:
    """The EXECUTED plan must contain a broadcast (the small side rides
    a BroadcastExchange) and no shuffle CartesianProduct — the dim-side
    contract for corpus-vs-small-frame joins (x49/x24 shape).

    BroadcastNestedLoopJoin is ACCEPTED by design, not an oversight:
    the caller's semantic is every-corpus-row-vs-every-benchmark-row
    (a dot-product threshold has no equi key), so all-pairs against a
    BROADCAST small side is exactly the wanted plan — one corpus scan,
    benchmark replicated. What must never appear is the two-sided
    shuffle cartesian. Callers whose joins DO have an equi key should
    assert "BroadcastNestedLoopJoin" not in the plan themselves (the
    x2b/test_plans spelling), not use this guard."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Broadcast" not in plan:
        raise AssertionError(f"{label}: small side not broadcast: " + plan)
    if "CartesianProduct" in plan:
        raise AssertionError(f"{label}: cartesian join in plan: " + plan)
