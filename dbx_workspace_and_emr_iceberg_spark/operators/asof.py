"""As-of join (SURVEY.md §2.3 J8) — nearest-earlier-match join.

Neither Spark SQL 3.5/4.x nor Trino 467 (the engines the reference
provisions, /root/reference/main.tf:761,809) has a native ASOF JOIN, so
this is a custom operator built from primitives Spark *does* have.

Strategy (scale-first): instead of a range join (which Catalyst would
plan as a broadcast-nested-loop — quadratic per key), tag and UNION the
two inputs, then run one window pass per key ordered by time, carrying
the most recent right-side row forward with last(..., ignorenulls=True).
Cost: ONE shuffle on the join key + a partition-local sort — linear in
input size, identical shape at 100 TB (skew on hot keys is the only
watch-out; mitigate upstream by salting or pre-filtering hot keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_ts <= left.left_ts`` and equal key ``on``.

    Left rows with no earlier right match keep NULLs (ASOF LEFT JOIN).
    Right timestamp column is exposed as ``right_ts + suffix``.

    ``tolerance_s`` (pandas ``merge_asof`` semantics): a match older
    than the left timestamp by more than this many seconds is treated
    as no-match (all carried columns NULL). Applied as a projection on
    the carried result — the plan shape (one shuffle + local sort)
    doesn't change.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    payload = [F.col(c).alias(c + suffix) for c in right_cols] + [
        F.col(right_ts).alias(right_ts + suffix)
    ]

    lhs = left.withColumn(_SIDE, F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = (
        right.select(F.col(on), F.col(right_ts), *[F.col(c) for c in right_cols])
        .withColumn(_SIDE, F.lit(0))
        .withColumn("__ts", F.col(right_ts))
    )

    # Align schemas: union needs both sides to carry all columns.
    lhs = lhs.select(
        *left.columns,
        _SIDE,
        "__ts",
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c + suffix)
            for c in right_cols
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(right_ts + suffix),
    )
    rhs = rhs.select(
        *[F.col(c) if c in (on,) else F.lit(None).alias(c) for c in left.columns],
        _SIDE,
        "__ts",
        *payload,
    )

    unioned = lhs.unionByName(rhs)
    # Right rows sort before left rows at identical timestamps so a
    # same-instant right row is visible to the left row (ts >= semantics).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(c + suffix), ignorenulls=True).over(w).alias("__c_" + c)
            for c in right_cols
        ],
        F.last(F.col(right_ts + suffix), ignorenulls=True).over(w).alias("__c_ts"),
    )
    matched = carried.filter(F.col(_SIDE) == 1)
    if tolerance_s is not None:
        in_tol = (
            F.col(left_ts).cast("long") - F.col("__c_ts").cast("long")
        ) <= F.lit(tolerance_s)
        matched = matched.select(
            *left.columns,
            _SIDE,
            "__ts",
            *[
                F.when(in_tol, F.col("__c_" + c)).alias("__c_" + c)
                for c in right_cols
            ],
            F.when(in_tol, F.col("__c_ts")).alias("__c_ts"),
        )
    out = matched.select(
        *left.columns,
        *[F.col("__c_" + c).alias(c + suffix) for c in right_cols],
        F.col("__c_ts").alias(right_ts + suffix),
    )
    return out
