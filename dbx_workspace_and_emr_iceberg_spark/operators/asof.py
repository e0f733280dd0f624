"""As-of join (SURVEY.md §2.3 J8) — nearest-match-in-time join
(backward: latest earlier right row; forward: earliest later one).

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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row with equal key
    ``on``: ``direction="backward"`` (default) takes the latest right
    row with ``right_ts <= left_ts``; ``direction="forward"`` takes the
    earliest right row with ``right_ts >= left_ts`` (attribution joins:
    "next purchase at-or-after this click").

    Left rows with no match in the chosen direction keep NULLs (ASOF
    LEFT JOIN). Right timestamp column is exposed as
    ``right_ts + suffix``.

    ``tolerance_s`` (pandas ``merge_asof`` semantics): a match farther
    from the left timestamp than this many seconds is treated as
    no-match (all carried columns NULL). Applied as a projection on
    the carried result — the plan shape (one shuffle + local sort)
    doesn't change.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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
    # Same-instant right rows must be visible to left rows in either
    # direction (<=/>= are inclusive): backward sorts right (side 0)
    # before left (side 1) and carries the LAST earlier value forward;
    # forward sorts left before right and takes the FIRST later value.
    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts").asc(), F.col(_SIDE).desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    carried = unioned.select(
        "*",
        *[
            carry(F.col(c + suffix)).alias("__c_" + c)
            for c in right_cols
        ],
        carry(F.col(right_ts + suffix)).alias("__c_ts"),
    )
    matched = carried.filter(F.col(_SIDE) == 1)
    if tolerance_s is not None:
        delta = F.col(left_ts).cast("long") - F.col("__c_ts").cast("long")
        if direction == "forward":
            delta = -delta
        in_tol = delta <= F.lit(tolerance_s)
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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_s: int | None = None,
    bucket_s: int = 86_400,
) -> DataFrame:
    """asof_join with HOT-KEY SKEW protection: identical semantics, but
    the carry window partitions on (key, time-bucket) instead of key, so
    one hot key's rows spread over its time range instead of landing in
    a single straggler partition.

    Two-pass construction:
      1. per (key, bucket): the LATEST right row (max over an orderable
         struct headed by the timestamp) — one aggregation of the right
         side on (key, bucket);
      2. a per-key running max over bucket order turns those into SEED
         rows: "latest right row from any earlier bucket". This window
         runs over ONE row per (key, bucket) — a hot key contributes at
         most n_buckets rows, so the skewed-window problem cannot recur
         here;
      3. union left + right + seeds, then the usual carry window — now
         partitioned by (key, bucket). Seeds sort first in each bucket
         (side -1 at the bucket start), so continuity across bucket
         boundaries is exact.

    Tie semantics match asof_join (right rows visible to same-instant
    left rows); like the base operator, ties BETWEEN right rows at one
    instant are resolved arbitrarily — keep (key, ts) unique on the
    right. Choose bucket_s ≈ (time span / desired parallelism per hot
    key); the default of one day suits event data spanning weeks.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    bkt = lambda c: F.floor(F.col(c).cast("long") / bucket_s)  # noqa: E731

    # -- pass 1+2: per-(key,bucket) latest right row -> per-bucket seeds --
    pay = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    rhs_b = right.select(
        F.col(on), F.col(right_ts), *[F.col(c) for c in right_cols]
    ).withColumn("__bkt", bkt(right_ts))
    bucket_last = rhs_b.groupBy(on, "__bkt").agg(F.max(pay).alias("__p"))

    spine = (
        left.select(F.col(on), bkt(left_ts).alias("__bkt"))
        .union(rhs_b.select(on, "__bkt"))
        .distinct()
    )
    w_seed = (
        Window.partitionBy(on)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        spine.join(bucket_last, [on, "__bkt"], "left")
        .select(on, "__bkt", F.max("__p").over(w_seed).alias("__seed"))
        .filter(F.col("__seed").isNotNull())
    )

    # -- pass 3: bucketed union + carry (same shape as asof_join) --
    lhs = left.select(
        *left.columns,
        F.lit(1).alias(_SIDE),
        F.col(left_ts).alias("__ts"),
        bkt(left_ts).alias("__bkt"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c + suffix)
            for c in right_cols
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(right_ts + suffix),
    )
    rhs = rhs_b.select(
        *[F.col(c) if c == on else F.lit(None).alias(c) for c in left.columns],
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias("__ts"),
        "__bkt",
        *[F.col(c).alias(c + suffix) for c in right_cols],
        F.col(right_ts).alias(right_ts + suffix),
    )
    seed_rows = seeds.select(
        *[F.col(c) if c == on else F.lit(None).alias(c) for c in left.columns],
        F.lit(-1).alias(_SIDE),
        # bucket start, cast back to the ts column's own type (long ->
        # timestamp casts as epoch seconds; integer ts types cast plainly)
        (F.col("__bkt") * bucket_s)
        .cast(left.schema[left_ts].dataType)
        .alias("__ts"),
        "__bkt",
        *[F.col("__seed").getField(c).alias(c + suffix) for c in right_cols],
        F.col("__seed").getField("__rts").alias(right_ts + suffix),
    )

    unioned = lhs.unionByName(rhs).unionByName(seed_rows)
    w = (
        Window.partitionBy(on, "__bkt")
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
    return matched.select(
        *left.columns,
        *[F.col("__c_" + c).alias(c + suffix) for c in right_cols],
        F.col("__c_ts").alias(right_ts + suffix),
    )
