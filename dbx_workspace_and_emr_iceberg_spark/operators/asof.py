"""As-of join (SURVEY.md §2.3 J8) — nearest-match-in-time join
(backward: latest earlier right row; forward: earliest later one).

Neither Spark SQL 3.5/4.x nor Trino 467 (the engines the reference
provisions, /root/reference/main.tf:761,809) has a native ASOF JOIN, so
this is a custom operator built from primitives Spark *does* have.

Strategy (scale-first): instead of a range join (which Catalyst would
plan as a broadcast-nested-loop — quadratic per key), tag and UNION the
two inputs, then run one window pass per key ordered by time, carrying
the nearest right-side ROW as a single struct with
last/first(..., ignorenulls=True). Row-struct carry gives true ASOF
semantics: the matched row's own NULL payload fields stay NULL — they
are never backfilled from older rows the way independent per-column
carries would.
Cost: ONE shuffle on the join key + a partition-local sort — linear in
input size, identical shape at 100 TB (skew on hot keys is the only
watch-out; use :func:`asof_join_bucketed` for hot keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

_SIDE = "__asof_side"


def _require_utc_for_ntz(left: DataFrame, l_type, r_type) -> None:
    """NTZ epoch math (tolerance deltas, bucket ids, seed timestamps)
    hops NTZ->TIMESTAMP, which reads the naive value in the SESSION
    zone: under a DST-observing zone that mapping is nonlinear and
    silently skews tolerances and bucket boundaries. Fail loudly
    instead of mis-joining."""
    if isinstance(l_type, TimestampNTZType) or isinstance(r_type, TimestampNTZType):
        tz = left.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT"):
            raise ValueError(
                f"as-of join over TIMESTAMP_NTZ requires a UTC session "
                f"(spark.sql.session.timeZone={tz!r}); call "
                "ensure_session_defaults(spark) or pin the conf to 'UTC'"
            )


def _epoch_long(col, dtype):
    """Epoch seconds (numeric ts columns: the raw value) as BIGINT.

    TIMESTAMP_NTZ cannot cast straight to BIGINT in Spark 4.x; route it
    through TIMESTAMP first — callers pin the session to UTC, so the
    naive civil value maps to the UTC epoch.
    """
    if isinstance(dtype, TimestampNTZType):
        return col.cast("timestamp").cast("long")
    return col.cast("long")


def _payload_type(right: DataFrame, right_ts: str, right_cols: list[str]) -> StructType:
    return StructType(
        [StructField("__rts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in right_cols]
    )


def _payload_struct(right_ts: str, right_cols: list[str]):
    return F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )


def _unpack(matched: DataFrame, left_cols: list[str], right_ts: str,
            right_cols: list[str], suffix: str) -> DataFrame:
    p = F.col("__c_p")
    return matched.select(
        *left_cols,
        *[p.getField(c).alias(c + suffix) for c in right_cols],
        p.getField("__rts").alias(right_ts + suffix),
    )


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
    ``right_ts + suffix``. Ties BETWEEN right rows at one instant are
    resolved arbitrarily — keep (key, ts) unique on the right.

    ``tolerance_s`` (pandas ``merge_asof`` semantics): a match farther
    from the left timestamp than this many seconds is treated as
    no-match (all carried columns NULL). Applied as a projection on
    the carried result — the plan shape (one shuffle + local sort)
    doesn't change.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    _require_utc_for_ntz(
        left, left.schema[left_ts].dataType, right.schema[right_ts].dataType
    )
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    ptype = _payload_type(right, right_ts, right_cols)

    # Equi-join NULL semantics (SQL/DuckDB ASOF): NULL never equals
    # NULL, so a NULL-key right row can match NOTHING — drop it before
    # the union, or the NULL window partition hands its payload to
    # NULL-key left rows (review-pass r16, reproduced; left NULL-key
    # rows then correctly carry NULL, since their partition holds no
    # right rows).
    right = right.filter(F.col(on).isNotNull())

    lhs = left.select(
        *left.columns,
        F.lit(1).alias(_SIDE),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(ptype).alias("__p"),
    )
    rhs = right.select(
        *[F.col(c) if c == on else F.lit(None).alias(c) for c in left.columns],
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias("__ts"),
        _payload_struct(right_ts, right_cols).alias("__p"),
    )

    unioned = lhs.unionByName(rhs)
    # Same-instant right rows must be visible to left rows in either
    # direction (<=/>= are inclusive): backward sorts right (side 0)
    # before left (side 1) and carries the LAST earlier row forward;
    # forward sorts left before right and takes the FIRST later row.
    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.select(
            "*", F.last("__p", ignorenulls=True).over(w).alias("__c_p")
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts").asc(), F.col(_SIDE).desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = unioned.select(
            "*", F.first("__p", ignorenulls=True).over(w).alias("__c_p")
        )
    matched = carried.filter(F.col(_SIDE) == 1)
    if tolerance_s is not None:
        delta = _epoch_long(
            F.col(left_ts), left.schema[left_ts].dataType
        ) - _epoch_long(
            F.col("__c_p").getField("__rts"), right.schema[right_ts].dataType
        )
        if direction == "forward":
            delta = -delta
        matched = matched.select(
            *left.columns,
            F.when(delta <= F.lit(tolerance_s), F.col("__c_p")).alias("__c_p"),
        )
    return _unpack(matched, left.columns, right_ts, right_cols, suffix)


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
    """Backward :func:`asof_join` with HOT-KEY SKEW protection:
    identical semantics, but the carry window partitions on
    (key, time-bucket) instead of key, so one hot key's rows spread
    over its time range instead of landing in a single straggler
    partition. ``on``, ``left_ts``, ``right_ts`` must be plain column
    names (bucketing builds SQL expressions from them).

    Two-pass construction:
      1. per (key, bucket): the LATEST right row (max over an orderable
         struct headed by the timestamp) — one aggregation of the right
         side on (key, bucket);
      2. a per-key running max over bucket order turns those into SEED
         rows: "latest right row from any earlier bucket". This window
         runs over ONE row per (key, bucket) — a hot key contributes at
         most n_buckets rows, so the skewed-window problem cannot recur
         here;
      3. union left + right + seeds, then the usual row-struct carry —
         now partitioned by (key, bucket). Seeds sort first in each
         bucket (side -1 at the bucket start), so continuity across
         bucket boundaries is exact.

    Bucket ids use exact integer floor division (pmod + DIV), never
    double arithmetic — nanosecond-scale epoch longs exceed a double's
    53-bit mantissa and would misbucket rows near bucket boundaries.

    Tie semantics match asof_join (right rows visible to same-instant
    left rows; ties BETWEEN right rows at one instant are resolved
    arbitrarily — keep (key, ts) unique on the right). Choose
    bucket_s ≈ (time span / desired parallelism per hot key); the
    default of one day suits event data spanning weeks.
    """
    _require_utc_for_ntz(
        left, left.schema[left_ts].dataType, right.schema[right_ts].dataType
    )
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    def bkt(col_name: str, dtype):
        # exact integer floor division on the epoch value: pmod is in
        # [0, bucket_s), the difference divides exactly, DIV is integer.
        # TIMESTAMP_NTZ has no direct BIGINT cast — hop through
        # TIMESTAMP (session pinned UTC).
        if isinstance(dtype, TimestampNTZType):
            c = f"CAST(CAST(`{col_name}` AS TIMESTAMP) AS BIGINT)"
        else:
            c = f"CAST(`{col_name}` AS BIGINT)"
        return F.expr(f"({c} - pmod({c}, {bucket_s})) DIV {bucket_s}")

    l_ts_type = left.schema[left_ts].dataType
    r_ts_type = right.schema[right_ts].dataType

    # -- pass 1+2: per-(key,bucket) latest right row -> per-bucket seeds --
    # NULL-key right rows match nothing (equi-join NULL semantics) —
    # same guard as asof_join, or a NULL left row in the SAME bucket as
    # a NULL right row would carry its payload (review-pass r16)
    right = right.filter(F.col(on).isNotNull())
    pay = _payload_struct(right_ts, right_cols)
    rhs_b = right.select(
        F.col(on), F.col(right_ts), *[F.col(c) for c in right_cols]
    ).withColumn("__bkt", bkt(right_ts, r_ts_type))
    bucket_last = rhs_b.groupBy(on, "__bkt").agg(F.max(pay).alias("__p"))

    # right-side buckets come from bucket_last, not rhs_b (r19): the
    # per-(key, bucket) aggregate's group set IS rhs_b's distinct
    # (key, bucket) set, so unioning the already-aggregated frame feeds
    # the distinct exactly the same pairs while skipping a third full
    # re-derivation of the right side (guide §2.3 — aggregate before
    # you shuffle)
    spine = (
        left.select(F.col(on), bkt(left_ts, l_ts_type).alias("__bkt"))
        .union(bucket_last.select(on, "__bkt"))
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

    # -- pass 3: bucketed union + row-struct carry (same as asof_join) --
    ptype = _payload_type(right, right_ts, right_cols)
    lhs = left.select(
        *left.columns,
        F.lit(1).alias(_SIDE),
        F.col(left_ts).alias("__ts"),
        bkt(left_ts, l_ts_type).alias("__bkt"),
        F.lit(None).cast(ptype).alias("__p"),
    )
    rhs = rhs_b.select(
        *[F.col(c) if c == on else F.lit(None).alias(c) for c in left.columns],
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias("__ts"),
        "__bkt",
        pay.alias("__p"),
    )
    seed_rows = seeds.select(
        *[F.col(c) if c == on else F.lit(None).alias(c) for c in left.columns],
        F.lit(-1).alias(_SIDE),
        # bucket start, rebuilt in the ts column's own type. Timestamp
        # types (incl. NTZ, which has no BIGINT<->NTZ cast) go through
        # timestamp_seconds on the epoch; integer ts types cast plainly.
        (
            F.timestamp_seconds(F.col("__bkt") * bucket_s).cast(l_ts_type)
            if isinstance(l_ts_type, (TimestampType, TimestampNTZType))
            else (F.col("__bkt") * bucket_s).cast(l_ts_type)
        ).alias("__ts"),
        "__bkt",
        F.col("__seed").alias("__p"),
    )

    unioned = lhs.unionByName(rhs).unionByName(seed_rows)
    w = (
        Window.partitionBy(on, "__bkt")
        .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__p", ignorenulls=True).over(w).alias("__c_p")
    )
    matched = carried.filter(F.col(_SIDE) == 1)
    if tolerance_s is not None:
        delta = _epoch_long(F.col(left_ts), l_ts_type) - _epoch_long(
            F.col("__c_p").getField("__rts"), r_ts_type
        )
        matched = matched.select(
            *left.columns,
            F.when(delta <= F.lit(tolerance_s), F.col("__c_p")).alias("__c_p"),
        )
    return _unpack(matched, left.columns, right_ts, right_cols, suffix)
