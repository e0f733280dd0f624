"""W1-W4: window functions (SURVEY.md §2.5).

A window over PARTITION BY k is one shuffle on k plus a partition-local
sort — same cost shape at any scale provided no single key dominates
(per-user event windows are fine; a global window with no PARTITION BY
is a single-partition bottleneck — w5's ntile over the per-customer
rollup is the one deliberate exception, with its scale-out substitute
documented in its docstring).

Determinism: ranking windows that must be unique (row_number, ntile,
lag/lead/nth) order by a key-complete column list; rank/dense_rank/
percent_rank/cume_dist are exercised on tie-ful orderings since their
outputs are tie-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# --- W1: ranking family ----------------------------------------------------

_W1_ORACLE = """
SELECT
  p_partkey,
  p_brand,
  p_size,
  row_number()   OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey)   AS rn,
  rank()         OVER (PARTITION BY p_brand ORDER BY p_size)              AS rnk,
  dense_rank()   OVER (PARTITION BY p_brand ORDER BY p_size)              AS drnk,
  round(percent_rank() OVER (PARTITION BY p_brand ORDER BY p_size), 6)    AS prnk,
  round(cume_dist()    OVER (PARTITION BY p_brand ORDER BY p_size), 6)    AS cdist,
  ntile(4)       OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey)   AS quartile
FROM part
ORDER BY p_brand, rn
"""


@register("w1_ranking", oracle=_W1_ORACLE, tags=("W1",))
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The W1 SEMANTICS row: all six SQL ranking functions in one
    window pass, value-matched against DuckDB.

    Scale note (r10 verdict #7): p_brand is a ~25-value key, so this
    per-brand full-granularity window is the exact shape the repo's
    rule bans on big fact tables — fine here because `part` is a DIM
    table (bounded per-brand cardinality), wrong for a fact-side
    score. The 100 TB respells are w5b (distributed ntile via chunked
    global rank), qd8/chunked_discrete_percentiles (per-key discrete
    quantiles), and chunked_percent_ranks (operators/skew.py) for
    percent_rank/cume_dist on skewed low-cardinality keys."""
    p = load_table(spark, sf_dir, "part")
    unique = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    ties = Window.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.row_number().over(unique).alias("rn"),
        F.rank().over(ties).alias("rnk"),
        F.dense_rank().over(ties).alias("drnk"),
        F.round(F.percent_rank().over(ties), 6).alias("prnk"),
        F.round(F.cume_dist().over(ties), 6).alias("cdist"),
        F.ntile(4).over(unique).alias("quartile"),
    ).orderBy("p_brand", "rn")


# --- W2: offset / analytic family ------------------------------------------

_W2_ORACLE = """
SELECT
  event_id,
  user_id,
  ts,
  lag(event_type)     OVER w                                  AS prev_type,
  lead(event_type)    OVER w                                  AS next_type,
  first_value(ts)     OVER w                                  AS first_ts,
  last_value(ts)      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS last_ts,
  nth_value(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS second_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
"""


@register("w2_offset_analytic", oracle=_W2_ORACLE, tags=("W2",))
def w2_offset_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("ts").over(w).alias("first_ts"),
        F.last("ts").over(wfull).alias("last_ts"),
        F.nth_value("event_type", 2).over(wfull).alias("second_type"),
    ).orderBy("user_id", "ts", "event_id")


# --- W3: windowed aggregates with ROWS / RANGE frames ----------------------

# Window sums accumulate in engine-specific order (DuckDB uses segment
# trees for sliding frames), so double sums differ in the last ulp and
# round() flaps at .xx5 boundaries. Summing DECIMAL(18,2) is exact in
# both engines → identical doubles after the cast, deterministic hash.
_W3_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  round(cast(sum(cast(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_spend,
  round(cast(sum(cast(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        / (count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)), 4)            AS moving_avg3,
  cast(count(*) OVER (PARTITION BY o_custkey ORDER BY cast(o_orderkey AS BIGINT)
                      RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT)       AS n_near_keys
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@register("w3_frames", oracle=_W3_ORACLE, tags=("W3",))
def w3_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = seq.rowsBetween(-2, Window.currentRow)
    near = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderkey").cast("bigint"))
        .rangeBetween(-100, Window.currentRow)
    )
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec).over(running).cast("double"), 2).alias("running_spend"),
        F.round(
            F.sum(dec).over(moving).cast("double")
            / F.count(F.lit(1)).over(moving),
            4,
        ).alias("moving_avg3"),
        F.count(F.lit(1)).over(near).alias("n_near_keys"),
    ).orderBy("o_custkey", "o_orderkey")


# --- W4: top-N per group ---------------------------------------------------

_W4_ORACLE = """
SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS bal, rn FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
WHERE rn <= 3
ORDER BY c_mktsegment, rn
"""


@register("w4_topn_per_group", oracle=_W4_ORACLE, tags=("W4",))
def w4_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank-then-filter; Spark ≥3.5 plans this as a WindowGroupLimit
    (top-k per partition pushed below the shuffle), so only 3 rows per
    group per map task cross the wire at scale."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("bal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


# --- W5: ntile deciles ------------------------------------------------------

_W5_ORACLE = """
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, spend,
         ntile(10) OVER (ORDER BY spend, o_custkey) AS decile
  FROM spend
)
SELECT decile,
       count(*) AS n_customers,
       round(min(spend), 2) AS min_spend,
       round(max(spend), 2) AS max_spend
FROM tiled GROUP BY decile ORDER BY decile
"""


@register("w5_ntile_deciles", oracle=_W5_ORACLE, tags=("W1",))
def w5_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-spend deciles via ntile(10) — the bucketing window W1's
    rank/dense_rank family doesn't cover. Deterministic tie-break
    (spend, custkey) makes bucket membership engine-independent. One
    shuffle for the per-customer aggregate; ntile needs a single-
    partition sort of the 150k-per-SF customer rollup — the 100 TB
    spelling is w5b_distributed_ntile below: an EXACT two-pass prefix
    rank (chunk-partitioned windows + broadcast offsets) that
    hash-matches native ntile with no single-partition sort."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    w = Window.orderBy("spend", "o_custkey")
    tiled = spend.withColumn("decile", F.ntile(10).over(w))
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("spend"), 2).alias("min_spend"),
            F.round(F.max("spend"), 2).alias("max_spend"),
        )
        .orderBy("decile")
    )


# --- W6: event-time RANGE frame (INTERVAL-bounded window) -------------------
# w3's numeric RANGE frame slides over a value gap; the INTERVAL form
# slides over event TIME — "activity in the trailing hour per user" —
# the canonical rate/velocity feature for sessionized logs. Same scale
# shape as any window: one shuffle on the partition key, frame
# evaluated within sorted partitions; at 100 TB the partition key
# (user) keeps state per-executor and the interval bound keeps the
# frame buffer small regardless of a user's history length.

_W6_ORACLE = """
SELECT
  event_id,
  user_id,
  CAST(count(*) OVER w AS BIGINT)          AS n_trailing_1h,
  round(sum(value) OVER w, 4)              AS v_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


@register("w6_interval_range_frame", oracle=_W6_ORACLE, tags=("W6", "W3"))
def w6_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_w6")
    return spark.sql(
        """
        SELECT
          event_id,
          user_id,
          CAST(count(*) OVER w AS BIGINT)  AS n_trailing_1h,
          round(sum(value) OVER w, 4)      AS v_trailing_1h
        FROM events_w6
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id
        """
    )


# --- W7: IGNORE NULLS forward fill ------------------------------------------
# The gap-fill idiom for sparse telemetry: carry the last OBSERVED
# value forward — last_value(x) IGNORE NULLS over an unbounded-
# preceding frame. Nulls are planted deterministically (value hidden
# where event_id % 3 != 0) so both engines fill the identical gaps.
# Same scale shape as any user-partitioned window: one shuffle on
# user_id, frame state is one value per row.

_W7_ORACLE = """
WITH sparse AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 3 = 0 THEN round(value, 4) END AS v
  FROM events
)
SELECT
  event_id,
  user_id,
  v,
  last_value(v IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)  AS v_filled
FROM sparse
ORDER BY event_id
"""


@register("w7_ignore_nulls_fill", oracle=_W7_ORACLE, tags=("W7", "W2"))
def w7_ignore_nulls_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 3 == 0, F.round("value", 4)).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sparse.select(
        "event_id",
        "user_id",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    ).orderBy("event_id")
# --- W5b: EXACT distributed NTILE (two-pass prefix rank) --------------------

_W5B_ORACLE = """
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, spend,
         ntile(10) OVER (ORDER BY spend, o_custkey) AS decile
  FROM spend
)
SELECT CAST(decile AS INTEGER) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(min(spend), 2) AS min_spend,
       round(max(spend), 2) AS max_spend
FROM tiled GROUP BY decile ORDER BY decile
"""


@register("w5b_distributed_ntile", oracle=_W5B_ORACLE, tags=("W5", "X6"))
def w5b_distributed_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w5's documented 100 TB alternative, made EXACT and proven: global
    NTILE without a single-partition sort. Two-pass prefix rank (the
    x23 pattern): chunk rows by sampled spend boundaries (chunk order
    consistent with the (spend, custkey) total order), row_number
    within chunks in parallel, add broadcast per-chunk offsets for the
    GLOBAL rank, then apply ntile's exact bucket arithmetic
    (first n%k buckets get one extra row). Values hash-match DuckDB's
    native ntile; the plan is asserted free of unpartitioned windows.
    """
    o = load_table(spark, sf_dir, "orders")
    # cache: spend feeds THREE actions (the count below, approxQuantile,
    # the sizes collect) plus the returned plan — uncached, each action
    # re-ran the full orders scan+aggregate (review-pass r17). Pin
    # cleared by the harness (bench.py / driver_sim clearCache).
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    ).cache()
    # chunk count DERIVED from the data, not hardcoded (review-pass
    # r17): a fixed 8 meant each chunk-local sort was one task of n/8
    # rows forever — ~1.9B rows/task at 15B customers, the very
    # single-partition chokepoint this query exists to eliminate, and
    # invisible to assert_no_unpartitioned_window (which checks the
    # partition clause exists, not its cardinality). ~1M rows per
    # chunk-sort task, floor 8, driver-side offset table capped at
    # 4096 rows.
    n_cust = spend.count()
    n_chunks = max(8, min(4096, -(-n_cust // 1_000_000)))
    # approx quantiles are FINE for chunking (only balance is
    # approximate, never correctness); error scaled to the chunk width,
    # but floored at 1e-3 once chunks number in the hundreds (ADVICE
    # r17: err=1e-4 over thousands of probabilities is an expensive
    # driver-coordinated pass, and err only skews chunk SIZES)
    err = max(
        1e-3 if n_chunks > 256 else 1e-4,
        min(0.01, 1.0 / (4 * n_chunks)),
    )
    bounds = sorted(set(
        spend.approxQuantile(
            "spend", [i / n_chunks for i in range(1, n_chunks)], err
        )
    ))
    if len(bounds) <= 64:
        # few boundaries: inline them — one JVM fold per row, no join
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        chunked = spend.withColumn(
            "chunk",
            F.aggregate(
                barr,
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col("spend") >= b, 1).otherwise(0),
            ),
        )
    else:
        # ADVICE r17: at the 4096-chunk ceiling an F.array of 4095
        # literals bloats the plan (serialized with every task) — ship
        # the boundary intervals as a broadcast table and range-join
        # instead.  chunk i covers [bounds[i-1], bounds[i]) with open
        # outer edges, identical to the fold's >=-count.
        ivals = [
            (
                i,
                float(bounds[i - 1]) if i > 0 else None,
                float(bounds[i]) if i < len(bounds) else None,
            )
            for i in range(len(bounds) + 1)
        ]
        bdf = spark.createDataFrame(ivals, "chunk int, lo double, hi double")
        cond = (
            F.col("lo").isNull() | (F.col("spend") >= F.col("lo"))
        ) & (F.col("hi").isNull() | (F.col("spend") < F.col("hi")))
        chunked = spend.join(F.broadcast(bdf), cond)
    w_loc = Window.partitionBy("chunk").orderBy("spend", "o_custkey")
    local = chunked.withColumn("lrn", F.row_number().over(w_loc))
    sizes = (
        chunked.groupBy("chunk").agg(F.count(F.lit(1)).alias("c")).collect()
    )  # <= n_chunks rows — bounded collect
    off, acc, n_total = {}, 0, 0
    for r in sorted(sizes, key=lambda r: r.chunk):
        off[int(r.chunk)] = acc
        acc += int(r.c)
    n_total = acc
    offsets = spark.createDataFrame(
        [(c, o_) for c, o_ in off.items()], "chunk int, off long"
    )
    k = 10
    q, rem = divmod(n_total, k)
    ranked = local.join(F.broadcast(offsets), "chunk").withColumn(
        "rank", F.col("lrn") + F.col("off")
    )
    # exact ntile arithmetic: first `rem` buckets hold q+1 rows
    big_span = rem * (q + 1)
    decile = (
        F.when(
            F.col("rank") <= big_span,
            F.floor((F.col("rank") - 1) / (q + 1)) + 1,
        )
        .otherwise(rem + F.floor((F.col("rank") - 1 - big_span) / q) + 1)
        .cast("int")
    )
    tiled = ranked.withColumn("decile", decile)
    from ..plans.explain import assert_no_unpartitioned_window

    assert_no_unpartitioned_window(tiled, "w5b")
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("spend"), 2).alias("min_spend"),
            F.round(F.max("spend"), 2).alias("max_spend"),
        )
        .orderBy("decile")
    )
