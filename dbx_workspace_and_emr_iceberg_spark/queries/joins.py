"""J1-J9: join inventory (SURVEY.md §2.3).

Scale posture per query:
  * dims (region/nation/supplier/part at any SF, and customer at most)
    are broadcast — no shuffle of the fact table on dim joins (J5/J9);
  * large-large equi joins shuffle both sides on the key and AQE picks
    sort-merge vs shuffled-hash and splits skewed partitions (J6);
  * non-equi joins (J7) are broadcast-nested-loop — only sane when one
    side is tiny, which is exactly how the query is shaped;
  * the as-of join (J8) is the custom linear-cost operator from
    operators/asof.py, oracled against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..registry import register
from ..tables import load_table

# --- J1: inner equi-join ----------------------------------------------------

_J1_ORACLE = """
SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


@register("j1_inner_equi", oracle=_J1_ORACLE, tags=("J1",))
def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
        .orderBy("n_name")
    )


# --- J2: left / right / full outer -----------------------------------------

_J2_ORACLE = """
SELECT
  c.c_custkey,
  count(o.o_orderkey)                              AS n_orders,
  round(coalesce(sum(o.o_totalprice), 0), 2)       AS spend
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 320000) o
  ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
ORDER BY c.c_custkey
"""


@register("j2_left_outer", oracle=_J2_ORACLE, tags=("J2",))
def j2_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer rollup against the HIGH-VALUE order subset
    (review-pass r17, reproduced: every fixture customer has at least
    one order, so the unfiltered right side never null-extended —
    count-over-NULLs and the coalesce fallback were dead branches and
    the gate was inner-join-equivalent. The j3 filter leaves ~40
    customers with zero matches at sf0.01, so n_orders=0 / spend=0
    rows are live at every scale)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 320000
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(
            F.count(o.o_orderkey).alias("n_orders"),
            F.round(F.coalesce(F.sum(o.o_totalprice), F.lit(0)), 2).alias("spend"),
        )
        .orderBy("c_custkey")
    )


_J2B_ORACLE = """
SELECT
  coalesce(s.s_suppkey, -1)                        AS suppkey,
  coalesce(n.n_name, 'NONE')                       AS nation_name
FROM (SELECT * FROM supplier WHERE s_nationkey <> 5) s
FULL JOIN (SELECT * FROM nation WHERE n_nationkey < 20) n
  ON s.s_nationkey = n.n_nationkey
ORDER BY suppkey, nation_name
"""


@register("j2b_full_outer", oracle=_J2B_ORACLE, tags=("J2",))
def j2b_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer with BOTH dangle directions live (review-pass r17,
    reproduced: unfiltered, every supplier matched a nation and every
    nation a supplier, so neither -1 nor 'NONE' sentinel ever appeared
    — an engine planning this as an inner join would have hashed
    identically). Filtering suppliers off nation 5 makes that nation
    null-extend (suppkey -1), and dropping nations >= 20 makes their
    suppliers null-extend (nation 'NONE') — structural at every sf."""
    s = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") != 5
    )
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20)
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "full")
        .select(
            F.coalesce(s.s_suppkey, F.lit(-1)).alias("suppkey"),
            F.coalesce(n.n_name, F.lit("NONE")).alias("nation_name"),
        )
        .orderBy("suppkey", "nation_name")
    )


# --- J3: left semi / left anti (EXISTS / NOT EXISTS) ------------------------

_J3_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 320000)
ORDER BY c_custkey
"""


@register("j3_semi", oracle=_J3_ORACLE, tags=("J3",))
def j3_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 320000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


_J3B_ORACLE = """
SELECT c_custkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 320000)
ORDER BY c_custkey
"""


@register("j3b_anti", oracle=_J3B_ORACLE, tags=("J3",))
def j3b_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join against the HIGH-VALUE order subset — j3's exact
    complement, so the two results partition the customer set
    (review-pass r17, reproduced: the old unfiltered right side
    matched every customer — every sf0.01 customer has at least one
    order — so the anti result was EMPTY and the hash gate compared
    two empty sets; a left_anti regression could never red it). With
    the j3 filter, the anti side returns the 40 sf0.01 customers with
    no high-value order — a non-empty result that actually exercises
    the not-matched semantics, and j3 ∪ j3b = customer exactly."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 320000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --- J4: cross join ---------------------------------------------------------

_J4_ORACLE = """
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
ORDER BY r.r_name, n.n_name
"""


@register("j4_cross", oracle=_J4_ORACLE, tags=("J4",))
def j4_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


# --- J5/J6: explicit strategy hints (same semantics as planner default) ----

_J5_ORACLE = """
SELECT p_brand, count(*) AS n_lines, round(sum(l_extendedprice), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


@register("j5_broadcast", oracle=_J5_ORACLE, tags=("J5",))
def j5_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact × dim with the dim explicitly broadcast: the lineitem side is
    never shuffled — the only exchange is the tiny post-agg one."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("p_brand")
    )


_J6_ORACLE = """
SELECT o.o_orderkey, round(o.o_totalprice, 2) AS total, cast(count(l.l_linenumber) AS BIGINT) AS n_lines
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_totalprice > 400000
GROUP BY o.o_orderkey, o.o_totalprice
ORDER BY o.o_orderkey
"""


@register("j6_sortmerge", oracle=_J6_ORACLE, tags=("J6",))
def j6_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi join forced to sort-merge (MERGE hint): both sides
    shuffle on orderkey; AQE handles skew splitting at scale."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.hint("MERGE")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(o.o_orderkey, o.o_totalprice)
        .agg(F.count(li.l_linenumber).alias("n_lines"))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            F.col("n_lines"),
        )
        .orderBy("o_orderkey")
    )


# --- J7: theta / non-equi range join ---------------------------------------

_J7_ORACLE = """
WITH bands(band, lo, hi) AS (
  VALUES ('small', 0.0, 100000.0),
         ('mid', 100000.0, 300000.0),
         ('large', 300000.0, 100000000.0)
)
SELECT b.band, count(*) AS n_orders
FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
ORDER BY b.band
"""


@register("j7_theta_range", oracle=_J7_ORACLE, tags=("J7",))
def j7_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join → broadcast-nested-loop; sane because the band table
    is 3 rows. A large-large range join should instead be bucketized
    (map each row to overlapping band ids → equi join) — see asof.py for
    the same linearization idea."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("large", 300000.0, 100000000.0)],
        "band string, lo double, hi double",
    )
    cond = (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi)
    return (
        o.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("band")
    )


# --- J8: as-of join (custom operator; DuckDB native ASOF as oracle) --------

_J8_ORACLE = """
SELECT
  p.event_id,
  p.user_id,
  p.ts,
  c.ts      AS click_ts,
  round(c.value, 4) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


@register("j8_asof", oracle=_J8_ORACLE, tags=("J8",))
def j8_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest click at-or-before each purchase, per user."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["value"],
        suffix="_click",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_click").alias("click_ts"),
        F.round("value_click", 4).alias("click_value"),
    ).orderBy("event_id")


# --- J9: multi-way star join (TPC-H Q5 shape) ------------------------------

_J9_ORACLE = """
SELECT
  n_name,
  round(cast(sum(cast(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("j9_star_multiway", oracle=_J9_ORACLE, tags=("J9",))
def j9_star_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            # decimal-hop sum (review-pass r17, j16's rule + the q5
            # oracle spelling): the raw double sum of 4-decimal-quanta
            # products accumulates in engine-dependent order, and a
            # group whose exact revenue lands on a .xx5 half-boundary
            # would round differently per engine — at sf0.01 two group
            # tails already sit one ten-thousandth from the boundary.
            # The per-row product double is identical cross-engine; the
            # decimal(18,4) sum of it is exact and order-free.
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ).cast("double"),
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --- J8b: as-of join with a match tolerance (merge_asof semantics) ---------

_J8B_ORACLE = """
SELECT
  p.event_id,
  p.user_id,
  p.ts,
  CASE WHEN date_diff('second', c.ts, p.ts) <= 3600 THEN c.ts END
    AS click_ts,
  CASE WHEN date_diff('second', c.ts, p.ts) <= 3600 THEN round(c.value, 4) END
    AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


@register("j8b_asof_tolerance", oracle=_J8B_ORACLE, tags=("J8",))
def j8b_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 1-hour staleness bound: a click older than
    3600 s no longer explains the purchase (pandas merge_asof
    `tolerance`). The oracle nulls out beyond-tolerance matches of
    DuckDB's native ASOF — semantics identical, plan still one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["value"],
        suffix="_click",
        tolerance_s=3600,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_click").alias("click_ts"),
        F.round("value_click", 4).alias("click_value"),
    ).orderBy("event_id")


@register("j8c_asof_bucketed", oracle=_J8_ORACLE, tags=("J8", "X6"))
def j8c_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j8 through the HOT-KEY-SKEW-PROOF as-of variant: the carry window
    partitions on (user, day-bucket) instead of user, with per-bucket
    seed rows carrying the last pre-bucket click — identical answer
    (same DuckDB ASOF oracle as j8), skew-safe plan shape at 100 TB."""
    from ..operators.asof import asof_join_bucketed

    # cache the projected events frame (r20, VERDICT r19 #9): the
    # bucketed as-of consumes the left side twice (spine + carry
    # union) and the right side twice (bucket_last + carry union), so
    # the uncached plan scanned events four times.  One narrow
    # projection cached, four cheap cache reads; pin cleared by the
    # harness clearCache.
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value", "event_type"
    ).cache()
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join_bucketed(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["value"],
        suffix="_click",
        bucket_s=86_400,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_click").alias("click_ts"),
        F.round("value_click", 4).alias("click_value"),
    ).orderBy("event_id")


# --- J7b: binned range join (large-large scale path) -----------------------

_J7B_ORACLE = """
WITH iv AS (
  SELECT event_id AS iv_id, epoch_us(ts) AS lo, epoch_us(ts) + 21600000000 AS hi
  FROM events WHERE event_type = 'click' AND user_id % 10 = 0
),
pts AS (
  SELECT event_id, epoch_us(ts) AS p
  FROM events WHERE event_type = 'purchase' AND user_id % 10 = 1
)
SELECT pts.event_id, iv.iv_id
FROM pts JOIN iv ON pts.p >= iv.lo AND pts.p < iv.hi
ORDER BY event_id, iv_id
"""


@register("j7b_range_binned", oracle=_J7B_ORACLE, tags=("J7", "X6"))
def j7b_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large point-in-interval join through the BINNED equi-join
    path (operators/range_join.py): purchases joined to every 6-hour
    promo window (click ts + 6h) that contains them. Same answer as the
    nested-loop formulation the oracle runs — but the plan is a plain
    equi join on the bin id (no BroadcastNestedLoopJoin / cartesian;
    asserted in test_plans), so it survives two 100 TB inputs."""
    from ..operators.range_join import range_join_binned

    ev = load_table(spark, sf_dir, "events")
    # unix_micros requires TIMESTAMP; events.ts is TIMESTAMP_NTZ. The
    # session is pinned to UTC (ensure_session_defaults), so the cast
    # maps the naive value to the same epoch DuckDB's epoch_us sees.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.filter(
        (F.col("event_type") == "click") & (F.col("user_id") % 10 == 0)
    ).select(
        F.col("event_id").alias("iv_id"),
        ts_us.alias("lo"),
        (ts_us + 21_600_000_000).alias("hi"),
    )
    pts = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 10 == 1)
    ).select("event_id", ts_us.alias("p"))
    joined = range_join_binned(
        pts,
        iv,
        point="p",
        lo="lo",
        hi="hi",
        bin_width=21_600_000_000,
        hi_inclusive=False,
    )
    return joined.select("event_id", "iv_id").orderBy("event_id", "iv_id")


# --- J8d: forward as-of (next-event attribution) ---------------------------

_J8D_ORACLE = """
SELECT
  c.event_id,
  c.user_id,
  c.ts,
  p.ts AS next_purchase_ts,
  round(p.value, 4) AS next_purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY c.event_id
"""


@register("j8d_asof_forward", oracle=_J8D_ORACLE, tags=("J8",))
def j8d_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each click attributed to the user's next purchase
    at-or-after it (conversion attribution). Same single-shuffle
    union+window plan as the backward operator, with the carry running
    from the future side (first ignorenulls over currentRow..following).
    Oracle: DuckDB native forward ASOF (`c.ts <= p.ts`)."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_right").alias("next_purchase_ts"),
        F.round("value_right", 4).alias("next_purchase_value"),
    ).orderBy("event_id")


# --- J11: null-safe equi-join (<=> / IS NOT DISTINCT FROM) ------------------

_J11_ORACLE = """
WITH a AS (SELECT nullif(c_nationkey, 3) AS k FROM customer),
     b AS (SELECT nullif(s_nationkey, 3) AS k FROM supplier)
SELECT coalesce(a.k, -1) AS k_norm, CAST(count(*) AS BIGINT) AS n_pairs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY 1
ORDER BY 1
"""


@register("j11_nullsafe_join", oracle=_J11_ORACLE, tags=("J1",))
def j11_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eqNullSafe: NULL keys MATCH each other (plain equi-join drops
    them). Still hash-joinable — Spark plans <=> as a normal equi-join
    key, so the scale shape is identical to j1; the semantic difference
    is only in the key comparison. Output rolled up per key so the
    NULL-match group is visible and bounded."""
    c = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(3)).alias("ka")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey"), F.lit(3)).alias("kb")
    )
    return (
        c.join(s, c["ka"].eqNullSafe(s["kb"]))
        .groupBy(F.coalesce(F.col("ka"), F.lit(-1)).alias("k_norm"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("k_norm")
    )


# --- J12: LATERAL correlated subquery join (SPARK-34382) --------------------
# Per-nation top-2 customers by balance as a correlated LATERAL subquery
# — the SQL-standard spelling of w4's topn-per-group. Catalyst rewrites
# the correlated LIMIT into a ranked window over the join, so the
# physical shape is one shuffle on the correlation key, not N
# re-executions of the inner query — the property that makes LATERAL
# usable at 100 TB (the naive per-row re-scan would be quadratic).

_J12_ORACLE = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
"""


@register("j12_lateral", oracle=_J12_ORACLE, tags=("J12", "W4"))
def j12_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_j12")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_j12")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation_j12 n JOIN LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_j12 c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
        """
    )


# --- J13: runtime bloom-filter join pruning (SPARK-32268) -------------------
# On a 100 TB shuffle join with a selective dim-side predicate, Catalyst
# injects a bloom_filter_agg over the small side's join keys and a
# might_contain() filter on the FACT side scan — rows that cannot join
# are dropped BEFORE the shuffle, often the single biggest IO win on a
# star join too large to broadcast. Locally the size thresholds that
# gate injection are never met, so the query pins them (and disables
# broadcast) just long enough to prove the rewrite fires, asserts
# might_contain/bloom_filter_agg in the optimized plan, and hash-checks
# the result against the plain join oracle — the filter must be a pure
# no-false-negative optimization.

_J13_ORACLE = """
SELECT
  o.o_orderpriority,
  CAST(count(*) AS BIGINT)          AS n_lines,
  round(sum(l.l_extendedprice), 2)  AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

_J13_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@register("j13_bloom_runtime_filter", oracle=_J13_ORACLE, tags=("J13", "J6"))
def j13_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    saved = {k: spark.conf.get(k, None) for k in _J13_CONFS}
    for k, v in _J13_CONFS.items():
        spark.conf.set(k, v)
    try:
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        res = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            )
            .orderBy("o_orderpriority")
        )
        plan = res._jdf.queryExecution().optimizedPlan().toString()
        if "might_contain" not in plan or "bloom_filter_agg" not in plan:
            raise AssertionError(
                "runtime bloom filter was not injected into the join plan"
            )
        # pinned-conf materialization — docs/SELF_VERIFICATION.md
        res = spark.createDataFrame(res.collect(), res.schema)
        return res
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --- J14: correlated scalar subquery in the projection ----------------------
# `(SELECT agg FROM … WHERE corr)` per outer row — Catalyst decorrelates
# it into ONE aggregate + left outer join, so the inner table is
# scanned once, not once per outer row (the naive interpretation is
# quadratic; the rewrite is what makes this usable on a 100 TB inner).
# NULL for nations with no customers is part of the contract.

_J14_ORACLE = """
SELECT
  n_name,
  (SELECT round(max(c_acctbal), 2) FROM customer c
   WHERE c.c_nationkey = n.n_nationkey)            AS max_bal,
  (SELECT CAST(count(*) AS BIGINT) FROM customer c
   WHERE c.c_nationkey = n.n_nationkey)            AS n_cust
FROM (SELECT n_nationkey, n_name FROM nation
      UNION ALL
      SELECT n_nationkey + 100, 'Z_PHANTOM_' || n_name
      FROM nation WHERE n_nationkey < 3) n
ORDER BY n_name
"""


@register("j14_scalar_subquery", oracle=_J14_ORACLE, tags=("J14", "J2"))
def j14_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries with the EMPTY-GROUP branch
    structurally live (review-pass r17, reproduced: every nation has
    customers at every sf, so the decorrelation's empty-group
    semantics — max() must yield NULL, count() must yield 0, the
    classic COUNT bug — were never exercised). Three phantom nations
    (offset keys, no customers at ANY scale) pin max_bal=NULL with
    n_cust=0 in the hashed output; real nations are unchanged."""
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    phantom = nat.filter(F.col("n_nationkey") < 3).select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"),
        F.concat(F.lit("Z_PHANTOM_"), F.col("n_name")).alias("n_name"),
    )
    # localCheckpoint materializes the 28-row extended outer side as a
    # LEAF relation: Spark 4.1's scalar-subquery decorrelation dies
    # with `key not found: c_nationkey#N` when the outer correlation
    # attribute flows through a Union (found r17 while making the
    # phantom branch live — the checkpoint sidesteps the optimizer
    # limitation without changing semantics; 28 rows, eager, trivial)
    nat.unionByName(phantom).localCheckpoint().createOrReplaceTempView(
        "nation_j14"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_j14"
    )
    return spark.sql(
        """
        SELECT
          n_name,
          (SELECT round(max(c_acctbal), 2) FROM customer_j14 c
           WHERE c.c_nationkey = n.n_nationkey)    AS max_bal,
          (SELECT count(*) FROM customer_j14 c
           WHERE c.c_nationkey = n.n_nationkey)    AS n_cust
        FROM nation_j14 n
        ORDER BY n_name
        """
    )


# --- J15: dynamic partition pruning (SPARK-11150) ---------------------------
# The star-schema scan killer: the fact side is partitioned on the join
# key, the dim side's filter is only knowable at RUNTIME (it lives in
# another table), so Catalyst injects a dynamicpruning subquery that
# broadcasts the surviving dim keys and prunes fact PARTITIONS before
# the scan. On a 100 TB date-partitioned fact joined to a filtered date
# dim this routinely cuts the scan by 10-100x. The dim must be
# independently materialized — derived inline, constant folding turns
# the prune static and DPP never exercises (measured here). Plan
# asserted for the dynamicpruning subquery; values hash-oracled.

_J15_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS INT)   AS order_year,
  CAST(count(*) AS BIGINT)         AS n_orders,
  round(sum(o_totalprice), 2)      AS total
FROM orders
WHERE year(o_orderdate) < 1998
GROUP BY 1
ORDER BY 1
"""


@register("j15_dynamic_partition_pruning", oracle=_J15_ORACLE, tags=("J15", "P3", "J5"))
def j15_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    root = tempfile.mkdtemp(prefix="dpp_")
    try:
        return _j15_body(spark, sf_dir, root)
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


def _j15_body(spark: SparkSession, sf_dir: str, root: str) -> DataFrame:
    import os

    fact_path = os.path.join(root, "fact")
    dim_path = os.path.join(root, "dim")
    o = load_table(spark, sf_dir, "orders")
    o.withColumn("order_year", F.year("o_orderdate")).write.mode(
        "overwrite"
    ).partitionBy("order_year").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    fact.select("order_year").distinct().withColumn(
        "era", F.when(F.col("order_year") < 1998, "old").otherwise("new")
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("era") == "old")

    res = (
        fact.join(F.broadcast(dim), "order_year")
        .groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("order_year")
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruning" not in plan.lower():
        raise AssertionError(
            "dynamic partition pruning subquery missing from the fact scan"
        )
    # pinned-conf materialization (here pinned temp DIRS, same hazard):
    # docs/SELF_VERIFICATION.md; output is <= #years
    return spark.createDataFrame(res.collect(), res.schema)


# --- J16: join strategy hints (MERGE / SHUFFLE_HASH / BROADCAST) ------------
# At 100 TB you sometimes know better than the cost model: a dim that
# AQE mis-sizes, a sort already paid upstream, a hash side you know
# fits. Hints are the escape hatch; this query proves each one is
# HONORED (plan-asserted physical operator per hint) and that strategy
# choice never changes the answer (all three hash-match the oracle).

_J16_ORACLE = """
SELECT
  n_name,
  CAST(count(*) AS BIGINT)   AS n_suppliers,
  CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


@register("j16_join_hints", oracle=_J16_ORACLE, tags=("J16", "J5", "J6"))
def j16_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    def joined(hint: str) -> DataFrame:
        return (
            s.join(n.hint(hint), s["s_nationkey"] == n["n_nationkey"])
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n_suppliers"),
                # decimal-hop sum: different join strategies feed the
                # aggregate in different row orders; double sums drift
                # a ulp and the cross-strategy exceptAll would flake
                F.round(
                    F.sum(F.col("s_acctbal").cast("decimal(18,6)")), 2
                )
                .cast("double")
                .alias("total_bal"),
            )
            .orderBy("n_name")
        )

    expect = {
        "merge": "SortMergeJoin",
        "shuffle_hash": "ShuffledHashJoin",
        "broadcast": "BroadcastHashJoin",
    }
    results = {}
    for hint, node in expect.items():
        df = joined(hint)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if node not in plan:
            raise AssertionError(f"hint {hint!r} not honored: no {node}")
        results[hint] = df
    # strategies must agree: merge vs the other two, distributed compare
    for other in ("shuffle_hash", "broadcast"):
        diff = (
            results["merge"].exceptAll(results[other]).count()
            + results[other].exceptAll(results["merge"]).count()
        )
        if diff:
            raise AssertionError(f"{other} result differs from merge by {diff}")
    return results["merge"]
