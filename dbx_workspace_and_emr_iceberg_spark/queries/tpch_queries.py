"""TPC-H-shape analytics queries adapted to the fixture star schema
(SURVEY.md §2.3 J9 / §7 phase 2 — the canonical workload of Spark SQL +
Trino over Iceberg, the engines the reference provisions; main.tf:761).

Fixture deltas from real TPC-H: dates are TIMESTAMP, lineitem lacks
commit/receipt dates (lateness ≈ shipdate vs orderdate), part lacks
container/mfgr. Query shapes and plan disciplines are preserved:
selective filters pushed to scans, dims broadcast, single-shuffle aggs,
rank-limited output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# --- Q3: shipping priority (top unshipped-revenue orders) -------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST((2 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 100)
       // 200 AS DOUBLE) / 100.0 AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("J9", "A1", "O2"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    # integer-exact revenue (review-pass r18, the d2/qd4 rule applied
    # to q1's siblings): 18 q3 groups at sf0.01 already sit on true
    # .xx50 scale-4 half-ties (best-ranked #50 — one regen from the
    # hashed top-10), where Spark's shortest-repr HALF_UP and DuckDB's
    # binary round split.  decimal(38,0) sum: order-free, no int64
    # overflow at any SF.  NO customer broadcast (same pass): customer
    # is user-cardinality (~TBs at 100 TB) — the explicit hint would
    # hard-abort at Spark's broadcast cap instead of planning the
    # shuffle join; at fixture scale AQE broadcasts it on its own.
    rev4 = F.sum(
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).cast("decimal(38,0)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev4.alias("s4"))
        .select(
            "l_orderkey",
            F.expr(
                "CAST((2 * s4 + 100) div 200 AS DOUBLE) / 100.0"
            ).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- Q4: order priority checking (EXISTS; lateness = shipped after order) --

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_ORACLE, tags=("J3", "A1"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q6: forecasting revenue change (pure scan-filter-agg) -----------------

_Q6_ORACLE = """
SELECT CAST((2 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 100) AS BIGINT)) + 100)
            // 200 AS DOUBLE) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("P2", "A2"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        # integer-exact (r18, the q1 rule): scale-4 decimal sum +
        # half-up bigint div — order-free and tie-proof
        F.sum(
            (
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * F.round(F.col("l_discount") * 100).cast("long")
            ).cast("decimal(38,0)")
        ).alias("s4")
    ).select(
        F.expr("CAST((2 * s4 + 100) div 200 AS DOUBLE) / 100.0").alias(
            "revenue"
        )
    )


# --- Q10: returned item reporting ------------------------------------------

_Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  CAST((2 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 100)
       // 200 AS DOUBLE) / 100.0 AS revenue,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE, tags=("J9", "O2"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # integer-exact (r18, the q1 rule) — the revenue that ranks
            # the hashed top-20 must not depend on float merge order
            F.sum(
                (
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * (100 - F.round(F.col("l_discount") * 100).cast("long"))
                ).cast("decimal(38,0)")
            ).alias("s4")
        )
        .select(
            "c_custkey",
            "c_name",
            F.expr(
                "CAST((2 * s4 + 100) div 200 AS DOUBLE) / 100.0"
            ).alias("revenue"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- Q12-shape: lateness buckets via conditional aggregation ---------------

_Q12_ORACLE = """
SELECT
  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high' ELSE 'low' END AS prio_class,
  count(*) FILTER (WHERE l_shipdate >  o_orderdate + INTERVAL 90 DAY) AS late_lines,
  count(*) FILTER (WHERE l_shipdate <= o_orderdate + INTERVAL 90 DAY) AS ontime_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
ORDER BY 1
"""


@register("q12_lateness_buckets", oracle=_Q12_ORACLE, tags=("A9", "J6"))
def q12_lateness_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
            )
            .otherwise("low")
            .alias("prio_class")
        )
        .agg(
            F.count(F.when(late, 1)).alias("late_lines"),
            F.count(F.when(~late, 1)).alias("ontime_lines"),
        )
        .orderBy("prio_class")
    )


# --- Q14-shape: promo revenue share ----------------------------------------

_Q14_ORACLE = """
SELECT
  round(100.0 * cast(sum(CASE WHEN p_type LIKE 'STANDARD%'
                         THEN cast(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                         ELSE cast(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        / cast(sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@register("q14_promo_share", oracle=_Q14_ORACLE, tags=("J5", "A2", "P4"))
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    promo = F.when(F.col("p_type").like("STANDARD%"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 4
        ).alias("promo_share_pct")
    )


# --- Q18: large-volume customers (agg-filter-join pipeline) ----------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS total,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
ORDER BY total DESC, o_orderkey
LIMIT 20
"""


@register("q18_large_orders", oracle=_Q18_ORACLE, tags=("J3", "A8", "O2"))
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            "total_qty",
        )
        .orderBy(F.col("total").desc(), "o_orderkey")
        .limit(20)
    )


# --- Q17: small-quantity-order revenue (correlated scalar subquery) --------

_Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@register("q17_small_quantity", oracle=_Q17_ORACLE, tags=("J9", "A2", "P2"))
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-part average) — expressed via the
    SQL door so Catalyst's subquery decorrelation rewrites it into an
    aggregate + join (SURVEY.md §4 'subquery decorrelation' built-in).
    """
    from ..tables import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
          )
        """
    )
