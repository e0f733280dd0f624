"""Remaining TPC-H-shape queries (q2,q5,q7,q8,q9,q11,q13,q15,q16,q19,q20,q21,q22)
adapted to the fixture star schema — completes the canonical Spark SQL + Trino
over Iceberg workload surface the reference provisions (SURVEY.md §2.3 J9,
/root/reference/main.tf:761, README.md:36).

Fixture deltas from real TPC-H and how each shape is preserved:
  * no `partsupp` → supply cost / availability derived from `lineitem`
    (per-(partkey,suppkey) aggregates) so q2/q11/q16/q20 keep their
    correlated-subquery / scalar-subquery / anti-join shapes;
  * no commit/receipt dates → lateness = l_shipdate vs o_orderdate+interval
    (q21 keeps its exists + not-exists self-join shape);
  * no c_phone → "country code" = c_nationkey % 7 (q22 keeps its
    scalar-subquery + anti-join shape).

Scale disciplines (100 TB posture): dims (nation/region) explicitly
broadcast; fact-fact joins left to AQE sort-merge; decimal-cast sums where
the oracle hash would otherwise flap on double ulps; q21's double EXISTS /
NOT EXISTS expressed as ONE per-order aggregate instead of two self-joins
(one shuffle of lineitem instead of three).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --- Q2: min-cost supplier (correlated min subquery) ------------------------

_Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         (min({'v': l_extendedprice / l_quantity,
               'c': CAST(round(l_extendedprice * 100) AS BIGINT),
               'q': CAST(l_quantity AS BIGINT)})) AS m
  FROM lineitem GROUP BY 1, 2
), eu AS (
  SELECT c.l_partkey, (c.m).v AS supplycost,
         CAST((200 * (c.m).c + (c.m).q) // (2 * (c.m).q) AS DOUBLE) / 10000
           AS supplycost4,
         s_name, round(s_acctbal, 2) AS s_acctbal, n_name
  FROM cost c
  JOIN supplier ON c.l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey,
       e.supplycost4 AS supplycost
FROM eu e JOIN part p ON e.l_partkey = p.p_partkey
WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
  AND e.supplycost = (SELECT min(e2.supplycost) FROM eu e2
                      WHERE e2.l_partkey = e.l_partkey)
ORDER BY e.s_acctbal DESC, p.p_partkey, e.s_name
LIMIT 20
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("J9", "A1", "W1"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-min subquery realized as a window min over the partition
    key — one shuffle, no self-join (the decorrelated plan Catalyst would
    produce, stated explicitly).  min over doubles is order-insensitive,
    so the equality filter is hash-stable vs the oracle.

    The DISPLAYED supplycost rounds via integer arithmetic (review-pass
    r17): round(raw_double, 4) splits on 5th-decimal half-ties between
    Spark's shortest-repr HALF_UP and DuckDB's binary-value rounding
    (the fixtures carry ~1490 such quotients at sf0.01, none surviving
    the filters yet — green by luck). The min aggregates a struct
    (quotient, cents, qty) — lexicographic in both engines, quotient
    doubles identical cross-engine (one IEEE divide of equal inputs),
    cents/qty tie-break deterministic — and the display is
    (200·cents + qty) div (2·qty), the exact HALF_UP 4-dp scaling of
    cents/(100·qty), over a single identical final divide."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    cost = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("v"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        F.col("l_quantity").cast("long").alias("q"),
    ).groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.struct("v", "c", "q")).alias("m")
    )
    eu = (
        cost.join(s, cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "l_partkey",
            F.col("m.v").alias("supplycost"),
            F.expr(
                "CAST((200 * m.c + m.q) div (2 * m.q) AS DOUBLE) / 10000"
            ).alias("supplycost4"),
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "n_name",
        )
    )
    w = Window.partitionBy("l_partkey")
    best = eu.withColumn("min_cost", F.min("supplycost").over(w)).filter(
        F.col("supplycost") == F.col("min_cost")
    )
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("supplycost4").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(20)
    )


# --- Q5: local supplier volume ----------------------------------------------

_Q5_ORACLE = """
SELECT n_name, round(cast(sum(cast(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE, tags=("J9", "A1"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --- Q7: volume shipping between two nations --------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       round(cast(sum(volume) AS DOUBLE), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         cast(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=_Q7_ORACLE, tags=("J9", "A1"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation joined twice under different roles (supplier side vs
    customer side) — the aliased-dimension pattern; both sides broadcast."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(vol).cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8: national market share ----------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       CAST((20000 * CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                                   ELSE cast(0 AS DECIMAL(18,4)) END)
                          * 10000 AS HUGEINT)
             + CAST(sum(volume) * 10000 AS HUGEINT))
            // (2 * CAST(sum(volume) * 10000 AS HUGEINT))
            AS DOUBLE) / 10000 AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         cast(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE, tags=("J9", "A1", "P4"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(
                    F.col("nation") == "NATION_3", F.col("volume")
                ).otherwise(zero)
            ).alias("num"),
            F.sum("volume").alias("den"),
        )
        # integer HALF_UP 4-dp share (review-pass r17): round(double,4)
        # splits on 5th-decimal half-ties between Spark's shortest-repr
        # HALF_UP and DuckDB's binary rounding. num/den are exact
        # scale-4 decimals, so share·1e4 = (2e4·N + D) div (2·D) over
        # the ×1e4 integers is exact in decimal(38,0)/HUGEINT, and the
        # final /10000 is one identical IEEE divide.
        .select(
            "o_year",
            F.expr(
                "CAST((20000 * CAST(num * 10000 AS DECIMAL(38,0))"
                " + CAST(den * 10000 AS DECIMAL(38,0)))"
                " div (2 * CAST(den * 10000 AS DECIMAL(38,0)))"
                " AS DOUBLE) / 10000"
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


# --- Q9: product-type profit (retailprice as supply-cost proxy) -------------

_Q9_ORACLE = """
SELECT nation, o_year, round(cast(sum(amount) AS DOUBLE), 2) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         cast(l_extendedprice * (1 - l_discount)
              - p_retailprice * l_quantity * 0.1 AS DECIMAL(18,4)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q9_product_profit", oracle=_Q9_ORACLE, tags=("J9", "A1", "F1"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    ).cast("decimal(18,4)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount").cast("double"), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --- Q11: important stock (scalar-subquery threshold) -----------------------

_Q11_ORACLE = """
WITH val AS (
  SELECT l_partkey AS partkey,
         sum(cast(l_extendedprice AS DECIMAL(18,2))) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY 1
)
SELECT partkey, round(cast(value AS DOUBLE), 2) AS value
FROM val
WHERE cast(value AS DOUBLE) > (SELECT cast(sum(value) AS DOUBLE) * 0.002 FROM val)
ORDER BY value DESC, partkey
"""


@register("q11_important_stock", oracle=_Q11_ORACLE, tags=("A8", "J9"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery → computed once and broadcast-crossed
    onto the aggregate (one extra tiny stage, no re-scan; at 100 TB the
    threshold side is a single row).  Decimal sums keep the threshold
    comparison exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    val = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value"))
    )
    thresh = val.agg(
        (F.sum("value").cast("double") * 0.002).alias("thresh")
    )
    return (
        val.crossJoin(F.broadcast(thresh))
        .filter(F.col("value").cast("double") > F.col("thresh"))
        .select("partkey", F.round(F.col("value").cast("double"), 2).alias("value"))
        .orderBy(F.col("value").desc(), "partkey")
    )


# --- Q13: customer order-count distribution ---------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_distribution", oracle=_Q13_ORACLE, tags=("J2", "A1"))
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained aggregations; the second groups on the first's output
    (tiny — order-count histogram), so only the first shuffle is sized by
    data volume."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- Q15: top supplier (max scalar subquery over a derived view) ------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, round(cast(total_rev AS DOUBLE), 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE, tags=("A8", "J1"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --- Q16: supplier diversity per part attribute (NOT IN anti-join) ----------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_supplier_diversity", oracle=_Q16_ORACLE, tags=("J3", "A4"))
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-nullable key → left_anti join (same semantics;
    the null-aware special case doesn't arise because s_suppkey is a
    non-null PK)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --- Q19: discounted revenue under disjunctive predicates -------------------

_Q19_ORACLE = """
SELECT round(cast(sum(cast(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_ORACLE, tags=("P2", "J5", "A2"))
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across both join sides — Catalyst extracts the common
    join key (equi) and evaluates the disjunction post-join; per-side
    conjuncts (p_size/l_quantity lower bounds) still push to the scans."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
    )


# --- Q20: part promotion (correlated avg over derived supply) ---------------

_Q20_ORACLE = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT s_name, round(s_acctbal, 2) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
  AND s_suppkey IN (
    SELECT sh.l_suppkey FROM shipped sh
    JOIN part ON p_partkey = sh.l_partkey
    WHERE p_name LIKE '%bolt%'
      AND sh.qty > (SELECT 0.5 * avg(s2.qty) FROM shipped s2
                    WHERE s2.l_partkey = sh.l_partkey)
  )
ORDER BY s_name
"""


@register("q20_part_promotion", oracle=_Q20_ORACLE, tags=("J3", "A1", "W3"))
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-part average realized as a window avg (single
    shuffle on l_partkey), then a semi-join chain up to supplier —
    sum/avg over doubles here feed a strict inequality, and the window
    avg is computed from the same exact per-group sums on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    w = Window.partitionBy("l_partkey")
    qualifying = (
        shipped.withColumn("avg_qty", F.avg("qty").over(w))
        .filter(F.col("qty") > 0.5 * F.col("avg_qty"))
        .join(p, F.col("l_partkey") == p.p_partkey, "left_semi")
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, "s_suppkey", "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


# --- Q21: suppliers who kept orders waiting (exists + not-exists) -----------

_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
JOIN nation    ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 75 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 75 DAY)
  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


@register("q21_waiting_orders", oracle=_Q21_ORACLE, tags=("J3", "J9", "A1"))
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic q21 EXISTS + NOT-EXISTS pair is rewritten as ONE
    per-order supplier rollup: an order qualifies a supplier iff the
    order has ≥2 distinct suppliers and this supplier is the ONLY late
    one.  That's one shuffle of lineitem instead of two extra self-joins
    — the rewrite that matters at 100 TB.  Late = shipped >75 days after
    order date (fixture has no commit/receipt dates)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAY")
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(late, 1).otherwise(0)).alias("late_lines"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.when(F.col("late_lines") > 0, 1).otherwise(0)).alias("n_late"),
    )
    # The oracle counts qualifying l1 ROWS, so a supplier with several
    # late lines in one order contributes each of them — sum late_lines.
    waiting = (
        per_supp.filter(F.col("late_lines") > 0)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("late_lines").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


# --- Q22: global sales opportunity (anti-join + scalar subquery) ------------

_Q22_ORACLE = """
SELECT c_nationkey % 7 AS cntrycode, count(*) AS numcust,
       round(cast(sum(cast(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
FROM customer c
WHERE c_nationkey % 7 IN (0, 2, 4)
  AND c_acctbal > (
    SELECT cast(sum(cast(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    FROM customer
    WHERE c_acctbal > 0 AND c_nationkey % 7 IN (0, 2, 4)
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
GROUP BY 1
ORDER BY 1
"""


@register("q22_sales_opportunity", oracle=_Q22_ORACLE, tags=("J3", "A1"))
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Country code = c_nationkey % 7 (fixture has no c_phone).  The
    average-balance threshold is an exact decimal sum divided as double
    — identical on both engines — and NOT EXISTS is a left_anti join
    against the orders key set."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey") % 7
    )
    cohort = c.filter(F.col("cntrycode").isin(0, 2, 4))
    o_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-07-01 00:00:00"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    thresh = cohort.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cohort.join(o_keys, "c_custkey", "left_anti")
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2
            ).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
