"""Suite 3 — TPC-DS-flavored analytic shapes (round 7).

The 22-shape TPC-H suite covers the reference's Spark-SQL relational
surface; these four add the DS-style compositions real warehouse
workloads lean on — share-of-parent over a rollup, year-over-year
growth, moving-window trend smoothing, and mix-shift analysis — each a
pure declarative plan (rollup/window/pivot over one fact scan, dims
broadcast) and each value-oracled in DuckDB.

Scale shapes: every query is one fact-table scan + one keyed shuffle;
windows partition on the analysis key (year / segment / priority), so
no global sorts; the only driver-side data are the final small result
frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

# --- qd1: share-of-parent over ROLLUP ---------------------------------------
# The classic DS report: revenue at (region, nation) with each nation's
# share of its region — a window OVER the rollup output (grouping-id
# aware), so subtotal rows carry share 1.0 of themselves and leaf rows
# divide by their parent subtotal.

_QD1_ORACLE = """
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation,
       round(revenue, 2) AS revenue,
       round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
         AS region_share
FROM rev
ORDER BY region, nation
"""


@register("qd1_share_of_parent", oracle=_QD1_ORACLE, tags=("A7", "W3", "J9"))
def qd1_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re_ = load_table(spark, sf_dir, "region")
    rev = (
        li.join(F.broadcast(su), li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(re_), na["n_regionkey"] == re_["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev_raw"
            )
        )
    )
    w = Window.partitionBy("region")
    return (
        rev.select(
            "region",
            "nation",
            F.round("rev_raw", 2).alias("revenue"),
            F.round(F.col("rev_raw") / F.sum("rev_raw").over(w), 6).alias(
                "region_share"
            ),
        )
        .orderBy("region", "nation")
    )


# --- qd2: year-over-year growth per market segment --------------------------

_QD2_ORACLE = """
WITH yearly AS (
  SELECT c.c_mktsegment AS segment,
         CAST(year(o.o_orderdate) AS INTEGER) AS yr,
         sum(o.o_totalprice) AS total
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT segment, yr,
       round(total, 2) AS total,
       round(total / lag(total) OVER (PARTITION BY segment ORDER BY yr) - 1,
             6) AS yoy_growth
FROM yearly
ORDER BY segment, yr
"""


@register("qd2_yoy_growth", oracle=_QD2_ORACLE, tags=("W2", "A1", "J1"))
def qd2_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    yearly = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.sum("o_totalprice").alias("tot_raw"))
    )
    w = Window.partitionBy("segment").orderBy("yr")
    return (
        yearly.select(
            "segment",
            "yr",
            F.round("tot_raw", 2).alias("total"),
            F.round(F.col("tot_raw") / F.lag("tot_raw").over(w) - 1, 6).alias(
                "yoy_growth"
            ),
        )
        .orderBy("segment", "yr")
    )


# --- qd3: 3-month moving average per order priority -------------------------

_QD3_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS ym,
         count(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT priority, ym,
       CAST(n AS BIGINT) AS n_orders,
       round(avg(n) OVER (PARTITION BY priority ORDER BY ym
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS ma3
FROM monthly
ORDER BY priority, ym
"""


@register("qd3_moving_average", oracle=_QD3_ORACLE, tags=("W3", "A1"))
def qd3_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("ym"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = (
        Window.partitionBy("priority")
        .orderBy("ym")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        monthly.select(
            "priority",
            "ym",
            "n_orders",
            F.round(F.avg("n_orders").over(w), 4).alias("ma3"),
        )
        .orderBy("priority", "ym")
    )


# --- qd4: return-flag mix shift by ship year (share-of-year) ----------------
# (fixture lineitem carries no l_shipmode; l_returnflag is the mix
# dimension with the same analytic shape)

_QD4_ORACLE = """
WITH base AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, l_returnflag, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
tot AS (SELECT yr, sum(n) AS t FROM base GROUP BY yr)
SELECT b.yr, b.l_returnflag AS return_flag,
       CAST(b.n AS BIGINT) AS n_lines,
       round(b.n * 1.0 / t.t, 6) AS year_share
FROM base b JOIN tot t USING (yr)
ORDER BY yr, return_flag
"""


@register("qd4_mix_shift", oracle=_QD4_ORACLE, tags=("A1", "W3"))
def qd4_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy(
        F.year("l_shipdate").cast("int").alias("yr"),
        F.col("l_returnflag").alias("return_flag"),
    ).agg(F.count(F.lit(1)).alias("n_lines"))
    w = Window.partitionBy("yr")
    return (
        base.select(
            "yr",
            "return_flag",
            "n_lines",
            F.round(
                F.col("n_lines") / F.sum("n_lines").over(w), 6
            ).alias("year_share"),
        )
        .orderBy("yr", "return_flag")
    )
