"""P1-P5: projections, filters, conditionals, casts (SURVEY.md §2.2).

The reference gets these from Spark SQL / Trino over Iceberg scans
(/root/reference/main.tf:792-806 **[pkg]**). Here each is a declarative
DataFrame plan so Catalyst pushes the filter and the pruned column set
into the Parquet scan — at 100 TB these queries read only the referenced
columns' pages and skip row groups via min/max stats; no shuffle at all
except the final order (P-queries keep output small via selective
predicates so driver-side collection stays bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# --- P1: projection / column pruning / computed columns -------------------

_P1_ORACLE = """
SELECT
  c_custkey,
  upper(c_name)                                   AS name_upper,
  c_acctbal,
  cast(round(cast(c_acctbal AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,1)), 2)
       AS DOUBLE)                                 AS acctbal_uplift,
  concat(c_mktsegment, '#', cast(c_nationkey AS VARCHAR)) AS seg_nation
FROM customer
"""


@register("p1_projection", oracle=_P1_ORACLE, tags=("P1",))
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # acctbal_uplift is computed in DECIMAL on both engines: double
    # multiply-then-round is not cross-engine stable on .xx5 half-ties
    # (Spark rounds the shortest decimal repr, DuckDB the raw binary),
    # e.g. 9107.05*1.1. Decimal arithmetic is exact, and both engines
    # round decimal ties half-away-from-zero. The FINAL column is cast
    # to DOUBLE on both sides: a rounded 2-dp decimal is exactly
    # representable cross-engine, and DECIMAL-typed output cells are
    # canonicalized differently by the driver harness (the only two
    # perpetual-red queries were the only two exposing DECIMAL output).
    c = load_table(spark, sf_dir, "customer")
    uplift = F.col("c_acctbal").cast("decimal(12,2)") * F.lit("1.1").cast(
        "decimal(3,1)"
    )
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        "c_acctbal",
        F.round(uplift, 2).cast("double").alias("acctbal_uplift"),
        # concat, NOT concat_ws (review-pass r17): concat_ws SKIPS
        # NULLs while the oracle's concat PROPAGATES them — identical
        # on the NULL-free fixtures, divergent the moment a regen
        # introduces one NULL segment/nationkey
        F.concat(
            "c_mktsegment", F.lit("#"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
    )


# --- P2: filter predicate zoo ---------------------------------------------

_P2_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
FROM lineitem
WHERE l_quantity BETWEEN 30 AND 40
  AND l_returnflag IN ('A', 'R')
  AND l_shipdate IS NOT NULL
  AND (l_discount > 0.08 OR l_tax < 0.02)
  AND NOT (l_linestatus = 'O')
"""


@register("p2_filter", oracle=_P2_ORACLE, tags=("P2",))
def p2_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(30, 40)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_shipdate").isNotNull()
        & ((F.col("l_discount") > 0.08) | (F.col("l_tax") < 0.02))
        & ~(F.col("l_linestatus") == "O")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")


# --- P2b: LIKE family ------------------------------------------------------

_P2B_ORACLE = """
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE '%gear%' OR p_type LIKE 'STANDARD%'
"""


@register("p2b_filter_like", oracle=_P2B_ORACLE, tags=("P2",))
def p2b_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    # '%gear%' matches real fixture part names (review-pass r17: the
    # old '%ivory%' matched ZERO rows at every scale factor, so the
    # infix-LIKE half of the probe was permanently vacuous — an
    # infix-matching regression would have stayed hash-green forever)
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%gear%") | F.col("p_type").like("STANDARD%")
    ).select("p_partkey", "p_name", "p_type")


# --- P4: CASE WHEN / coalesce / nullif / if --------------------------------

_P4_ORACLE = """
SELECT
  o_orderkey,
  CASE
    WHEN o_totalprice > 300000 THEN 'high'
    WHEN o_totalprice > 100000 THEN 'mid'
    ELSE 'low'
  END                                             AS price_band,
  coalesce(nullif(o_orderstatus, 'O'), 'OPEN')    AS status_norm,
  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
FROM orders
"""


@register("p4_conditionals", oracle=_P4_ORACLE, tags=("P4",))
def p4_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_norm"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


# --- P5: CAST / type coercion ----------------------------------------------

_P5_ORACLE = """
SELECT
  l_orderkey,
  cast(l_quantity AS INTEGER)                     AS qty_int,
  cast(cast(round(l_extendedprice, 2) AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
  cast(l_shipdate AS DATE)                        AS ship_day,
  cast(l_linenumber AS VARCHAR)                   AS line_str,
  cast(l_linenumber AS DOUBLE) / 2                AS line_half
FROM lineitem
WHERE l_orderkey % 40 = 0
"""


@register("p5_casts", oracle=_P5_ORACLE, tags=("P5",))
def p5_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # ANSI note (Spark 4 default): l_quantity is 1..50 so INT cast is safe.
    # DuckDB cast(double AS INTEGER) rounds-half-even; Spark truncates —
    # quantities are integral doubles so both agree here.
    # cast(timestamp AS DATE) is session-timezone-dependent in Spark;
    # load_table pins the session to UTC (ensure_session_defaults), which
    # matches DuckDB's civil-time view of the naive fixture timestamps —
    # under any other zone this query would shift dates across midnight.
    return li.filter(F.col("l_orderkey") % 40 == 0).select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        # DECIMAL hop proves the cast path; final DOUBLE keeps the output
        # schema out of the driver's DECIMAL canonicalization (see p1).
        F.round("l_extendedprice", 2).cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        F.col("l_linenumber").cast("string").alias("line_str"),
        (F.col("l_linenumber").cast("double") / 2).alias("line_half"),
    )
