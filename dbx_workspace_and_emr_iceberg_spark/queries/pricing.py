"""Flagship query: TPC-H-Q1-style pricing summary (SURVEY.md §7 minimum slice).

Exercises scan → filter → project → 2-phase hash aggregate → sort, i.e.
operators S2, P1, P2, A1, A2, O1 in one plan. At 100 TB this plan is a
single shuffle on a 6-value grouping key (l_returnflag × l_linestatus);
the filter and the 7-column projection push into the Parquet scan, and
the partial aggregate collapses each map task to ≤6 rows before the
exchange — the shuffle moves kilobytes regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_CUTOFF = "1998-09-01 00:00:00"

# INTEGER-EXACT money math (review-pass r18, the d2/qd4 rule): the old
# round(sum(raw double), 2) cells carried BOTH proven split channels —
# the float sum accumulates in partition-merge order (at 100 TB the sum
# ulp exceeds the half-cent outright), and a group whose exact sum ends
# .xx50 rounds differently per engine (measured: round(0.145, 2) is
# 0.15 in Spark's shortest-repr HALF_UP, 0.14 in DuckDB's binary
# round).  Fixture quanta are exact (quantity integral; price/discount/
# tax 2-dp — probed r18), so every sum is an exact integer at scale
# 0/2/4/6 and every display is an integer half-up div + one identical
# IEEE divide.  S4/S6 sum as decimal(38,0): int64 would overflow the
# charge sum near SF 100k (per-row e6 <= 1.2e11).
_ORACLE = f"""
WITH g AS (
  SELECT l_returnflag, l_linestatus,
         sum(CAST(round(l_quantity) AS BIGINT))            AS sq,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sc,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))  AS s4,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))
             * (100 + CAST(round(l_tax * 100) AS BIGINT)))       AS s6,
         sum(CAST(round(l_discount * 100) AS BIGINT))      AS sd,
         count(*)                                          AS c
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
  GROUP BY l_returnflag, l_linestatus
)
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sq AS DOUBLE)                                       AS sum_qty,
  CAST(sc AS DOUBLE) / 100.0                               AS sum_base_price,
  CAST((2 * s4 + 100) // 200 AS DOUBLE) / 100.0            AS sum_disc_price,
  CAST((2 * s6 + 10000) // 20000 AS DOUBLE) / 100.0        AS sum_charge,
  CAST((2 * sq * 10000 + c) // (2 * c) AS DOUBLE) / 10000.0          AS avg_qty,
  CAST((2 * sc * 10000 + 100 * c) // (200 * c) AS DOUBLE) / 10000.0  AS avg_price,
  CAST((2 * sd * 10000 + 100 * c) // (200 * c) AS DOUBLE) / 10000.0  AS avg_disc,
  c                                                        AS count_order
FROM g
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_ORACLE, tags=("flagship", "A1", "A2", "P2", "O1"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    quanta = li.filter(
        F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.round("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d100"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t100"),
    )
    return (
        quanta.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # decimal(38,0), not bigint: the avg_* display numerators
            # below multiply these sums by 2*10000 — as int64 that
            # wraps around SF ~80 (ADVICE r18; s4/s6 already followed
            # the decimal rule, the plain sums didn't)
            F.sum(F.col("q").cast("decimal(38,0)")).alias("sq"),
            F.sum(F.col("pc").cast("decimal(38,0)")).alias("sc"),
            F.sum(
                (F.col("pc") * (100 - F.col("d100"))).cast("decimal(38,0)")
            ).alias("s4"),
            F.sum(
                (
                    F.col("pc")
                    * (100 - F.col("d100"))
                    * (100 + F.col("t100"))
                ).cast("decimal(38,0)")
            ).alias("s6"),
            F.sum(F.col("d100").cast("decimal(38,0)")).alias("sd"),
            F.count(F.lit(1)).alias("c"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.expr("CAST(sq AS DOUBLE)").alias("sum_qty"),
            F.expr("CAST(sc AS DOUBLE) / 100.0").alias("sum_base_price"),
            F.expr(
                "CAST((2 * s4 + 100) div 200 AS DOUBLE) / 100.0"
            ).alias("sum_disc_price"),
            F.expr(
                "CAST((2 * s6 + 10000) div 20000 AS DOUBLE) / 100.0"
            ).alias("sum_charge"),
            F.expr(
                "CAST((2 * sq * 10000 + c) div (2 * c) AS DOUBLE) / 10000.0"
            ).alias("avg_qty"),
            F.expr(
                "CAST((2 * sc * 10000 + 100 * c) div (200 * c) AS DOUBLE)"
                " / 10000.0"
            ).alias("avg_price"),
            F.expr(
                "CAST((2 * sd * 10000 + 100 * c) div (200 * c) AS DOUBLE)"
                " / 10000.0"
            ).alias("avg_disc"),
            F.col("c").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
