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

_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                          AS sum_qty,
  round(sum(l_extendedprice), 2)                                     AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
  round(avg(l_quantity), 4)                                          AS avg_qty,
  round(avg(l_extendedprice), 4)                                     AS avg_price,
  round(avg(l_discount), 4)                                          AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_ORACLE, tags=("flagship", "A1", "A2", "P2", "O1"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
