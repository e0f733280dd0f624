"""Binned range join — the equi-join scale path for point-in-interval
joins.

Spark executes a non-equi predicate like ``p BETWEEN lo AND hi`` as a
BroadcastNestedLoopJoin (small side) or a cartesian product (large-
large): O(|L|·|R|) comparisons. That's fine for j7's 3-row band table
and fatal for two large inputs. The standard fix (what a range-join
hint does on engines that have one) is BINNING:

* every point lands in exactly ONE bin  ``floor(p / w)``;
* every interval explodes into the bins it overlaps
  ``floor(lo / w) .. floor(hi / w)`` — ``(hi - lo) / w + 1`` rows;
* an ordinary equi join on the bin id meets every (point, interval)
  candidate pair exactly once (a point has one bin, so no dedup step),
  and the exact predicate filters bin-mates that don't truly overlap.

Cost model: shuffle grows by the interval replication factor
``len/w + 1`` and candidate pairs are bounded by pairs sharing a bin —
pick ``w`` near the p95 interval length so replication stays ~2x while
bins stay selective. All arithmetic is integer (pmod-based floor
division), so epoch values keep exactness where double-based
``floor(c / w)`` would not.

This generalizes the same linearization idea as the as-of join
(operators/asof.py): turn an order/range predicate into something the
shuffle can key on. (Reference parity: the reference stack — Spark 3.5
+ Iceberg, /root/reference/main.tf:792-806 — has no range-join
operator; Spark-first scale addition per SURVEY.md §2.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floordiv(col_name: str, w: int):
    # exact floor division on integral types: pmod is in [0, w), the
    # difference is an exact multiple of w, and DIV is integer division
    return F.expr(f"(`{col_name}` - pmod(`{col_name}`, {w})) DIV {w}")


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bin_width: int,
    lo_inclusive: bool = True,
    hi_inclusive: bool = True,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them, via a
    bin equi-key instead of a nested loop.

    ``point``, ``lo``, ``hi`` name integral columns (cast timestamps to
    epoch seconds first). The two inputs must not share column names.
    Intervals with ``lo > hi`` simply match nothing. ``bin_width``
    trades shuffle volume (interval replication ``len/w + 1``) against
    bin selectivity; intervals vastly longer than ``bin_width`` explode
    into many rows, so pick w near the typical interval length.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"inputs share column names {sorted(overlap)}")
    if "__bin" in points.columns or "__bin" in intervals.columns:
        # withColumn would silently replace the caller's column and the
        # trailing drop would strip it from the output (review-pass r16)
        raise ValueError(
            "range_join_binned: input already has a __bin column — "
            "rename it"
        )

    pb = points.withColumn("__bin", _floordiv(point, bin_width))
    ib = intervals.filter(F.col(lo) <= F.col(hi)).withColumn(
        "__bin",
        F.explode(
            F.sequence(_floordiv(lo, bin_width), _floordiv(hi, bin_width))
        ),
    )
    pred = (
        (F.col(point) >= F.col(lo))
        if lo_inclusive
        else (F.col(point) > F.col(lo))
    ) & (
        (F.col(point) <= F.col(hi))
        if hi_inclusive
        else (F.col(point) < F.col(hi))
    )
    return pb.join(ib, "__bin").filter(pred).drop("__bin")
