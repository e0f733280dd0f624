"""S13/T14: custom Python DataSource (batch + micro-batch stream).

Spark 4's Python DataSource API (SPARK-44076) is this engine's
extension point for feeds no packaged connector covers — the in-house
equivalent of the reference mounting Iceberg/S3 connectors via config
(/root/reference/main.tf:792-806). sources/pyds.py holds the
implementation; these queries prove the contract end to end:
partition planning on the driver, executor-side generation, schema
application, and (t14) offset-tracked micro-batch progress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.pyds import register_python_datasource
from ..streaming.jobs import run_to_memory

# Deterministic feed: id in [0, N), bucket = id % 17,
# amount = (id*37 % 1000)/100 — every value an exact 2-dp double, so
# the DuckDB range() oracle hash-verifies the whole custom-source path.
_S13_N = 5000

_S13_ORACLE = f"""
SELECT
  CAST(i % 17 AS INTEGER)            AS bucket,
  CAST(count(*) AS BIGINT)           AS n_rows,
  round(sum((i * 37 % 1000) / 100.0), 2) AS total_amount,
  round(avg((i * 37 % 1000) / 100.0), 4) AS avg_amount
FROM range(0, {_S13_N}) t(i)
GROUP BY 1
ORDER BY 1
"""


@register("s13_python_datasource", oracle=_S13_ORACLE, tags=("S13",))
def s13_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read through the registered Python source, then a normal
    declarative aggregate on top — proving the custom source composes
    with Catalyst like any built-in (the aggregate is a standard
    partial-agg shuffle over the source's 8 generated splits)."""
    register_python_datasource(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n", str(_S13_N))
        .option("parts", "8")
        .load()
    )
    n_splits = df.rdd.getNumPartitions()
    if n_splits != 8:
        raise AssertionError(
            f"partition planning broken: {n_splits} splits, declared 8"
        )
    return (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("amount"), 2).alias("total_amount"),
            F.round(F.avg("amount"), 4).alias("avg_amount"),
        )
        .orderBy("bucket")
    )


_T14_ORACLE = """
SELECT CAST(i % 17 AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows
FROM range(0, 600) t(i)
GROUP BY 1 ORDER BY 1
"""


@register("t14_python_stream_source", oracle=_T14_ORACLE, tags=("T14", "T1"))
def t14_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch stream from the same Python source under
    Trigger.AvailableNow: the run admits the whole declared backlog
    (see SyntheticEventsStreamReader on why that is the only lossless
    availableNow contract for Python sources) and terminates.
    Self-verified (streamed per-bucket counts equal the batch read's —
    exactly-once across the offset boundary) AND value-oracled (r11,
    the s13b precedent): the generator's row formula is pure integer
    arithmetic, so DuckDB replays the streamed aggregate from
    range(0, n) with no table at all."""
    register_python_datasource(spark)
    n = 600
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n", str(n))
        .option("parts", "4")
        .load()
    )
    # shared helper, not an inline copy (review-pass r18): the old
    # verbatim writeStream block hard-coded queryName("t14_sink"), so a
    # second overlapping start in one session collided on the active-
    # query name, and termination-handling fixes to the helper would
    # not have propagated here
    streamed = run_to_memory(
        sdf.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_rows")),
        output_mode="complete",
        timeout_s=180,
    ).select("bucket", "n_rows")
    batch = (
        spark.read.format("synthetic_events")
        .option("n", str(n))
        .option("parts", "4")
        .load()
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    diff = streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()
    if diff != 0:
        raise AssertionError(
            f"streamed per-bucket counts differ from batch read ({diff} rows)"
        )
    return streamed.orderBy("bucket")


# --- S13b: Python DataSource filter pushdown (Spark 4.1) --------------------
# 4.1's pushFilters hook lets a pure-Python source consume predicates
# at PLANNING time (sources/pyds.py SyntheticEventsPushdownReader):
# pushed id bounds narrow the generated range before partitions() runs,
# so the split set itself shrinks — the Python-source analog of parquet
# row-group pruning, and at 100 TB the difference between a connector
# that streams everything through Python workers and one that never
# materializes the pruned range at all. Three-way evidence:
#  1. plan assert — the residual Filter keeps the NON-pushed predicate
#     (bucket) but drops the id bounds (Spark trusts the source);
#  2. oracle hash — if the source consumed the bounds but enforced them
#     wrong, nothing re-checks them and the values would mismatch;
#  3. split assert — the reader's own planning, re-run with the same
#     pushed bounds, must produce partitions spanning EXACTLY the
#     narrowed range (review-pass r18: this check was promised here
#     but previously unimplemented).

_S13B_N = 5000

_S13B_ORACLE = f"""
SELECT
  CAST(i % 17 AS INTEGER)                AS bucket,
  CAST(count(*) AS BIGINT)               AS n_rows,
  round(sum((i * 37 % 1000) / 100.0), 2) AS total_amount
FROM range(0, {_S13B_N}) t(i)
WHERE i >= 1000 AND i < 2000 AND i % 17 IN (3, 5)
GROUP BY 1
ORDER BY 1
"""


@register("s13b_pyds_filter_pushdown", oracle=_S13B_ORACLE, tags=("S13", "S2"))
def s13b_pyds_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_python_datasource(spark)
    saved = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (
            spark.read.format("synthetic_events_pd")
            .option("n", str(_S13B_N))
            .option("parts", "4")
            .load()
            .filter(
                (F.col("id") >= 1000)
                & (F.col("id") < 2000)
                & F.col("bucket").isin(3, 5)
            )
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        filter_lines = [
            ln for ln in plan.splitlines() if ln.strip().startswith("+- *(1) Filter")
            or "Filter (" in ln
        ]
        fl = " ".join(filter_lines)
        if "bucket" not in fl:
            raise AssertionError(
                f"residual bucket predicate missing from plan: {fl!r}"
            )
        import re as _re

        # both bounds matched as literal PREDICATES (review-pass r18,
        # reproduced: a bare `"2000" in fl` substring check false-
        # positively matches Catalyst expression ids like bucket#2000 —
        # exprIds grow monotonically across the session, so the old
        # check was a registry-order-dependent spurious red)
        if _re.search(
            r"\(id#\d+L? [<>]=? 1000\)|\(1000 [<>]=? id#\d+L?\)", fl
        ) or _re.search(
            r"\(id#\d+L? [<>]=? 2000\)|\(2000 [<>]=? id#\d+L?\)", fl
        ):
            raise AssertionError(
                f"id bounds were NOT pushed into the source: {fl!r}"
            )
        # split assert — evidence #3: the pushed bounds must shrink the
        # SPLIT SET itself, not merely filter rows post-scan (review-
        # pass r18: the header promised this check but no assert
        # existed).  Re-run the reader's own planning with the same
        # pushed filters and verify the planned id span is exactly the
        # narrowed range.
        from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

        from ..sources.pyds import SyntheticEventsPushdownReader

        rdr = SyntheticEventsPushdownReader(
            {"n": str(_S13B_N), "parts": "4"}
        )
        residual = list(
            rdr.pushFilters(
                [
                    GreaterThanOrEqual(("id",), 1000),
                    LessThan(("id",), 2000),
                ]
            )
        )
        planned = rdr.partitions()
        span = sum(p.end - p.start for p in planned)
        if residual or span != 1000 or any(
            p.start < 1000 or p.end > 2000 for p in planned
        ):
            raise AssertionError(
                f"pushed bounds did not narrow the split set: span={span}, "
                f"residual={residual}, parts="
                f"{[(p.start, p.end) for p in planned]}"
            )
        res = (
            df.groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("amount"), 2).alias("total_amount"),
            )
            .orderBy("bucket")
        )
        # pinned-conf materialization — docs/SELF_VERIFICATION.md
        # (re-plan with pushFilters present but the conf off REFUSES)
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", saved)
