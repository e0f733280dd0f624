"""Custom Python DataSource (Spark 4, SPARK-44076): the engine's
extension point for in-house formats and feeds.

The reference's source surface is whatever its engines mount
(/root/reference/main.tf:792-806 — Iceberg/S3 via config); a real
deployment always ends up with one feed no packaged connector covers
(an internal ticker, a bespoke binary log). Spark 4's Python DataSource
API is the idiomatic answer: implement ``DataSource`` +
``DataSourceReader`` in pure Python, register once per session, then
``spark.read.format("synthetic_events")`` like any built-in.

Scale shape: ``partitions()`` declares the split set on the driver;
``read(partition)`` runs ON THE EXECUTORS (the reader object is
pickled out), so generation/ingest parallelism equals the partition
count and no data ever transits the driver. Arrow is used for the
return batches when the reader yields tuples.

The synthetic feed here is integer-deterministic (id, id%17,
(id*37%1000)/100) so a DuckDB ``range()`` oracle can hash-verify the
whole path — proving partition planning, executor-side evaluation, and
schema application, not just "rows came back".
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _row(i: int):
    # Exact integer arithmetic then /100.0: every value is an exact
    # two-decimal double, so cross-engine comparison is ulp-safe.
    return (i, i % 17, (i * 37 % 1000) / 100.0)


class SyntheticEventsDataSource(DataSource):
    """Batch source: options n (rows), parts (split count)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id bigint, bucket int, amount double"

    def reader(self, schema: StructType) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema: StructType) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        # Driver-side split planning: contiguous id ranges, one per
        # split — the moral equivalent of file splits for a generated
        # feed. Ceil-div so the tail partition is never lost.
        per = max(1, -(-self.n // self.parts))
        return [
            _RangePartition(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _RangePartition):
        # Executor-side: yields tuples for exactly this split.
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the same deterministic feed.

    Offsets are plain row counts; each micro-batch advances by
    ``rows_per_batch`` until ``n`` rows have been emitted, then the
    source idles (empty batches). partitions(start, end) splits each
    micro-batch the same way the batch reader splits the whole range,
    so executor parallelism holds per-batch too.
    """

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.parts = int(options.get("parts", 4))

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        return {"offset": self.n}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        per = max(1, -(-(hi - lo) // self.parts))
        return [
            _RangePartition(a, min(a + per, hi)) for a in range(lo, hi, per)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end):
        pass


def register_python_datasource(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(SyntheticEventsDataSource)
