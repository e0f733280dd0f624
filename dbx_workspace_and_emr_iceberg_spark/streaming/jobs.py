"""Structured Streaming building blocks (SURVEY.md §2.9 T1-T9).

The reference enables streaming only by installing Spark on EMR
(/root/reference/main.tf:761); Iceberg is a valid streaming sink
**[pkg]** (README.md:36). Locally we drive file-source streams over the
`events` fixture with trigger(availableNow=True) — deterministic,
bounded, and exactly the pattern a backfill-style streaming job uses in
production.

Scale notes: watermarks bound state (T5); windowed aggregates shuffle
once per trigger on (window, key); session windows (T4) and stateful
ops (T7) keep per-key state in the state store — at 100 TB/day the
state store is RocksDB-backed and the same code runs unchanged.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: file stream over the events fixture (ts: parquet-ns → µs)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = StructType(
        [f if f.name != "ts" else type(f)("ts", LongType()) for f in static.schema]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_memory(
    stream: DataFrame, output_mode: str = "complete", timeout_s: int = 300
) -> DataFrame:
    """Execute a bounded stream (availableNow) into a memory sink and
    return the sink table as a DataFrame."""
    name = "s" + uuid.uuid4().hex[:10]
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    spark = stream.sparkSession
    return spark.table(name)
