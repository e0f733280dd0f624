"""Fixture table loaders (schemas in FIXTURES.md; data in /root/testdata).

The reference's only scan operators are Iceberg catalog scans over
Parquet data files (SURVEY.md §2.1 S1-S2; /root/reference/README.md:36).
Locally the fixtures are bare Parquet, so ``load_table`` is the S2 path;
the catalog-managed path lives in sources/lakehouse.py.

Column pruning + predicate pushdown reach the Parquet scan through
Spark's DataSource V2 vectorized reader automatically as long as callers
express plans declaratively — verified by plans/explain.py assertions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (vectorized Parquet scan, S2).

    ``events.ts`` is physically INT64 TIMESTAMP(NANOS), which Spark's
    Parquet reader rejects by default. All fixture values are µs-aligned
    (verified: epoch_ns % 1000 == 0 for every row), so we read nanos as
    long and convert losslessly to a TimestampType column — identical to
    what DuckDB's TIMESTAMP view of the same file yields.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view so ``spark.sql`` works
    against the same names the DuckDB oracle sees."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
