"""File-format sources/sinks beyond Parquet (SURVEY.md §2.1 S2/S3).

The engines the reference provisions read/write CSV, JSON and ORC
through the same DataFrameReader/Writer surface as Parquet **[pkg]**
(main.tf:761). Round-trip helpers here write a fixture table out in a
format and read it back with an explicit schema — schema-on-read for
text formats, native vectorized reader for ORC.

Storage note (S3): the path argument takes any Hadoop filesystem URI —
`file://` locally, `s3a://bucket/...` on a cluster with
hadoop-aws/iceberg-aws-bundle on the classpath (README.md:36). No code
change, same reader/writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def roundtrip(
    df: DataFrame, path: str, fmt: str, options: dict[str, str] | None = None
) -> DataFrame:
    """Write df at path in fmt, read it back with the original schema."""
    opts = options or {}
    writer = df.write.mode("overwrite").format(fmt)
    for k, v in opts.items():
        writer = writer.option(k, v)
    writer.save(path)
    reader = df.sparkSession.read.format(fmt).schema(df.schema)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load(path)
