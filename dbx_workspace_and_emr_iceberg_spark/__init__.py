"""spark-graft — a PySpark-native lakehouse analytics engine.

Re-expresses the capability surface of the reference repo
``ryancicak/dbx-workspace-and-emr-iceberg`` (a Terraform deployment of
Spark 3.5 + Iceberg 1.9.1 + Trino 467 over Unity Catalog — see
/root/reference/main.tf:792-820) as an idiomatic, local-first PySpark
engine, plus the LLM-data-pipeline operators mandated by BASELINE.json.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC, local[N])
    tables.py     fixture loaders (FIXTURES.md schemas)
    registry.py   query registry — the driver contract's backbone
    queries/      SURVEY.md §2 operator inventory as (PySpark, oracle-SQL) pairs
    operators/    custom operators Spark lacks (as-of join, dedup, similarity…)
    sources/      lakehouse table layer (snapshot format, DML, time travel)
    functions/    reusable column-expression helpers
    plans/        plan-inspection helpers (pushdown/codegen assertions)
    streaming/    Structured Streaming jobs (windows, watermark, stateful)
"""

__version__ = "0.1.0"
