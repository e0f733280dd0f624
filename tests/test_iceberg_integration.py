"""Real-Iceberg integration readiness (SURVEY.md §2.1 S1, §2.11 M1-M8).

The reference wires Iceberg purely through Spark conf
(/root/reference/main.tf:792-806): the runtime jar +
``IcebergSparkSessionExtensions`` + a ``SparkCatalog``. This engine
keeps that exact wiring available as a config swap
(``sources/lakehouse.py::iceberg_session_conf``); the snapshot layer is
the offline stand-in.

These tests run the signature SQL-DML flow against a REAL Iceberg
catalog whenever the jars are on the classpath, and skip otherwise —
so the moment this environment (or a user's cluster) has
``iceberg-spark-runtime``, the M1-M8 surface is exercised end-to-end
with zero code change.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest


def _iceberg_available() -> bool:
    """True iff an iceberg-spark-runtime jar is importable by the JVM."""
    import glob
    import os

    import pyspark

    jar_dirs = [
        os.path.join(os.path.dirname(pyspark.__file__), "jars"),
        os.path.expanduser("~/.ivy2/jars"),
    ]
    return any(
        glob.glob(os.path.join(d, "*iceberg-spark-runtime*.jar"))
        for d in jar_dirs
    )


pytestmark = pytest.mark.skipif(
    not _iceberg_available(),
    reason="iceberg-spark-runtime jar not on the classpath (offline "
    "container); the snapshot layer stands in — see sources/lakehouse.py",
)


@pytest.fixture()
def iceberg_spark():
    from pyspark.sql import SparkSession

    from dbx_workspace_and_emr_iceberg_spark.sources.lakehouse import (
        iceberg_session_conf,
    )

    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    b = (
        SparkSession.builder.appName("iceberg-integration")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in iceberg_session_conf(wh, catalog="it").items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    yield spark
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)


def test_real_iceberg_sql_dml_lifecycle(iceberg_spark):
    """CTAS -> MERGE -> UPDATE -> DELETE -> time travel, all as SQL
    strings against a real Iceberg catalog — the reference's
    README.md:35-45 recipe verbatim."""
    s = iceberg_spark
    s.sql("CREATE TABLE it.db.nation (k INT, name STRING, region INT) USING iceberg")
    s.sql("INSERT INTO it.db.nation VALUES (0,'ALGERIA',0),(1,'ARGENTINA',1),(3,'CANADA',1)")

    s.sql("CREATE OR REPLACE TEMP VIEW updates AS SELECT * FROM VALUES "
          "(0,'MERGED',9),(3,'DROP',9),(200,'NEW',9) AS v(k, name, region)")
    s.sql(
        """
        MERGE INTO it.db.nation t USING updates s ON t.k = s.k
        WHEN MATCHED AND s.name = 'DROP' THEN DELETE
        WHEN MATCHED THEN UPDATE SET t.region = s.region
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    rows = {r.k: r.region for r in s.sql("SELECT k, region FROM it.db.nation").collect()}
    assert rows == {0: 9, 1: 1, 200: 9}

    s.sql("UPDATE it.db.nation SET name = upper(name) WHERE region = 9")
    s.sql("DELETE FROM it.db.nation WHERE k >= 200")
    assert s.sql("SELECT count(*) AS c FROM it.db.nation").collect()[0].c == 2

    snaps = s.sql("SELECT snapshot_id FROM it.db.nation.snapshots ORDER BY committed_at").collect()
    assert len(snaps) >= 4, "each DML commit must be a snapshot"
    first = snaps[0].snapshot_id
    n_v1 = s.sql(
        f"SELECT count(*) AS c FROM it.db.nation VERSION AS OF {first}"
    ).collect()[0].c
    assert n_v1 == 0, "time travel reads the CTAS-empty first snapshot"
