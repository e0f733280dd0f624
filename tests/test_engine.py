"""Engine facade: the three user doors work against one session."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dbx_workspace_and_emr_iceberg_spark.engine import Engine

from tests.conftest import SF_DIR


@pytest.fixture()
def eng(spark):
    wh = tempfile.mkdtemp(prefix="eng_wh_")
    e = Engine(spark, warehouse=wh)
    e.register_fixtures(SF_DIR)
    yield e
    shutil.rmtree(wh, ignore_errors=True)


def test_sql_door(eng):
    n = eng.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n
    assert n == 6000


def test_dataframe_door(eng):
    top = (
        eng.table("orders", SF_DIR)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc())
        .first()
    )
    assert top.n > 0


def test_managed_table_door(eng):
    src = eng.table("nation", SF_DIR)
    t = eng.create_table("nation_gold", src)
    assert eng.sql("SELECT count(*) AS n FROM nation_gold").collect()[0].n == 25
    t.delete_where(F.col("n_regionkey") == 0)
    assert eng.managed("nation_gold").read().count() < 25
    assert eng.table_snapshot("nation_gold", 1).count() == 25  # time travel
    # SQL door sees DML only after refresh (views pin their snapshot)
    eng.refresh_view("nation_gold")
    assert eng.sql("SELECT count(*) AS n FROM nation_gold").collect()[0].n < 25
