"""Pin that the invariance-sweep knobs are REAL, EFFECTIVE Spark confs.

A typo'd conf key silently no-ops in Spark — the sweep's codegen_off /
arrow_batch / splits axes would then run the DEFAULT configuration and
vacuously pass (the axis asserts MATCH counts, not that the knob did
anything). Each test here flips the conf at runtime on the shared
session and asserts the documented behavioral consequence, so a key
rename in a future Spark upgrade fails HERE instead of quietly
hollowing out three axes. A source-level check also pins that
tools/driver_sim.py spells the same keys.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

K_CODEGEN = "spark.sql.codegen.wholeStage"
K_ARROW = "spark.sql.execution.arrow.maxRecordsPerBatch"
K_SPLIT = "spark.sql.files.maxPartitionBytes"
K_OPEN = "spark.sql.files.openCostInBytes"
K_BCAST = "spark.sql.autoBroadcastJoinThreshold"
K_VEC = "spark.sql.parquet.enableVectorizedReader"
K_AQE = "spark.sql.adaptive.enabled"
K_ANSI = "spark.sql.ansi.enabled"


@pytest.fixture
def conf_scope(spark):
    """Set confs for one test, restore originals afterwards — the
    session is shared suite-wide, so leaking a 7-row Arrow batch or a
    64 KiB split size would silently slow (or re-shape) every later
    test."""
    saved: dict[str, str] = {}

    def set_(key: str, value: str) -> None:
        if key not in saved:
            saved[key] = spark.conf.get(key)
        spark.conf.set(key, value)

    yield set_
    for key, old in saved.items():
        spark.conf.set(key, old)


def test_driver_sim_spells_the_same_keys():
    with open(os.path.join(REPO, "tools", "driver_sim.py")) as fh:
        src = fh.read()
    for key in (K_CODEGEN, K_ARROW, K_SPLIT, K_OPEN, K_BCAST, K_VEC, K_ANSI):
        assert key in src, f"driver_sim.py no longer sets {key}"


def test_codegen_knob_toggles_wholestage(spark, conf_scope):
    def plan() -> str:
        # fresh frame per call: QueryExecution memoizes executedPlan,
        # so re-reading one df after a conf flip returns the OLD plan
        df = spark.range(100).filter("id > 1").selectExpr("id * 2 AS x")
        return df._jdf.queryExecution().executedPlan().toString()

    # no-shuffle plan: AQE stays out, so executedPlan is final; the
    # plan's toString marks each codegen stage with a '*(n)' prefix
    conf_scope(K_CODEGEN, "false")
    assert "*(" not in plan()
    conf_scope(K_CODEGEN, "true")
    assert "*(1)" in plan()


def test_arrow_batch_knob_caps_mapinpandas_batches(spark, conf_scope):
    conf_scope(K_ARROW, "7")

    def batch_sizes(it):
        for b in it:
            yield pd.DataFrame({"n": [len(b)]})

    sizes = [
        r.n
        for r in spark.range(100)
        .repartition(1)
        .mapInPandas(batch_sizes, "n long")
        .collect()
    ]
    # 100 rows in one partition at batch 7 => 15 batches, none above 7;
    # if the key were a no-op the single default batch would hold all 100
    assert max(sizes) <= 7, sizes
    assert len(sizes) >= 15, sizes
    assert sum(sizes) == 100, sizes


def test_broadcast_knob_flips_unhinted_join_strategy(spark, conf_scope):
    conf_scope(K_AQE, "false")  # static executedPlan for inspection

    def plan() -> str:
        df = spark.range(1000).join(spark.range(10), "id")
        return df._jdf.queryExecution().executedPlan().toString()

    conf_scope(K_BCAST, "10MB")
    assert "BroadcastHashJoin" in plan()
    conf_scope(K_BCAST, "-1")
    off = plan()
    assert "BroadcastHashJoin" not in off, off


def test_vectorized_knob_toggles_columnar_scan(spark, conf_scope):
    path = "/root/testdata/sf0.001/nation.parquet"

    def plan() -> str:
        df = spark.read.parquet(path).selectExpr("n_nationkey + 1 AS k")
        return df._jdf.queryExecution().executedPlan().toString()

    conf_scope(K_VEC, "true")
    assert "ColumnarToRow" in plan()
    conf_scope(K_VEC, "false")
    off = plan()
    assert "ColumnarToRow" not in off, off
    # the knob changes the DECODER, never the DATA
    conf_scope(K_VEC, "true")
    on_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    conf_scope(K_VEC, "false")
    off_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert on_rows == off_rows


def test_split_knobs_shatter_a_single_file_scan(spark, conf_scope):
    path = "/root/testdata/sf0.001/lineitem.parquet"
    base = spark.read.parquet(path).rdd.getNumPartitions()
    conf_scope(K_SPLIT, "65536")
    conf_scope(K_OPEN, "0")
    shattered = spark.read.parquet(path).rdd.getNumPartitions()
    # ~MB-scale file at 64 KiB splits: many input partitions (most
    # EMPTY — parquet splits only at row-group boundaries), and strictly
    # more than the default layout produced
    assert shattered > base, (base, shattered)
    assert shattered >= 4, shattered


def test_ansi_knob_toggles_strict_arithmetic(spark, conf_scope):
    """ANSI on: int division by zero raises; ANSI off: legacy NULL.
    The ansi_off axis is vacuous unless this key really flips the
    engine mode at runtime."""
    conf_scope(K_ANSI, "false")
    assert spark.sql("SELECT 1 / 0 AS x").collect()[0].x is None
    conf_scope(K_ANSI, "true")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|ArithmeticException"):
        spark.sql("SELECT 1 / 0 AS x").collect()
