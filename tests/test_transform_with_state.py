"""transformWithStateInPandas (Spark 4 StatefulProcessor API) — T7's
modern sibling: ValueState/ListState/MapState, timers, TTL.

ENV GATE: the state-protocol bridge imports google.protobuf
(pyspark/sql/streaming/proto/StateMessage_pb2). This image has no
protobuf and no network to install one (verified: the query fails in
TransformWithStateInPySparkPythonPreInitRunner with `ImportError:
cannot import name 'descriptor' from 'google.protobuf'`), so the test
skips here and runs on any environment with `pip install protobuf` —
the same skip-gating pattern as the Iceberg runtime jars
(tests/test_iceberg_integration.py, docs/SCALE.md).

applyInPandasWithState (t7, hash-verified) remains the proven custom
stateful path in this sandbox; the two APIs cover the same operator
family (SURVEY.md §2.9 T7).
"""

from __future__ import annotations

import importlib.util

import pytest

from tests.conftest import SF_DIR

needs_protobuf = pytest.mark.skipif(
    importlib.util.find_spec("google") is None
    or importlib.util.find_spec("google.protobuf") is None,
    reason="transformWithStateInPandas requires google.protobuf "
    "(not installed in this image; no network egress)",
)


@needs_protobuf
def test_transform_with_state_counts_match_batch(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from dbx_workspace_and_emr_iceberg_spark.streaming.jobs import (
        events_stream,
        run_to_memory,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.count = handle.getValueState("count", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = self.count.get()[0] if self.count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self.count.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

        def close(self) -> None:
            pass

    s = events_stream(spark, SF_DIR).select("user_id", "event_type")
    res = s.groupBy("user_id").transformWithStateInPandas(
        CountProcessor(),
        outputStructType="user_id bigint, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )
    out = run_to_memory(res, "update")
    got = {r.user_id: r.n_events for r in out.collect()}
    want = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
