"""Property-based tests (hypothesis) for the custom operators whose
semantics Spark doesn't give us for free — the as-of join emulation and
the snapshot-layer CDC changelog. Randomized inputs vs a brute-force
Python reference; SURVEY.md §5's answer to "the reference has no tests".

Example counts are small because every example is a real Spark job; the
generators are biased toward the edges that matter (empty sides, tied
timestamps across keys, duplicate rows, op sequences ending in rewrite).
"""

from __future__ import annotations

import shutil
import tempfile
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbx_workspace_and_emr_iceberg_spark.operators.asof import asof_join
from dbx_workspace_and_emr_iceberg_spark.sources.lakehouse import LakehouseTable

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=50)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def asof_inputs(draw):
    left = draw(st.lists(st.tuples(KEYS, TS), max_size=12))
    # unique (key, ts) on the right: ties between right rows at the same
    # instant are unordered in any ASOF definition, so don't generate them
    right_map = draw(
        st.dictionaries(st.tuples(KEYS, TS), st.integers(-5, 5), max_size=12)
    )
    right = [(k, ts, v) for (k, ts), v in right_map.items()]
    return left, right


@given(asof_inputs())
@SLOW
def test_asof_join_matches_bruteforce(spark, case):
    left, right = case
    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], "k int, lts int, rowid int"
    )
    rdf = spark.createDataFrame(right, "k int, rts int, v int")
    got = {
        r.rowid: r.v_right
        for r in asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts").collect()
    }
    for i, (k, ts) in enumerate(left):
        matches = [(rts, v) for (rk, rts, v) in right if rk == k and rts <= ts]
        want = max(matches)[1] if matches else None
        assert got[i] == want, f"row {i} key={k} ts={ts}: {got[i]} != {want}"


@given(asof_inputs(), st.sampled_from([3, 7, 10]))
@SLOW
def test_asof_bucketed_equals_plain(spark, case, bucket_s):
    """The skew-proof bucketed variant must be answer-identical to the
    base operator for ANY input and bucket width — tiny buckets force
    many boundary crossings, the failure mode that matters."""
    from dbx_workspace_and_emr_iceberg_spark.operators.asof import (
        asof_join_bucketed,
    )

    left, right = case
    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], "k int, lts int, rowid int"
    )
    rdf = spark.createDataFrame(right, "k int, rts int, v int")
    plain = {
        r.rowid: (r.v_right, r.rts_right)
        for r in asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts").collect()
    }
    bucketed = {
        r.rowid: (r.v_right, r.rts_right)
        for r in asof_join_bucketed(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts", bucket_s=bucket_s
        ).collect()
    }
    assert bucketed == plain


class _Append:
    def __init__(self, rows):
        self.rows = rows


class _DeleteAbove:
    def __init__(self, threshold):
        self.threshold = threshold


class _Overwrite:
    def __init__(self, rows):
        self.rows = rows


ROWS = st.lists(st.integers(0, 9), min_size=1, max_size=6)
OPS = st.lists(
    st.one_of(
        ROWS.map(_Append),
        st.integers(0, 9).map(_DeleteAbove),
        ROWS.map(_Overwrite),
    ),
    min_size=1,
    max_size=4,
)


@given(ROWS, OPS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_changelog_reconciles_any_op_sequence(spark, initial, ops):
    wh = tempfile.mkdtemp(prefix="lh_prop_")
    try:
        t = LakehouseTable(spark, wh, "t")
        t.create(spark.createDataFrame([(v,) for v in initial], "v int").coalesce(1))
        state = Counter(initial)
        for op in ops:
            if isinstance(op, _Append):
                t.append(
                    spark.createDataFrame([(v,) for v in op.rows], "v int").coalesce(1)
                )
                state.update(op.rows)
            elif isinstance(op, _DeleteAbove):
                t.delete_where(F.col("v") > op.threshold)
                state = Counter({v: n for v, n in state.items() if v <= op.threshold})
            else:
                t.overwrite(
                    spark.createDataFrame([(v,) for v in op.rows], "v int").coalesce(1)
                )
                state = Counter(op.rows)
        chg = t.changelog(0).collect()
        net = Counter()
        for r in chg:
            net[r.v] += 1 if r._change_type == "INSERT" else -1
        assert net == state, f"changelog net {dict(net)} != state {dict(state)}"
    finally:
        shutil.rmtree(wh, ignore_errors=True)
