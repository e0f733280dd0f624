"""Driver-style correctness gate: every registered oracle-able query
must match its DuckDB twin at sf0.001 (the driver re-runs this at
sf0.01; same semantics, bigger data).

Queries registered with ``oracle=None`` are exercised for rows>=0 and
must self-verify internally.
"""

from __future__ import annotations

import pytest

from dbx_workspace_and_emr_iceberg_spark.registry import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES), ids=str)
def test_query_matches_oracle(name, oracle_check, spark):
    q = QUERIES[name]
    if q.oracle is None:
        from tests.conftest import SF_DIR, _audit_windows

        df = q.fn(spark, SF_DIR)
        _audit_windows(name, df)
        assert df.count() >= 0
    else:
        oracle_check(q)
