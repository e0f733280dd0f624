"""Import smoke test — no Spark session needed, runs in milliseconds.

Round 4 shipped a one-line SyntaxError in queries/joins.py that zeroed
the entire driver contract (CORRECTNESS_r04 = {}, bench rc=1). This test
makes that class of bug fail loudly and instantly: every source file
must compile, every queries module must import, and the registry must
hold its full complement.
"""

from __future__ import annotations

import compileall
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dbx_workspace_and_emr_iceberg_spark",
)


def test_package_compiles():
    assert compileall.compile_dir(PKG, quiet=1, force=True), (
        "a source file in the package fails to compile — see stderr"
    )


def test_no_broken_query_modules():
    from dbx_workspace_and_emr_iceberg_spark.registry import (
        _BROKEN_MODULES,
        all_queries,
    )

    all_queries()
    assert _BROKEN_MODULES == {}, f"query modules failed to import: {_BROKEN_MODULES}"


def test_registry_full():
    from dbx_workspace_and_emr_iceberg_spark.registry import all_queries

    n = len(all_queries())
    assert n >= 160, f"registry shrank to {n} queries (expected >= 160)"


def test_driver_contract_importable():
    import __spark_entry__ as entry

    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert len(qs) >= 160
    assert set(os_) <= set(qs), "oracle_sql keys must be a subset of queries"


def test_driver_priority_names_resolve():
    # a typo'd priority name is silently ignored by queries_dict — the
    # query would quietly lose its front-of-budget slot
    from dbx_workspace_and_emr_iceberg_spark import registry

    qs = registry.all_queries()
    missing = [n for n in registry._DRIVER_PRIORITY if n not in qs]
    assert not missing, f"priority names not in registry: {missing}"
    assert len(set(registry._DRIVER_PRIORITY)) == len(registry._DRIVER_PRIORITY)
