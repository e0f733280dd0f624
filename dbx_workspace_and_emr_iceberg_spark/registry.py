"""Query registry — backbone of the driver contract (__spark_entry__.py).

Every operator claimed as done in SURVEY.md §2 registers here as a
(name, pyspark_fn, oracle_sql) triple:

    @register("a1_hash_aggregate", oracle=\"\"\"SELECT ...\"\"\")
    def a1(spark: SparkSession, sf_dir: str) -> DataFrame: ...

``oracle=None`` marks a genuinely non-SQL-expressible op (streaming,
LSH, lakehouse DML): the driver then applies a rows-only check, and the
query function must self-verify internally (raise on violated
invariants).

Discipline enforced here (FIXTURES.md harness notes):
  * every computed column aliased identically on both sides,
  * doubles rounded on both sides where partition order could flip ulps,
  * collect_list/array_agg sorted before comparison.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

#: queries/ submodules that populate the registry on import.
#:
#: ORDER IS THE DRIVER'S EXECUTION ORDER. The round-1 driver run was
#: time-budgeted and stopped at registration #50, leaving every family
#: after queries/joins.py without a correctness row. Families the driver
#: has not yet proven (or whose queries were just fixed) register FIRST;
#: the 22 TPC-H shapes — all green in round 1 — register LAST so a
#: budget cutoff costs re-proving the already-proven, not the untested.
_QUERY_MODULES = [
    "projections",      # p1/p5 fixed this round — must be re-verified
    "windows",
    "sorts_sets",
    "scalar_functions",
    "semi_structured",
    "dedup_queries",
    "similarity_queries",
    "text_queries",
    "multimodal_queries",
    "udf_queries",
    "format_queries",
    "datasource_queries",
    "extras",
    "lakehouse_queries",
    "streaming_queries",  # slowest untested family: after the cheap ones
    "aggregations",
    "joins",
    "pricing",
    "tpch_queries",
    "tpch_suite2",
]


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


_LOADED = False
# module name -> error string, for the import smoke test to assert empty
_BROKEN_MODULES: dict[str, str] = {}


def _load_all() -> None:
    # An emptiness check is wrong here: importing any queries module
    # directly (as __spark_entry__ does for the flagship) pre-populates
    # the registry and would mask every other module.
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(f"{__package__}.queries.{mod}")
        except ModuleNotFoundError as e:
            if e.name == f"{__package__}.queries.{mod}":
                # The module itself is absent: allow partially-built
                # trees during development, silently. Exact-name match —
                # a substring test would also silently swallow a typo'd
                # sibling import whose name merely shares this prefix.
                continue
            # A ModuleNotFoundError for anything ELSE (typo'd internal
            # import, missing third-party dep) is a broken module, not
            # a missing one — quarantine like any other import failure.
            _quarantine(mod, e)
        except Exception as e:  # SyntaxError, bad import, etc.
            _quarantine(mod, e)


def _quarantine(mod: str, e: Exception) -> None:
    # A broken module must cost ONLY its own registrations — round 4
    # lost all 162 queries to one unclosed paren. Loud on stderr so
    # tests/test_imports.py and humans both see it.
    import sys

    print(
        f"[registry] SKIPPING queries.{mod}: {type(e).__name__}: {e}",
        file=sys.stderr,
    )
    _BROKEN_MODULES[mod] = f"{type(e).__name__}: {e}"


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


#: Driver front-load list, refreshed each round from CORRECTNESS_r0N.
#: Round-6 basis (CORRECTNESS_r05): 47/50 hash-green — those names are
#: DROPPED so the ~50-query budget converts unproven surface into hard
#: signal instead of re-proving the proven. Remaining priorities:
#:   1. t11/t12 — the ONLY oracled queries with no driver row ever
#:      (registrations #49-50 in r5, budget-missed);
#:   2. the r3 NTZ casualties, fixed in r5 but never driver-re-run since
#:      the NTZ migration (stale-green);
#:   3. the three r5 FAILs, root-caused and fixed this round
#:      (p1/p5 DECIMAL→DOUBLE canonicalization, d2 half-even rounding);
#:   4. queries newly added in round 6 — never driver-run.
_DRIVER_PRIORITY = [
    # only oracled queries never driver-checked (r5 budget positions #49-50)
    "t11_stream_hash_split",
    "t12_rocksdb_state_store",
    # r3 NTZ casualties, fixed r5, not re-proven since the migration
    "w2_offset_analytic",
    "f5_map_funcs",
    "f7_json_funcs",
    "f7b_json_roundtrip",
    "x8_sessionization",
    # r5 FAILs, fixed this round
    "p1_projection",
    "p5_casts",
    "d2_scalar_pandas_udf",
    # new in round 6 — never driver-run
    "d1_python_udf",
    "f7c_variant",
    "u6_recursive_cte",
    "j11_nullsafe_join",
    "s12_observe_metrics",
    "x19_incremental_dedup",
    "s6_dynamic_partition_overwrite",
    "t13_max_files_per_trigger",
    "s2g_xml_roundtrip",
    "f9_listagg",
    "j12_lateral",
    "o5_tablesample",
    "s13_python_datasource",
    "t14_python_stream_source",
    "t8c_stream_stream_outer",
    "j13_bloom_runtime_filter",
    "x20_semantic_dedup",
    "w6_interval_range_frame",
    "a10_bitmap_distinct",
    "f10_collation",
    "x21_url_parsing",
    "t15_checkpoint_recovery",
    "m14_merge_schema_evolution",
    "u7_pipe_syntax",
    "f11_parameterized_sql",
    "d8_sql_scalar_function",
    "d9_sql_table_function",
    "t16_lakehouse_stream_source",
    "j14_scalar_subquery",
    "a11_group_by_all",
    "f12_sql_variables",
    "s14_binaryfile_source",
    "s15_hive_partitioned_write",
    "x22_bigram_lm",
    "f5c_map_higher_order",
    "x2d_mllib_minhash",
    "m15_catalog_namespace",
    "s16_nested_schema_pruning",
    "a12_regression_aggs",
    "f13_edit_distance",
    "f14_bitwise",
]


def queries_dict() -> dict[str, QueryFn]:
    """Driver execution order, three tiers:

      1. :data:`_DRIVER_PRIORITY` — oracled queries with no prior
         driver-green row (see its comment),
      2. every other ORACLED query in registration order,
      3. rows-only queries last: they yield the same weak row-count
         signal wherever they run, and the rows-only set (lakehouse DML
         lifecycles, streaming triggers) is also where most of the
         wall-clock lives."""
    qs = list(all_queries().values())
    prio = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}
    first = sorted((q for q in qs if q.name in prio), key=lambda q: prio[q.name])
    rest_oracled = [q for q in qs if q.oracle is not None and q.name not in prio]
    rows_only = [q for q in qs if q.oracle is None and q.name not in prio]
    return {q.name: q.fn for q in first + rest_oracled + rows_only}


def oracle_dict() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}
