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
    "tpch_suite3",
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


#: Queries whose ORACLE STRING or PHYSICAL PLAN changed since their
#: last driver-green row — the only hand-maintained list left.  Every
#: other ordering decision is derived from driver_history.py (generated
#: by tools/gen_driver_history.py from the CORRECTNESS_r0*.json record),
#: so the r9 failure mode — a stale hand list re-proving 50
#: already-green rows while 8 queries stayed never-sampled — cannot
#: recur: never-sampled and stalest-green rows float to the front
#: automatically.  Add a name here when you change its plan or oracle;
#: delete the whole list's content after the round's CORRECTNESS lands
#: green (regenerating driver_history.py then carries the evidence).
#:
#: Round-11 entries:
_CHANGED_THIS_ROUND = [
    # r11: respelled onto per-key chunked discrete-rank machinery
    # (r10 verdict #2 — the last Window.partitionBy(low-card key))
    "qd8_percentile_report",
    # r11: new value-oracled twin of m7 (r10 verdict #3)
    "m7b_partition_evolution_values",
    # r11: new end-to-end value-oracled LSH pipeline (r10 verdict #4)
    "x12c_lsh_pipeline_values",
    # r11: converted rows-only -> contract-oracled (r10 verdict #5)
    "x3e_ivf_ann",
    # r11: adaptive bloom sizing + cached digest frame + parallel-md5
    # source write (r10 verdict #6)
    "t18_stream_dedup_history",
    # r11: new value-oracled twins for previously rows-only families
    "s6b_dynamic_overwrite_values",
    "m20b_sql_lifecycle_values",
    "s7b_metadata_tables_values",
    # r11: rows-only -> value/contract-oracled conversions (outputs
    # were already fixture-derivable; t17/m18 outputs respelled to
    # deterministic flags)
    "m15_catalog_namespace",
    "m16_sql_time_travel",
    "m18_call_procedures",
    "s18_file_ingest_options",
    "s2e_csv_malformed_modes",
    "t14_python_stream_source",
    "t15_checkpoint_recovery",
    "t16_lakehouse_stream_source",
    "t17_streaming_listener",
    # r11 second wave: flag/summary respells -> oracled (o4 also
    # hardened: per-partition sortedness now checked across Arrow
    # batch boundaries)
    "t1b_rate_source",
    "t5_watermark_append_finalize",
    "t9_stream_to_lakehouse",
    "t13_max_files_per_trigger",
    "o4_sort_within_partitions",
    "a5c_hll_mergeable",
    "f8c_native_ids",
    "x3b_ann_lsh",
    "x2d_mllib_minhash",
    # r11: new GPT-style sequence-packing report on the chunked
    # distributed prefix sum
    "x50_sequence_packing",
    # r11: new cluster-balanced diversity sampling on the integer
    # k-means + md5 emission (full DuckDB replay)
    "x51_cluster_balanced_sample",
    # r11 third wave, ordered LAST (pure oracle additions, zero plan
    # change, so a driver-budget spill costs the least evidence): the
    # lifecycle step protocols value-oracled (m14 precedent — commit
    # versions sequential by construction, counts fixture-derivable)
    "m14_merge_schema_evolution",
    "m17_column_defaults",
    "m1_lakehouse_dml_lifecycle",
    "m12_sql_dml_door",
    "m20_pure_sql_lifecycle",
    "m6_lakehouse_schema_evolution",
    "m6b_rename_drop_column",
    "m10_incremental_cdc",
    "m5_lakehouse_maintenance",
    "s6_dynamic_partition_overwrite",
    "m8_branches_wap",
    "m8b_sql_branch_lifecycle",
    "t10_stream_merge_upsert",
]


def _driver_order_key(q: Query) -> tuple:
    """Sort key implementing (changed, never-sampled, stalest-green).

    Tier 0: _CHANGED_THIS_ROUND, in list order — a changed plan or
            oracle invalidates its old evidence, so these re-prove
            first.
    Tier 1: never driver-sampled — an unproven query outranks
            re-sampling any already-green one.
    Tier 2: everything else, stalest green round first; a query whose
            last sample FAILED (sampled but never green) sorts at
            last_green=0, i.e. ahead of every green row.  Ties break
            oracled-before-rows-only (stronger signal per driver slot),
            then name for determinism.
    """
    from . import driver_history as H

    if q.name in _CHANGED_SET:
        return (0, _CHANGED_SET[q.name], 0, "")
    if q.name not in H.LAST_SAMPLED:
        return (1, 0, 0 if q.oracle is not None else 1, q.name)
    return (
        2,
        H.LAST_GREEN.get(q.name, 0),
        0 if q.oracle is not None else 1,
        q.name,
    )


_CHANGED_SET = {n: i for i, n in enumerate(_CHANGED_THIS_ROUND)}


def queries_dict() -> dict[str, QueryFn]:
    """Driver execution order — DERIVED, not hand-curated (r9 verdict
    #2): (changed-this-round, never-sampled, stalest-green-first) from
    the generated driver_history maps.  The per-round driver samples
    ~50 entries in this dict order, so the budget always lands on the
    rows with the least (or invalidated) evidence; a budget cut costs
    re-proving the freshest greens, never the untested."""
    qs = sorted(all_queries().values(), key=_driver_order_key)
    return {q.name: q.fn for q in qs}


def oracle_dict() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}
