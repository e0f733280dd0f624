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


#: Driver front-load list, refreshed each round from CORRECTNESS_r0N.
#: Round-7 basis (CORRECTNESS_r06): 39 hash-green + 11 rows-only, zero
#: failures — every prior-round name DROPPED. The r6 verdict identifies
#: exactly 12 oracled queries with no driver row ever (implemented and
#: locally green in r6, but outside r6's 50-query budget); they are the
#: entire front-load so CORRECTNESS_r07 converts them to hard signal.
#: After them: queries newly added/re-oracled in round 7.
_DRIVER_PRIORITY = [
    # the 12 oracled-unrun queries (r6 verdict "Next round" item #1)
    "a13_selector_aggs",
    "d10_arrow_python_udf",
    "f14_bitwise",
    "f15_binary_encodings",
    "f16_split_part",
    "j15_dynamic_partition_pruning",
    "j16_join_hints",
    "s17_text_source",
    "u8_union_coercion",
    "w7_ignore_nulls_fill",
    "x23_vocab_growth",
    "x25_table_profile",
    # round-7 additions / upgraded oracles — never driver-run
    "o5_tablesample",
    "s14_binaryfile_source",
    "x27_paragraph_dedup",
    "x28_mixture_temperature",
    "x26_corpus_shuffle",
    "f17_sql_scripting",
    "s13b_pyds_filter_pushdown",
    "x29_random_projection",
    "d11_polymorphic_udtf",
    "f18_time_type",
    "d12_table_arg_udtf",
    "w5b_distributed_ntile",
    "x7_stratified_sample",
    "x30_upsampled_mixture",
    "x31_curation_pipeline_v2",
    "qd1_share_of_parent",
    "qd2_yoy_growth",
    "qd3_moving_average",
    "qd4_mix_shift",
    "x32_cluster_safe_splits",
    "x33_host_quota",
    "x34_dup_span_detect",
    "x35_host_pagerank",
    "qd5_cohort_retention",
    "qd6_basket_pairs",
    "qd7_order_gap_histogram",
    "qd8_percentile_report",
    "f19_identifier_clause",
    "x36_governance_pipeline",
    "x37_quality_ensemble",
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
