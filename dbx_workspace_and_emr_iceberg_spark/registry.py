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
#: Round-8 basis (CORRECTNESS_r07): 50/50 hash-green, the oracled-unrun
#: backlog is EMPTY — every prior-round name DROPPED. This round's
#: front-load, per the r7 verdict "Next round" item #2:
#:   1. the 4 queries whose oracle or implementation changed in r8
#:      (x20 newly value-oracled, x37 respelled via chunked prefix
#:      rank, qd6's cap changed both sides of the contract, x25
#:      refactored onto table_profile) — each needs a fresh hash row;
#:   2. the round-8 additions — each needs its FIRST hash-green row
#:      (an unproven new query outranks re-sampling a pytest-covered
#:      rows-only one, so these precede tier 3);
#:   3. the 35 rows-only queries that have NEVER had any driver row
#:      (pytest-only evidence until now): lakehouse DML lifecycles,
#:      streaming, LSH/ANN recall suites, multimodal stubs — a budget
#:      cut costs the tail entries, whose oracled twins are already
#:      cumulative-green.
_DRIVER_PRIORITY = [
    # 1. changed oracle/implementation in r8 — re-prove first
    "x20_semantic_dedup",
    "qd6_basket_pairs",
    "x37_quality_ensemble",
    "x25_table_profile",
    # 2. round-8 additions — each needs its first hash-green row
    "f20_variant_type",
    "f21_session_variables",
    "f22_try_arithmetic",
    "f23_star_sugar",
    "x38_dsir_importance",
    "x39_soft_dedup_weights",
    "x40_unimax_mixture",
    "x41_ngram_overlap",
    "x43_perplexity_buckets",
    "x44_line_filtering",
    "x45_inverted_index",
    "t18_stream_dedup_history",
    "qd9_funnel_analysis",
    "qd10_rfm_segmentation",
    "x46_bpe_merges",
    "x47_countmin_heavy_hitters",
    "x2e_lsh_value_oracle",
    "qd11_lasttouch_attribution",
    "x48_corpus_drift",
    # 3. first-ever driver rows for the rows-only tail (r7 verdict
    #    #2) — ordered so a budget cut drops the least-critical:
    #    the x3d/x3g entries last (their oracled twins are already
    #    cumulative-green)
    "m1_lakehouse_dml_lifecycle",
    "m5_lakehouse_maintenance",
    "m6_lakehouse_schema_evolution",
    "m6b_rename_drop_column",
    "m7_partition_transforms",
    "m8_branches_wap",
    "m8b_sql_branch_lifecycle",
    "m9_stats_file_skipping",
    "m10_incremental_cdc",
    "m11_sorted_clustering",
    "m12_sql_dml_door",
    "m13_zorder_clustering",
    "m16_sql_time_travel",
    "m17_column_defaults",
    "m18_call_procedures",
    "m20_pure_sql_lifecycle",
    "t1b_rate_source",
    "t5_watermark_append_finalize",
    "t9_stream_to_lakehouse",
    "t10_stream_merge_upsert",
    "t17_streaming_listener",
    "s18_file_ingest_options",
    "s2e_csv_malformed_modes",
    "o4_sort_within_partitions",
    "a5c_hll_mergeable",
    "f8c_native_ids",
    "x2_minhash_lsh",
    "x12b_lsh_dedup_pipeline",
    "x24_bloom_contamination",
    "x3b_ann_lsh",
    "x3e_ivf_ann",
    "x5b_decode_pipeline",
    "x5c_frame_sampling",
    "x3d_topk_vectorized",
    "x3g_topk_vectorized_bench",
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
