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
#: Module order is IMPORT order only (side-effects + duplicate-name
#: detection). It has NOT been the driver's execution order since r9:
#: queries_dict() derives that ordering from driver_history
#: (changed-this-round, never-sampled, stalest-green) — reordering this
#: list changes nothing about which queries the driver budget reaches.
#: (The historical round-1 rationale below is kept for archaeology
#: only; review-pass r15 removed its stale ORDER-IS-EXECUTION claim.)
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
#: other ordering decision is derived by driver_history.py at IMPORT
#: time from the CORRECTNESS_r0*.json record (r14: no generated file,
#: no per-round regeneration ritual — a result file dropped after the
#: final commit refreshes the ordering instead of going stale), so the
#: r9 failure mode — a stale hand list re-proving 50 already-green
#: rows while 8 queries stayed never-sampled — cannot recur:
#: never-sampled and stalest-green rows float to the front
#: automatically.  Add a name here when you change its plan or oracle;
#: delete the whole list's content at the start of the next round (the
#: derived maps then carry the evidence).
#:
#: Round-15 entries (TWO — exactly the spare budget above the 48-query
#: <=r7 staleness backlog, so the backlog still clears completely per
#: VERDICT-r14 #1).  The pruned_files/read_pruned temporal type-gate
#: fixes (VERDICT-r14 #2 + ADVICE) needed NO entries: they alter only
#: bound literals inside the pruning path, and all six affected queries
#: (m7/m7b/m9/m11/m13/p3) re-verified hash-identical via a scoped sim
#: at sf0.01, so their driver evidence stays valid.
_CHANGED_THIS_ROUND = [
    # r17 (VERDICT-r16 #1): x1c's keep/drop gate respelled from a raw
    # float cosine >= 0.98 to the x20/x49 integer-exact rational
    # predicate (dd > 0 AND dd²·2500 ≥ 2401·n2a·n2b over quantized
    # unit vectors, decimal(38,0)/HUGEINT), oracle in lockstep; the
    # display cosine now derives from the same integers after the
    # gate.  Plan AND oracle changed; scoped sim hash-green.
    "x1c_embedding_neardup",
    # r17 (VERDICT-r16 #6): the registry's last rows-only query gains
    # a full value oracle — x3g now runs the numpy-matmul top-k over
    # quantized unit vectors (cosine_topk_int_vectorized), where every
    # float64 partial sum is an exact integer, ranking by x3h's
    # sign(dd)·((dd²·scale) div n2) key; shares _X3H_ORACLE.  Plan and
    # oracle changed; scoped sim hash-green, registry now 296/296
    # oracled.  (build_bloom's r17 tree-merge needed NO entries: the
    # bitmap literal embedded in x24/t18's returned plans is
    # value-identical — OR is associative — and both re-verified
    # hash-green by scoped sim.)
    "x3g_topk_vectorized_bench",
    # r17 review batch over aggregations/windows (each reproduced
    # first, all re-verified hash-green by scoped sim):
    # a13: composite struct orderer for max_by/min_by — the fixtures DO
    #   carry within-priority price ties (61 groups at sf0.1; the old
    #   "tie-free" doc claim was false), so a bare max_by was
    #   engine-arbitrary one fixture regen away; oracle respelled as
    #   max(struct).k.  Extremum-tie regression test added.
    "a13_selector_aggs",
    # a2: sum_price now sums DECIMAL(18,2) (w3 boundary rule) — the
    #   unnormalized float sum's partition-order error crosses the
    #   0.005 rounding guard around sf10; oracle in lockstep.
    "a2_core_aggs_global",
    # a5: HLL self-check bound honest at 6 sigma of rsd=0.02 (12%) —
    #   the 2.5-sigma 5% bound gave each (fixture, group) a ~1% chance
    #   of deterministic red; column renamed in both engines.
    "a5_approx_aggs",
    # a10: ONE lineitem scan via explode+pivot instead of a scan per
    #   key column joined back (2 scans + 4 shuffles + 1 join -> 1
    #   scan + 2 aggregates); values identical.
    "a10_bitmap_distinct",
    # w5b: spend frame cached across its 4 actions (was 3 full
    #   re-executions) and chunk count derived from the data (fixed 8
    #   = n/8-row sort tasks at any scale, the chokepoint the query
    #   exists to eliminate); values identical at the fixtures.
    "w5b_distributed_ntile",
    # r17 review batch over text/dedup self-check vacuity (reproduced
    # first, scoped sim green):
    # x8: oracle gap predicate respelled date_diff('second') to match
    #   Spark's second-floor diff — the microsecond INTERVAL predicate
    #   sessionized sub-second gaps in (1800s, 1801s) differently.
    "x8_sessionization",
    # x44: the within-doc duplicate-line plant PREPENDS (8-aligned —
    #   guaranteed dup per planted doc) instead of appending (~7/8
    #   vacuous); plant-coverage assert added; oracle in lockstep.
    "x44_line_filtering",
    # x35/x37: oracle's per-edge PageRank term parenthesized
    #   r*(w/wout) to match the operator's precomputed-probability op
    #   sequence (was (r*w)/wout — different rounding association).
    "x35_host_pagerank",
    "x37_quality_ensemble",
    # x31: per-language sampling rate respelled integer-exact
    #   (quantized sqrt + HUGEINT/decimal floor div) — the float
    #   z=sum(sqrt(c)) could shift a lang's basis points by 1 ulp of
    #   summation order and flip the boundary hash bucket; oracle in
    #   lockstep.  (x2's new 50k collect cap and x49's vacuous
    #   bench-leak assert removal change no returned plan/values.)
    "x31_curation_pipeline_v2",
    # r17 review batch over extras/tpch_suite2/projections (reproduced
    # first, scoped sim green). The rounding-mode class: Spark rounds
    # the shortest decimal repr HALF_UP, DuckDB rounds the binary
    # value — any round(raw_double, k) display can split on a
    # (k+1)-th-decimal half-tie, so these respell display rounding as
    # integer floor-division over exact cent/scale-4 sums:
    "q2_min_cost_supplier",
    "q8_market_share",
    "f11_parameterized_sql",
    "f19_identifier_clause",
    "f22_try_arithmetic",
    # p1: concat (NULL-propagating) replaces concat_ws to match the
    #   oracle's semantics; p2b: the infix-LIKE probe matches real
    #   fixture tokens ('%gear%' — '%ivory%' matched ZERO rows at
    #   every sf, half the probe permanently vacuous); p5b: index 5
    #   exercises BOTH the in-bounds lookup and NULL-past-end (10 was
    #   OOB for every row).
    "p1_projection",
    "p2b_filter_like",
    "p5b_try_functions",
    # a5c: daily+merged HLL bound flags now hash-backed (raises before
    #   the flags removed — the documented hash-red path was dead
    #   code) and honest at 10% ≈ 6 sigma; schema/oracle changed.
    #   (x7's raise removal changes no returned schema/values.)
    "a5c_hll_mergeable",
    # r17 joins/scalar review (reproduced first, scoped sim green;
    # exactly three slots left in the 50-sample budget after the 21-
    # query r10 staleness cohort — the remaining branch-liveness
    # findings are documented in docs/SCALE.md for r18):
    # j9: decimal(18,4)-hop revenue sum (j16's rule) — two sf0.01
    #   group tails sit one ten-thousandth from the .xx5 half-boundary
    #   where summation order decides the rounded cent.
    "j9_star_multiway",
    # j3b: anti-join against the high-value order subset — the old
    #   unfiltered right side matched EVERY customer, so the gate
    #   compared two empty sets (a left_anti regression could never
    #   red it); now returns 40 rows, j3's exact complement.
    "j3b_anti",
    # f2: oracle epoch spelled floor(epoch(ts)) — CAST rounds in
    #   DuckDB while Spark unix_timestamp floors; identical today only
    #   because orders timestamps carry no fractional seconds.
    #   (f8c's new mono/h32 checks change no returned schema/values.)
    "f2_date_funcs",
    # r17 late batch — the previously-deferred regen hazards, landed
    # after recount showed |changed ∪ r10-cohort| = 49 ≤ 50 (j3b and
    # x3g overlap the cohort). Scoped sim green on all six:
    # d3/d4: pandas UDF money arithmetic respelled integer-exact (d2's
    #   rule) — d3's float64 wavg sat 6.9e-6 from a 4-decimal boundary
    #   and d4 carried a GROUP-level half-cent tie lottery (pandas
    #   half-even vs DuckDB half-away).
    "d3_grouped_agg_udaf",
    "d4_grouped_map",
    # f1: the oracle's initcap emulation now lowercases word tails and
    #   passes empty tokens through — it diverged from Spark initcap
    #   on any uppercase tail or doubled space (fixture has neither).
    "f1_string_funcs",
    # j2/j2b/j14: outer-join and empty-group branches made
    #   structurally LIVE (the gate compared inner-join-equivalent
    #   results before): j2 left-joins the high-value order subset
    #   (~40 zero-match customers), j2b dangles BOTH full-outer sides
    #   via complementary filters, j14 adds three phantom nations so
    #   the scalar-subquery COUNT-bug case (max=NULL, count=0) is in
    #   the hashed output at every scale.
    "j2_left_outer",
    "j2b_full_outer",
    "j14_scalar_subquery",
    # f4c: has_large probes |x| > 0.3 instead of the structurally-
    #   impossible 2 (unit vectors) — both branches now in the hashed
    #   output (31/19 at sf0.01). This fills the 50th and final
    #   sample slot: |changed ∪ r10-cohort| = 50 exactly.
    "f4c_higher_order",
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
    the driver_history maps, themselves folded at import time from the
    CORRECTNESS_r*.json record (r14 — no generated file, no
    regeneration ritual).  The per-round driver samples
    ~50 entries in this dict order, so the budget always lands on the
    rows with the least (or invalidated) evidence; a budget cut costs
    re-proving the freshest greens, never the untested."""
    qs = sorted(all_queries().values(), key=_driver_order_key)
    return {q.name: q.fn for q in qs}


def oracle_dict() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}
