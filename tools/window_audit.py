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
and prints findings; exits nonzero if any.
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

# Tokens that exonerate a spec: the chunked-kernel co-keys. A window
# on (lang, chunk) is the RESPELLED shape — each key's rows split
# across n_chunks tasks (operators/skew.py).
CHUNK_TOKENS = ("chunk",)

# Reviewed exceptions: (query_name, substring of the offending spec) ->
# reason the window input is bounded. Keep each entry justified; an
# unexplained addition here is a review finding, not a fix.
ALLOWLIST: dict[tuple[str, str], str] = {
    ("qd2_yoy_growth", "c_mktsegment"): (
        "lag window runs over the POST-AGGREGATE |segment|x|year| "
        "frame (<= 5*7 rows at any scale) - VERDICT r12 'safe at any "
        "scale'"
    ),
    ("qd9_funnel_analysis", ""): (
        "lag over the per-stage aggregate union - |funnel| = 4 rows "
        "at any scale (funnel_stages docstring)"
    ),
    ("w1_ranking", "p_brand"): (
        "the W1 SEMANTICS demo of all six native ranking functions on "
        "the part DIM table (bounded per-brand cardinality); its own "
        "docstring carries the scale note (r10 verdict #7) pointing "
        "fact-side scores at w5b/qd8/chunked_percent_ranks"
    ),
    ("w5_ntile_deciles", ""): (
        "the W5 SEMANTICS demo of native ntile over the per-customer "
        "rollup; w5b_distributed_ntile is the 100 TB respell and "
        "hash-matches it (w5 docstring)"
    ),
    ("x40_unimax_mixture", ""): (
        "closed-form waterfill windows run over the |lang x source| "
        "strata aggregate (<= 100 rows at any scale; 'strata-row "
        "frame from here on' comment in unimax_waterfill)"
    ),
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
    self-reference constant (false positive on high-card keys)."""
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
                if any(t in c.split("#", 1)[0] for t in CHUNK_TOKENS)
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
            if any(
                q == name and ((s in spec) if s else not spec.strip())
                for (q, s) in ALLOWLIST
            ):
                # empty-substring entries match ONLY the empty (global)
                # spec — `"" in spec` is vacuously true for every spec
                # and would wildcard-exempt the whole query
                # (review-pass r13)
                continue
            findings.append(
                f"{name}: low-cardinality{' (global)' if not spec else ''} "
                f"window partition [{spec}] with no chunk co-key / "
                f"WindowGroupLimit / allowlist entry — one key's rows "
                f"funnel through ONE task at scale"
            )
    return findings


def audit_frame(name: str, df) -> list[str]:
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
    spark = get_spark(app_name="window-audit", cpus=8)
    names = argv or sorted(qs)
    bad: list[str] = []
    for n in names:
        try:
            df = qs[n].fn(spark, sf_dir)
            found = audit_frame(n, df)
        except Exception as e:  # noqa: BLE001 — audit sweep, not a test
            print(f"  {n}: SKIP ({type(e).__name__}: {e})")
            continue
        finally:
            # clear on BOTH paths: a raising query's pinned caches
            # must not leak into the remaining sweep (the VERDICT r12
            # #4 accumulation problem; review-pass r13)
            spark.catalog.clearCache()
        for f in found:
            print("  FLAG", f)
        bad += found
    print(f"{len(bad)} finding(s) over {len(names)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv[1:]))
