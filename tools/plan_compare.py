"""Plan-identity check for refactors that are meant to be plan-neutral.

A query-source refactor that does not change the physical plan does
not invalidate its driver evidence — the query needs no
``registry._CHANGED_THIS_ROUND`` entry and no re-proof slot (r14: the
x33/x36 salted-switch extraction was verified this way, which let the
round ship an EMPTY changed list and clear the staleness backlog in
one pass).  This tool mechanizes the check:

    python tools/plan_compare.py <git-rev> <query> [query...]

For each named query it builds the frame twice — once from the module
version at ``git-rev`` (loaded side-by-side with ``registry.register``
neutered, since duplicate names raise) and once from the working tree
— and diffs the two ``executedPlan`` strings with expression ids and
plan ids stripped.  Exit 0 = all identical (evidence stays valid);
exit 1 = at least one differs (add those names to the changed list);
the unified diff is printed for each mismatch.

The normalizer intentionally strips ONLY ``#<digits>[L]`` attribute
ids and ``plan_id=<digits>`` / ``[id=#<digits>]`` markers: node types,
ordering, partitioning, and every literal stay significant, so a real
plan change (extra Project that survives collapse, moved Exchange,
changed pushdown) cannot hide.
"""

from __future__ import annotations

import difflib
import importlib.util
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def normalize(plan: str) -> str:
    """Strip per-session identifiers; keep everything structural."""
    plan = re.sub(r"#\d+L?", "#", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=", plan)
    plan = re.sub(r"\[id=#\]", "", plan)
    # lambda-variable and CSE counters are allocated from session-global
    # sequences (lambda x_9 vs lambda x_21, _common_expr_0 vs
    # _common_expr_1) — identical plans built earlier vs later in one
    # session otherwise read as DIFFERS (r16: x3's false positive)
    plan = re.sub(r"\blambda ([a-zA-Z]+)_\d+#", r"lambda \1#", plan)
    plan = re.sub(r"_common_expr_\d+", "_common_expr_", plan)
    return plan


def _module_path_for(query_name: str):
    """(module name, repo-relative path, function) for a registered
    query — the function's defining module is the file to time-travel."""
    from dbx_workspace_and_emr_iceberg_spark.registry import all_queries

    q = all_queries()[query_name]
    mod = sys.modules[q.fn.__module__]
    rel = os.path.relpath(mod.__file__, REPO)
    return q.fn.__module__, rel, q.fn.__name__


def _load_rev_module(rev: str, rel_path: str, alias: str):
    """Load one module file as of ``rev`` under ``alias``, with
    @register neutered (duplicate query names raise by design) and
    the real package set so relative imports resolve against the
    CURRENT tree — shared helpers are compared implicitly through the
    plan diff, not pinned."""
    from dbx_workspace_and_emr_iceberg_spark import registry

    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{rev}:{rel_path}"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False
    ) as f:
        f.write(src)
        tmp = f.name
    real_register = registry.register
    registry.register = lambda *a, **k: (lambda fn: fn)
    try:
        spec = importlib.util.spec_from_file_location(alias, tmp)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "dbx_workspace_and_emr_iceberg_spark.queries"
        sys.modules[alias] = mod
        spec.loader.exec_module(mod)
    finally:
        registry.register = real_register
        os.unlink(tmp)
    return mod


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    rev, names = argv[0], argv[1:]

    from dbx_workspace_and_emr_iceberg_spark.registry import all_queries
    from dbx_workspace_and_emr_iceberg_spark.session import get_spark

    qs = all_queries()
    unknown = [n for n in names if n not in qs]
    assert not unknown, f"unknown query names: {unknown}"

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    spark = get_spark(app_name="plan-compare", cpus=8)
    rc = 0
    for i, name in enumerate(names):
        modname, rel, fnname = _module_path_for(name)
        old_mod = _load_rev_module(rev, rel, f"__plan_cmp_old_{i}")
        old_fn = getattr(old_mod, fnname)
        new_fn = qs[name].fn
        p_old = normalize(
            old_fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        p_new = normalize(
            new_fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        spark.catalog.clearCache()
        if p_old == p_new:
            print(f"{name}: IDENTICAL vs {rev}")
        else:
            rc = 1
            print(f"{name}: DIFFERS vs {rev}")
            for l in difflib.unified_diff(
                p_old.splitlines(), p_new.splitlines(), lineterm=""
            ):
                print("   ", l)
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
