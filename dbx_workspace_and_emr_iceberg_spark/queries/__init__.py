"""SURVEY.md §2 operator inventory, one module per family.

Modules self-register into ..registry on import (see registry._load_all).
"""

if not __debug__:  # pragma: no cover — refuses before any query runs
    # The rows-only lifecycle queries carry their correctness contracts
    # as in-query `assert` statements (multiset parity, WAP isolation,
    # pruning subsets...). `python -O` / PYTHONOPTIMIZE strips asserts,
    # which would turn every such contract into a silent vacuous pass
    # while the step-count oracles stay green (review-pass r16) —
    # refuse loudly instead.
    raise RuntimeError(
        "dbx_workspace_and_emr_iceberg_spark.queries: in-query contracts "
        "use assert statements; running under -O/PYTHONOPTIMIZE strips "
        "them — run without optimization flags"
    )
