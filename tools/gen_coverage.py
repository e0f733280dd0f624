#!/usr/bin/env python
"""Regenerate COVERAGE.md: SURVEY.md §2 operator row → declared queries.

Queries marked * are rows-only (self-verifying, no DuckDB oracle — see
registry.py for the contract and docs/SELF_VERIFICATION.md for the
per-query invariant each one asserts)."""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbx_workspace_and_emr_iceberg_spark.registry import all_queries

NOT_APPLICABLE = """
Rows with no query by design (SURVEY.md §2.1):
- **S1** (Iceberg catalog scan): served by the snapshot table layer's
  manifest-governed `LakehouseTable.read()` (exercised by every `m*`
  query); the real-Iceberg catalog is a config swap
  (`sources/lakehouse.py::iceberg_session_conf`) — no jars offline.
- **S3** (object store): path-scheme swap (`s3a://`) on the same
  reader/writer; nothing testable without S3 (`sources/formats.py`).
- **S9/S10** (Glue grants / Trino federation): out of engine scope per
  SURVEY §2.1 — the DuckDB oracle harness plays the second-engine role.
"""


#: The pinned §2 tag inventory (review-pass r18): the rows used to be
#: derived solely from whatever tags live queries carried, so a row
#: that lost its LAST query silently vanished from COVERAGE.md and a
#: typo'd tag silently minted a bogus row — the exact row-side hole the
#: untagged-query guard below cannot see.  A DELIBERATE inventory
#: change (new operator row, retired row) must edit this list in the
#: same commit; anything else is drift and raises.
EXPECTED_TAGS = frozenset(
    ["flagship"]
    + [f"A{i}" for i in range(1, 14)]
    + [f"D{i}" for i in range(1, 13)]
    + [f"F{i}" for i in range(1, 24)]
    + [f"J{i}" for i in list(range(1, 10)) + list(range(12, 17))]
    + [f"M{i}" for i in [1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 17, 18, 20]]
    + [f"O{i}" for i in range(1, 6)]
    + [f"P{i}" for i in range(1, 6)]
    + [f"S{i}" for i in [1, 2, 4, 5, 6, 7, 8, 13, 14, 15, 16, 17, 18]]
    + [f"T{i}" for i in list(range(1, 11)) + [14, 15, 16, 17, 18]]
    + [f"U{i}" for i in [1, 2, 3, 4, 6, 7, 8]]
    + [f"W{i}" for i in range(1, 8)]
    + [
        f"X{i}"
        for i in list(range(1, 8))
        + [12, 13, 14, 16]
        + list(range(20, 42))
        + list(range(43, 50))
    ]
    + ["X2E"]
)


def main() -> None:
    qs = all_queries()
    by_tag: dict[str, list[str]] = defaultdict(list)
    untagged = [q.name for q in qs.values() if not q.tags]
    if untagged:
        # an untagged query would appear in the header COUNT but in no
        # operator row — the coverage audit silently under-reporting
        # exactly what it audits (review-pass r16)
        raise SystemExit(f"queries with no §2 tags: {untagged}")
    live_tags = {t for q in qs.values() for t in q.tags}
    lost = sorted(EXPECTED_TAGS - live_tags)
    minted = sorted(live_tags - EXPECTED_TAGS)
    if lost or minted:
        raise SystemExit(
            f"§2 tag inventory drift — rows that lost their last query: "
            f"{lost}; unknown/typo'd tags: {minted}.  If deliberate, "
            "update EXPECTED_TAGS in the same commit."
        )
    for q in qs.values():
        for t in q.tags:
            # `is not None` to match the registry/sweep spelling — an
            # empty-string oracle is oracled, not rows-only
            by_tag[t].append(q.name + ("" if q.oracle is not None else "*"))
    lines = [
        "# COVERAGE — SURVEY.md §2 operator inventory → declared queries",
        "",
        f"{len(qs)} queries declared, "
        f"{sum(1 for q in qs.values() if q.oracle is not None)} "
        "with DuckDB oracles (the rest are rows-only self-verifying, marked *).",
        "Rows-only (*) invariants: docs/SELF_VERIFICATION.md. Regenerate with `python tools/gen_coverage.py`.",
        "",
        "| §2 row | queries |",
        "|---|---|",
    ]
    for tag in sorted(by_tag, key=lambda t: (t[0], len(t), t)):
        lines.append(f"| {tag} | {', '.join(sorted(by_tag[tag]))} |")
    lines.append(NOT_APPLICABLE)
    with open(os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"COVERAGE.md: {len(by_tag)} operator rows covered")


if __name__ == "__main__":
    main()
