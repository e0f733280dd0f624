"""Value-compare half of the driver sim (cell canonicalization,
separator-escaped value hashing) — extracted from driver_sim.py so the
collision/canonicalization rules are unit-testable without starting a
SparkSession (driver_sim is a script that runs at import)."""

import datetime
import decimal
import hashlib
import math


def cell(v):
    # FULL precision, always: %.6g masked cent-level diffs on values
    # >= 10k for four rounds (p1/p5 said MATCH locally, MISMATCH in the
    # driver). repr(float) is the shortest round-trip repr; Decimals keep
    # their exact string so a DECIMAL-typed output column can never be
    # silently coerced to look like the oracle's.
    if v is None: return "NULL"
    if isinstance(v, float): return repr(v) if not math.isnan(v) else "NaN"
    if isinstance(v, decimal.Decimal): return str(v)
    if isinstance(v, datetime.datetime):
        # tz-AWARE values (DuckDB returns TIMESTAMPTZ localized to ITS
        # session zone, which follows the host TZ) canonicalize through
        # UTC before the naive compare — a bare strip would compare
        # host-zone wall-clock against Spark's session-UTC wall-clock
        # and diverge under the tz sweep axis (review-pass r16)
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)): return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)

def _esc(s):
    # separator escaping (review-pass r16): unescaped '|'/newlines in
    # string payloads let DIFFERENT result sets collide into one hash —
    # ('a|b','z') vs ('a','b|z') was a false MATCH in the core compare
    return s.replace("\\", "\\\\").replace("|", "\\|").replace("\n", "\\n")

def vhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_esc(cell(r[i])) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:12]

