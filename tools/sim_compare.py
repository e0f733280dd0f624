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
    # NULL renders as a lone NUL byte (review-pass r18): the old "NULL"
    # sentinel was forgeable — an engine bug emitting the literal string
    # 'NULL' where the oracle yields SQL NULL was a false MATCH.  No
    # engine string cell in this suite can be "\x00".
    if v is None: return "\x00"
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
    if isinstance(v, (list, tuple)):
        # elements escape the list syntax (review-pass r18): the old
        # bare ','-join collided ["a,b"] with ["a","b"] — different
        # results, identical hash, and the schema compare (names only)
        # could not see it.  Backslash first, then the delimiters; the
        # discipline is injective at every nesting level.
        return "[" + ",".join(
            cell(x)
            .replace("\\", "\\\\")
            .replace(",", "\\,")
            .replace("[", "\\[")
            .replace("]", "\\]")
            for x in v
        ) + "]"
    if isinstance(v, str):
        # strings are type-TAGGED (review-pass r18): the schema compare
        # checks column NAMES only, so a column silently drifting to
        # string ("1.5" vs 1.5) hashed identically before.  Numbers and
        # Decimals stay untagged on purpose — DuckDB HUGEINT / int /
        # DECIMAL renderings of the same value must keep colliding.
        return "s:" + v
    if isinstance(v, (bytes, bytearray)):
        # Spark binary arrives as bytearray, DuckDB blob as bytes —
        # str() of those diverge ("bytearray(b'..')" vs "b'..'")
        return "y:" + bytes(v).hex()
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

