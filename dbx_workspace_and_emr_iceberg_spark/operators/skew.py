"""Skew-aware join (SURVEY.md §2.12 X6 mandate).

AQE's skew-join handling splits oversized *partitions* at runtime; for
pathologically hot keys (one key ≫ everything else) explicit salting is
still the reliable tool: replicate the small side N ways, scatter the
big side's hot rows across N sub-keys, join on (key, salt). The join
result is semantically identical to the unsalted join — which is
exactly how the oracle checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across n_salts sub-keys.

    big rows get salt = pmod(xxhash64(whole row key + monotonic bits), n)
    — deterministic per row; small rows are replicated once per salt
    (explode over sequence). Shuffle keys become (on, salt): a hot key's
    rows now land on n_salts reducers instead of one.
    """
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_big.join(replicated_small, [on, "__salt"], how)
    return out.drop("__salt")
