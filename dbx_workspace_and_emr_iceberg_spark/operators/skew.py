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


def salted_top_k(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list,
    k: int,
    n_salts: int = 32,
) -> DataFrame:
    """Per-key top-k rows, skew-proof: the two-phase salted spelling of
    the x33 per-host quota (per-key top-k is SALT-COMPOSABLE — the
    top-k of a union is the top-k of per-salt top-ks).

    Phase 1 ranks within (key, salt) and keeps k rows per sub-key, so a
    pathologically hot key (the mega-host problem) is ranked by
    n_salts tasks instead of one; phase 2 re-ranks the <= n_salts*k
    survivors per key. Salt is a deterministic content hash of the
    whole row, so the result is layout-invariant.

    ``order_cols`` MUST be a total order within every key (add a
    unique-id tie-break, as x33 does with doc_id): with ties at the
    k boundary, *which* tied row survives phase 1 depends on its salt,
    and equivalence with the single-window spelling only holds when
    the order admits no ties.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    from pyspark.sql import Window

    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(*order_cols)
    phase1 = (
        df.withColumn("__salt", salt)
        .withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= k)
        .drop("__salt", "__rk1")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        phase1.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
