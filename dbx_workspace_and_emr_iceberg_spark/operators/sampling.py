"""Deterministic hash-based sampling and dataset splitting.

``df.sample()``/``sampleBy()`` are seeded per *partition*: the same
rows sample differently after a repartition, a file-compaction, or a
cluster resize — unacceptable for training-data pipelines, where a
document's split assignment must be a pure function of the document
(else val/test leak into train as the corpus is re-laid-out or grown).

The fix is content-addressed sampling: bucket = md5(key) mod B, keep a
bucket range. Properties that matter at 100 TB:

* **Reshuffle/rescale-invariant** — assignment depends only on the key
  value; file layout, partition count, and executor count are
  irrelevant.
* **Zero shuffle, zero state** — a map-side filter; pushes through
  scans like any predicate and composes with partition pruning.
* **Append-stable** — new documents never move old ones between
  splits; an 80/10/10 split stays consistent across corpus versions
  (the property random split lacks).
* **Cross-engine reproducible** — md5 is bit-stable everywhere, so a
  DuckDB/Trino/Python job derives the identical split (declared
  queries verify this against the DuckDB oracle).

(Reference parity: the reference stack — Spark 3.5 + Iceberg,
/root/reference/main.tf:792-806 — ships no sampling operators; EXT
LLM-pipeline surface per SURVEY.md §2.12.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bucket count: 8 hex chars = 32 bits of md5 >> 10k buckets, so the
#: modulo is uniform to ~1e-6 and fractions are expressible to 0.01%.
BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets) from md5 of the
    key's string form. DuckDB equivalent (oracle-able):
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % buckets``.
    """
    h32 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return h32 % buckets


def hash_sample(
    df: DataFrame, key: str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    # int(x + 0.5), not int(x) or round(x): plain int() truncates
    # binary-float error downward (0.29 * 10000 == 2899.999...) and
    # Python round() is half-to-even (round(2.5) == 2), both off-by-one
    # vs the documented half-open [0, fraction*B) bucket range
    return df.filter(
        hash_bucket(F.col(key), buckets) < int(fraction * buckets + 0.5)
    )


def hash_split(
    df: DataFrame,
    key: str,
    val: float = 0.1,
    test: float = 0.1,
    split_col: str = "split",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Label every row train/val/test by key hash (single pass, no
    shuffle): buckets ``[0, test*B)`` -> test, ``[test*B, (test+val)*B)``
    -> val, rest -> train. Filter on the label to materialize a split.
    """
    if val < 0 or test < 0 or val + test > 1:
        raise ValueError("need val >= 0, test >= 0, val + test <= 1")
    b = hash_bucket(F.col(key), buckets)
    t_hi = int(test * buckets + 0.5)
    v_hi = t_hi + int(val * buckets + 0.5)
    label = (
        F.when(b < t_hi, F.lit("test"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(split_col, label)


def hash_sample_by(
    df: DataFrame,
    key: str,
    strata: str,
    fractions: dict,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Deterministic per-stratum sampling — the reshuffle-stable
    ``sampleBy``. Mixture re-weighting for multi-source corpora
    ("50% en, 20% de, ..."): each stratum keeps its own hash-bucket
    prefix, so every guarantee of :func:`hash_sample` holds per
    stratum, and tightening one stratum's fraction yields a subset of
    the looser sample. Strata absent from ``fractions`` are dropped
    (fraction 0). Map-side filter; no shuffle.
    """
    for s, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1]")
    # few strata -> a small literal map is fine (the per-element-lit
    # cost warning applies to thousands of elements, not tens)
    thresholds = F.create_map(
        *[
            c
            for s, frac in sorted(fractions.items())
            for c in (F.lit(s), F.lit(int(frac * buckets + 0.5)))
        ]
    )
    thr = F.coalesce(thresholds[F.col(strata)], F.lit(0))
    return df.filter(hash_bucket(F.col(key), buckets) < thr)
