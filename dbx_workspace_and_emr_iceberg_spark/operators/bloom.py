"""Bloom-filter membership for corpus decontamination (SURVEY §2.12 X4/X16).

x16 checks train-vs-benchmark contamination with a shingle JOIN — exact
but it shuffles the training corpus's shingles. The standard 100 TB
alternative is a BLOOM FILTER over the (small) benchmark side: build
once, broadcast a few MB, and the training scan probes locally —
zero shuffle, one pass, no false negatives by construction (only
tunable false positives, which for a drop-filter merely over-drops).

Spark-first layout:
  * build — ``mapInPandas`` emits ONE fixed-size partial bitmap per
    batch (numpy bit ops); partials OR together on the driver. The
    collected volume is partitions x m/8 bytes — a sketch, never rows —
    the same driver-merge contract as Iceberg puffin stats or HLL
    union.
  * probe — the final bitmap rides to executors as a broadcast closure
    var inside a ``mapInPandas``; membership for every shingle of a
    batch is vectorized numpy indexing.

Hashing is xxhash-free and deterministic: the md5 hex halves with k
affine derivations (Kirsch-Mitzenmacher), identical on driver and
executors — AND re-derivable by DuckDB (`CAST('0x' || substr(md5(s),
1, 8) AS BIGINT)`, the x2e-proven cross-engine spelling), so the
entire bloom — every set bit and every probe verdict — is
value-oracle-able (x24).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h64(s: str) -> tuple[int, int]:
    """Two independent 32-bit hashes of s: md5's first two hex-string
    halves. This is the repo's PROVEN cross-engine hash spelling (x2e):
    DuckDB re-derives them as ``CAST('0x' || substr(md5(s), 1, 8) AS
    BIGINT)`` / ``substr(…, 9, 8)``, so every bloom bit position is
    replayable by the oracle. (Previously little-endian 64-bit digest
    halves — deterministic, but engine-opaque.)"""
    h = hashlib.md5(s.encode()).hexdigest()
    return int(h[:8], 16), int(h[8:16], 16)


def _positions(s: str, k: int, m: int) -> np.ndarray:
    h1, h2 = _h64(s)
    # Kirsch-Mitzenmacher: k positions from two base hashes; values
    # stay under 2^35 (32-bit halves), exact in int64 and in DuckDB's
    # BIGINT replay
    return np.array([(h1 + i * h2) % m for i in range(k)], dtype=np.int64)


def build_bloom(
    items: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    n_items: int | None = None,
) -> bytes:
    """Bloom bitmap over every value of ``items[col]``.

    One fixed-size partial bitmap per Arrow batch, tree-merged before
    the driver sees anything (r17, VERDICT-r16 #3): a second
    ``mapInPandas`` OR-reduce over ⌈√parts⌉ groups collapses the
    per-partition partials executor-side, so the driver collects
    O(√parts) bitmaps instead of one per partition — at the 1e5–1e6
    partitions a 100 TB scan implies, that is ~40–128 MB of driver
    traffic instead of 12–120 GB. OR is associative/commutative/
    idempotent, so the grouping (round-robin ``repartition``) cannot
    affect the merged bitmap; the driver still handles only sketches
    (m_bits/8 bytes each), never values.

    ``n_items`` (optional): the caller's known key count.  When given,
    the build coalesces to ~1M hashed keys per partial task —
    SCALE-ADAPTIVE parallelism (r20, guide §2/§6): a build over
    billions of keys keeps every input partition, while a build over a
    few thousand (t18's fixture history: 3330 digests spread over ~50
    near-empty post-shuffle partitions) stops paying two Python-worker
    stages of pure task-launch overhead (measured: ~9 exec-s of the
    t18 budget).  Coalesce, never repartition — no shuffle either way.
    """
    mb = m_bits

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(mb // 8, dtype=np.uint8)
        any_rows = False
        i = np.arange(k, dtype=np.int64)[None, :]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            h1 = pdf["__h1"].to_numpy(dtype=np.int64)
            h2 = pdf["__h2"].to_numpy(dtype=np.int64)
            pos = ((h1[:, None] + i * h2[:, None]) % mb).ravel()
            # np.bitwise_or.at, NOT bits[idx] |= …: fancy-index
            # assignment is unbuffered-once — when two of a key's k
            # positions land in the same byte, |= applies only one,
            # silently dropping a bit and breaking the no-false-
            # negatives contract (~7.6e-5/key at default m/k).
            np.bitwise_or.at(
                bits, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8)
            )
        if any_rows:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    # hash JVM-side (codegen), drop NULL keys there too — the pandas
    # stage sees only two integer columns (vectorized; the per-key
    # hashlib loop cost ~20 s at sf0.1 on the bench-shingle build).
    # The md5 digest is materialized once through a named column (r19,
    # same rationale as probe_bloom_scalar): the inline _hash_halves
    # pair hashed every key twice.
    hashed = (
        items.select(F.md5(F.col(col)).alias("__m"))
        .select(
            F.conv(F.substring("__m", 1, 8), 16, 10)
            .cast("long")
            .alias("__h1"),
            F.conv(F.substring("__m", 9, 8), 16, 10)
            .cast("long")
            .alias("__h2"),
        )
        .filter(F.col("__h1").isNotNull())
    )
    # one .rdd conversion only (review-pass r20: each .rdd access
    # builds a fresh Python RDD conversion of the plan) — the
    # post-coalesce partition count is known without re-asking
    n_parts = hashed.rdd.getNumPartitions()
    if n_items is not None:
        want = max(1, min(n_parts, -(-n_items // 1_000_000)))
        if want < n_parts:
            hashed = hashed.coalesce(want)
            n_parts = want
    partials = hashed.mapInPandas(partial, "bitmap binary")

    def or_reduce(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(mb // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            for buf in pdf["bitmap"]:
                acc |= np.frombuffer(buf, dtype=np.uint8)
                any_rows = True
        if any_rows:
            yield pd.DataFrame({"bitmap": [acc.tobytes()]})

    # executor-side tree level: ⌈√parts⌉ groups bound the shuffled
    # volume (parts × m/8 bytes) AND the driver collect (√parts × m/8);
    # n_parts computed once above (post-coalesce when n_items fired)
    groups = max(1, math.isqrt(max(n_parts, 1)))
    reduced = partials.repartition(groups).mapInPandas(
        or_reduce, "bitmap binary"
    )
    parts = reduced.collect()  # bounded: ≤ ⌈√parts⌉ sketches
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in parts:
        merged |= np.frombuffer(r.bitmap, dtype=np.uint8)
    return merged.tobytes()


def _hash_halves(col) -> tuple:
    """JVM-side (h1, h2) for one string column — whole-stage-codegen'd
    md5 + hex-slice, the x2e spelling. The Python-side twin is _h64;
    probe paths hash here so the Arrow batch carries only integers and
    the pandas stage is pure vectorized numpy (the per-shingle hashlib
    loop cost 30 s at sf0.1 before this — measured r10)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("long"),
    )


def _hit_mask(h1: np.ndarray, h2: np.ndarray, bits: np.ndarray, k: int, m: int) -> np.ndarray:
    """Vectorized membership for L (h1, h2) pairs: (L,) bool — all k
    Kirsch-Mitzenmacher positions set."""
    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    i = np.arange(k, dtype=np.int64)[None, :]
    pos = (h1[:, None] + i * h2[:, None]) % m  # (L, k)
    got = bits[pos // 8] & (np.uint8(1) << (pos % 8).astype(np.uint8))
    return (got != 0).all(axis=1)


def probe_bloom(
    docs: DataFrame,
    shingles_col: str,
    bitmap: bytes,
    m_bits: int = 1 << 20,
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_shingles, n_hits, hit_frac) per document — the
    contamination score against the bloom. The bitmap ships once per
    task inside the closure (broadcast-equivalent for a few-MB sketch);
    shingle hashes are computed JVM-side so the pandas stage is one
    numpy matmul-shaped pass per batch (np.add.reduceat over per-doc
    offsets), never a per-shingle Python loop.
    """
    bits = np.frombuffer(bitmap, dtype=np.uint8)
    mb, kk = m_bits, k

    # NULL shingle arrays normalize to empty FIRST: F.size(NULL) is
    # -1/NULL depending on ANSI mode, and a NULL array reaching the
    # numpy concatenate would silently corrupt the batch's per-doc
    # offsets (review-pass finding — the old per-row loop crashed
    # loudly instead)
    docs = docs.withColumn(
        shingles_col,
        F.coalesce(
            F.col(shingles_col), F.array().cast("array<string>")
        ),
    )
    # md5 ONCE per shingle (a separate transform per half would hash
    # every shingle twice — lambdas don't share subexpressions), then
    # element-wise hex slices off the materialized digest array
    hashed = docs.select(
        F.col(id_col),
        F.size(F.col(shingles_col)).alias("__n"),
        F.transform(shingles_col, lambda s: F.md5(s)).alias("__m"),
    ).select(
        id_col,
        "__n",
        F.transform(
            "__m", lambda m: F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
        ).alias("__h1s"),
        F.transform(
            "__m", lambda m: F.conv(F.substring(m, 9, 8), 16, 10).cast("long")
        ).alias("__h2s"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lens = pdf["__n"].to_numpy(dtype=np.int64)
            h1 = (
                np.concatenate(pdf["__h1s"].to_numpy())
                if lens.sum()
                else np.zeros(0, dtype=np.int64)
            ).astype(np.int64)
            h2 = (
                np.concatenate(pdf["__h2s"].to_numpy())
                if lens.sum()
                else np.zeros(0, dtype=np.int64)
            ).astype(np.int64)
            hit = _hit_mask(h1, h2, bits, kk, mb).astype(np.int64)
            offsets = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            # reduceat needs non-empty segments: empty docs get 0 hits
            sums = np.zeros(len(lens), dtype=np.int64)
            nz = lens > 0
            if hit.size:
                seg = np.add.reduceat(hit, offsets[nz])
                sums[nz] = seg
            yield pd.DataFrame(
                {
                    id_col: pdf.iloc[:, 0].to_numpy(),
                    "n_shingles": lens,
                    "n_hits": sums,
                }
            )

    # output id column keeps the CALLER's name and type — the old
    # hard-coded 'doc_id bigint' made any non-default id_col crash in
    # Arrow conversion (string ids) or silently rename the column
    # (review-pass r16, reproduced); for the default bigint doc_id the
    # schema string below is byte-identical to the old one
    id_type = docs.schema[id_col].dataType.simpleString()
    scored = hashed.mapInPandas(
        run, f"{id_col} {id_type}, n_shingles int, n_hits int"
    )
    return scored.withColumn(
        "hit_frac",
        F.when(F.col("n_shingles") > 0, F.col("n_hits") / F.col("n_shingles"))
        .otherwise(F.lit(0.0)),
    )


def probe_bloom_scalar(
    df: DataFrame,
    col: str,
    bitmap: bytes,
    m_bits: int = 1 << 20,
    k: int = 5,
    out_col: str = "in_bloom",
) -> DataFrame:
    """Append boolean ``out_col``: is ``df[col]`` (a scalar string, e.g.
    a content digest) possibly in the bloom? Map-side only — the bitmap
    rides in the UDF closure — so it composes with Structured Streaming
    (t18's history probe: not-in-bloom rows are DEFINITELY new and skip
    the exact history join entirely; only the flagged slice joins).
    """
    import pandas as pd  # noqa: F811 — closure-local for executors

    from pyspark.sql.functions import pandas_udf

    bits = np.frombuffer(bitmap, dtype=np.uint8)
    mb, kk = m_bits, k

    @pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        a1 = h1.to_numpy(dtype=np.int64, na_value=0)
        a2 = h2.to_numpy(dtype=np.int64, na_value=0)
        mask = _hit_mask(a1, a2, bits, kk, mb)
        # NULL keys are never "in" the bloom
        return pd.Series(mask & ~h1.isna().to_numpy())

    # md5 halves computed JVM-side (codegen); the pandas stage is one
    # vectorized numpy membership test per Arrow batch.  The digest is
    # materialized ONCE per key through a named column (r19, the
    # with_shingles/probe_bloom idiom): _hash_halves inlined as two
    # pandas_udf arguments md5-hashes every key twice — CollapseProject
    # keeps a multiply-referenced non-cheap alias materialized, so the
    # named column halves the hash work.
    dm = df.withColumn("__bloom_md5", F.md5(F.col(col)))
    h1c = F.conv(F.substring("__bloom_md5", 1, 8), 16, 10).cast("long")
    h2c = F.conv(F.substring("__bloom_md5", 9, 8), 16, 10).cast("long")
    return dm.withColumn(out_col, _probe(h1c, h2c)).drop("__bloom_md5")
