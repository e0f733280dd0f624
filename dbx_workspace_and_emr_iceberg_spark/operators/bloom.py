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
    items: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 5
) -> bytes:
    """Bloom bitmap over every value of ``items[col]``.

    One fixed-size partial bitmap per Arrow batch, OR-merged on the
    driver — the driver handles sketches (m_bits/8 bytes each), never
    values.
    """
    mb = m_bits

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(mb // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            for s in pdf.iloc[:, 0]:
                if s is None:
                    continue
                any_rows = True
                pos = _positions(s, k, mb)
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

    parts = items.select(F.col(col)).mapInPandas(
        partial, "bitmap binary"
    ).collect()
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in parts:
        merged |= np.frombuffer(r.bitmap, dtype=np.uint8)
    return merged.tobytes()


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
    task inside the closure (broadcast-equivalent for a few-MB sketch).
    """
    bits = np.frombuffer(bitmap, dtype=np.uint8)
    mb = m_bits

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_n, out_hits = [], [], []
            for _id, shingles in zip(pdf[id_col], pdf[shingles_col]):
                n = len(shingles)
                hits = 0
                for s in shingles:
                    pos = _positions(s, k, mb)
                    if np.all(bits[pos // 8] & (np.uint8(1) << (pos % 8).astype(np.uint8))):
                        hits += 1
                out_id.append(_id)
                out_n.append(n)
                out_hits.append(hits)
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "n_shingles": out_n,
                    "n_hits": out_hits,
                }
            )

    scored = docs.select(F.col(id_col), F.col(shingles_col)).mapInPandas(
        run, "doc_id bigint, n_shingles int, n_hits int"
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
    def _probe(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            if v is None:
                out.append(False)
                continue
            pos = _positions(v, kk, mb)
            out.append(
                bool(
                    np.all(
                        bits[pos // 8]
                        & (np.uint8(1) << (pos % 8).astype(np.uint8))
                    )
                )
            )
        return pd.Series(out)

    return df.withColumn(out_col, _probe(F.col(col)))
