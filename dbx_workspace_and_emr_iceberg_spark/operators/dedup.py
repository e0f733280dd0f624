"""Deduplication operators (SURVEY.md §2.12 X1/X2): exact, MinHash-LSH,
SimHash, n-gram Jaccard.

All operators are DataFrame compositions with no collect() and (by
default) no Python in any hot path; minhash_signatures also offers an
Arrow-batched numpy min-kernel (vectorized=True) for long-document
corpora — see _minhash_min_udf for the measurement. Scale shapes:

  * exact dedup: one shuffle on the content hash (not the content!) —
    at 100 TB hash first, shuffle 16-byte keys, never full documents;
  * MinHash-LSH: explode to (band, signature) pairs → groupBy band →
    pair generation within buckets only. Work is O(docs × bands) plus
    O(Σ bucket²) — the band width controls the bucket-collision rate,
    so the quadratic term stays bounded; candidates are then verified
    with exact Jaccard (explode word sets, count shared via join);
  * SimHash: one explode + one groupBy per doc with 60 bit-vote
    aggregates — linear, and near-dup lookup becomes a Hamming-ball
    probe on a 60-bit key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIMHASH_BITS = 60  # 15 hex chars of md5 → fits signed 64-bit in both engines


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per distinct text (hash-first; X1)."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingles as an array column (JVM-side, no UDF).

    NOTE: expensive when inlined repeatedly — prefer materializing via
    ``with_shingles`` so downstream consumers (e.g. 32 minhash lambdas)
    reference the computed column instead of re-deriving it per use.
    """
    words = F.split(F.col(text_col), " ")
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    # Guard the empty case explicitly: sequence(0, -1) would generate a
    # DESCENDING [0, -1] (not an empty array), whose indices then hit
    # ANSI's element_at(…, 0) error on sub-n-word docs.
    idx = F.when(k >= 1, F.sequence(F.lit(0), (k - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )


def with_shingles(
    docs: DataFrame, text_col: str, n: int = 3, out_col: str = "__shingles"
) -> DataFrame:
    """Materialize the shingle array once per row. Catalyst's
    CollapseProject won't inline a column referenced by many downstream
    expressions once it's expensive and multiply-used, so the 32 minhash
    transforms all read the same computed array — this single change cut
    MinHash wall time ~5x at sf0.1."""
    return docs.withColumn(out_col, word_shingles(text_col, n))


_MAX_LONG = (1 << 63) - 1


def _shingle_hashes(docs: DataFrame, text_col: str, shingle_n: int) -> DataFrame:
    """Add ``__sh: array<bigint>`` — one xxhash64 per word shingle.
    JVM-side and cheap (~2 hashes per word; measured 0.2 s for the
    sf0.1 corpus): words are hashed ONCE to longs, each shingle hash is
    xxhash64 of n word-hash longs."""
    words_hashed = F.transform(F.split(F.col(text_col), " "), lambda w: F.xxhash64(w))
    return docs.withColumn("__wh", words_hashed).withColumn(
        "__sh",
        # same empty-doc guard as word_shingles: docs shorter than
        # the shingle size contribute ZERO shingles, not an
        # out-of-bounds index under ANSI mode
        F.transform(
            F.when(
                F.size("__wh") >= shingle_n,
                F.sequence(F.lit(0), F.size("__wh") - shingle_n),
            ).otherwise(F.array().cast("array<int>")),
            lambda i: F.xxhash64(
                *[
                    F.element_at("__wh", (i + j + 1).cast("int"))
                    for j in range(shingle_n)
                ]
            ),
        ),
    )


def _minhash_min_udf(num_hashes: int):
    """Arrow-batched num_hashes-way min over shingle-hash arrays.

    The per-shingle work is ``min_i((mix(h) * a_i + b_i) mixed)`` — a
    2-universal-style affine family over pre-mixed 64-bit shingle
    hashes, computed as ONE (num_hashes × total_shingles) numpy matrix
    per Arrow batch. Seeds are module-deterministic (fixed RandomState),
    so signatures are stable across runs, workers and partitionings.

    MEASURED at sf0.1 (local[32], after the filter-pushdown fix in
    minhash_signatures): this path is within noise of the pure-JVM
    aggregate (sig stage ~1.7 s vs ~1.2 s — Arrow transfer of the
    shingle arrays eats the numpy win at 5k-doc scale), so it is NOT
    the default. It exists because the tradeoff flips when documents
    are long (numpy's per-shingle cost is ~10x below the interpreted
    HOF's and the fixed Arrow cost amortizes) — profile before
    switching, as bench.py did here.
    """
    from pyspark.sql.functions import pandas_udf

    rng = np.random.RandomState(0x5EED5)
    mult = rng.randint(1, 2**62, num_hashes).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    add = rng.randint(1, 2**62, num_hashes).astype(np.uint64)
    maxv = np.iinfo(np.int64).max

    @pandas_udf("array<long>")
    def mh(shingles: pd.Series) -> pd.Series:
        lens = shingles.map(len).to_numpy(dtype=np.int64)
        n = len(shingles)
        if n == 0 or lens.sum() == 0:
            return pd.Series([np.full(num_hashes, maxv)] * n)
        flat = np.concatenate(
            [np.asarray(s, dtype=np.int64) for s in shingles]
        ).astype(np.uint64)
        x = flat ^ (flat >> np.uint64(33))
        h = x[None, :] * mult[:, None] + add[:, None]
        h ^= h >> np.uint64(29)
        hs = h.astype(np.int64)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        out = [
            hs[:, st : st + ln].min(axis=1) if ln else np.full(num_hashes, maxv)
            for st, ln in zip(starts, lens)
        ]
        return pd.Series(out)

    return mh


def minhash_signatures(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    vectorized: bool = False,
) -> DataFrame:
    """(doc, __mh: array<bigint>) — num_hashes seeded min-hashes.

    Two paths, same contract (deterministic signatures; hash families
    differ so signatures are not interchangeable between paths):
      * ``vectorized=False`` (default): pure-JVM single aggregate pass
        carrying an array<bigint> accumulator —
        least(acc[i], xxhash64(seed_i, h)) via zip_with. No Python
        workers anywhere. This is the measured winner at sf0.1 AFTER
        the word-count pre-filter below (which was the real cost: see
        its comment);
      * ``vectorized=True``: JVM shingle hashing + Arrow/numpy
        num_hashes-way min (:func:`_minhash_min_udf`) — within noise
        locally, wins when docs are long; kept as the measured
        alternative.
    """
    # Zero-shingle docs (shorter than shingle_n) would keep an identical
    # sentinel signature. They carry no similarity information and must
    # NOT enter banding: m of them would collide in every band and emit
    # m^2/2 bogus candidate pairs. Filter on WORD COUNT here, before the
    # shingle projection — an equivalent-but-cheap predicate. Filtering
    # on size(__sh) after the fact is a measured disaster: Catalyst's
    # PushDownPredicate substitutes the full shingle expression into the
    # pushed filter, where the word-hash array is re-derived per
    # element_at — O(words²) per doc, ~10x the whole stage.
    docs = docs.filter(F.size(F.split(F.col(text_col), " ")) >= shingle_n)
    d = _shingle_hashes(docs, text_col, shingle_n)
    if vectorized:
        return d.select(
            F.col(id_col).alias("doc"),
            _minhash_min_udf(num_hashes)("__sh").alias("__mh"),
        )
    mh = F.aggregate(
        F.col("__sh"),
        F.expr(f"array_repeat({_MAX_LONG}L, {num_hashes})"),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda a, s: F.least(a, F.xxhash64(s, h)),
        ),
    )
    return d.select(F.col(id_col).alias("doc"), mh.alias("__mh"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    vectorized: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash.

    rows-per-band = num_hashes // bands; two docs collide in a band iff
    all rows of that band match → P(collide) = sim^rows per band.

    ``bands`` must divide ``num_hashes`` exactly: silently ignoring
    trailing hashes would quietly weaken the documented P(collide)
    contract, and bands > num_hashes makes every band slice EMPTY, so
    every doc collides with every doc — an O(n²) all-pairs explosion
    with no error (review-pass r16, reproduced: 3 mutually-dissimilar
    docs produced all 3 pairs at num_hashes=8, bands=16).
    """
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"minhash_lsh_pairs: bands={bands} must be >= 1 and divide "
            f"num_hashes={num_hashes} exactly (rows-per-band would "
            "otherwise silently drop hashes or degenerate to all-pairs)"
        )
    rows = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n, vectorized)
    band_cols = [
        F.xxhash64(F.lit(b), F.slice("__mh", b * rows + 1, rows)).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc", *band_cols)
    melted = banded.selectExpr(
        "doc",
        f"stack({bands}, "
        + ", ".join(f"{b}, band{b}" for b in range(bands))
        + ") as (band_id, band_val)",
    )
    a = melted.alias("a")
    b = melted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )


def exact_jaccard(
    docs: DataFrame, pairs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact word-set Jaccard for given (id_a, id_b) pairs — explode the
    word sets and count shared words with a join; linear in pair count ×
    doc length, never materializes a doc × doc matrix."""
    words = docs.select(
        F.col(id_col).alias("doc"), F.explode(F.array_distinct(F.split(text_col, " "))).alias("w")
    )
    sizes = words.groupBy("doc").agg(F.count("*").alias("nw"))
    wa = words.withColumnRenamed("doc", "id_a")
    wb = words.withColumnRenamed("doc", "id_b")
    shared = (
        pairs.join(wa, "id_a")
        .join(wb, ["id_b", "w"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("nw", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("nw", "nb"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per document from md5 word hashes (md5 so a SQL
    oracle can reproduce it bit-for-bit cross-engine).

    Each word votes ±1 on every bit of its 60-bit hash; the signature
    sets bit j iff the vote sum is positive. One explode + one groupBy.
    """
    words = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).withColumn("h", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long"))
    votes = words.groupBy("doc").agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"v{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sig = votes.select(
        "doc",
        F.concat(
            *[
                F.when(F.col(f"v{j}") > 0, "1").otherwise("0")
                for j in range(SIMHASH_BITS - 1, -1, -1)
            ]
        ).alias("simhash_bits"),
    )
    return sig


def dup_span_stats(
    docs: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Per-doc duplicated-span statistics from stride-1 sliding k-token
    windows — Lee et al. exact-substring dedup respelled from suffix
    arrays to digest joins (the x34 operator, extracted for reuse by
    composed pipelines like x36).

    A window is flagged when its k-gram digest occurs more than once
    corpus-wide (any doc, any offset, self-repeats included); flagged
    windows whose starts differ by <= k merge into one maximal span.
    Returns one row per input doc: (id_col, n_tokens long, n_spans
    long, dup_tokens long). Docs shorter than k tokens carry zeros.

    Scale: one gram per token (corpus-linear explode); every
    post-explode shuffle moves 16-byte digests or (id, pos) ints,
    never text. At 100 TB swap md5 for xxhash64 and persist the gram
    frame DISK_ONLY so the explode runs once (md5 + re-derivation here
    keep the DuckDB oracle replayable and the harness cache-free)."""
    toks = docs.select(F.col(id_col), F.split(text_col, " ").alias("__t"))
    grams = toks.filter(F.size("__t") >= k).select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(__t) - {k}),"
                f" i -> md5(concat_ws(' ', slice(__t, i + 1, {k}))))"
            )
        ).alias("__pos", "__g"),
    )
    dup = (
        grams.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select("__g")
    )
    flagged = grams.join(dup, "__g", "left_semi").select(id_col, "__pos")
    w = Window.partitionBy(id_col).orderBy("__pos")
    isl = flagged.withColumn(
        "__brk",
        F.when(
            F.col("__pos") - F.lag("__pos").over(w) <= k, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("__island", F.sum("__brk").over(w))
    spans = isl.groupBy(id_col, "__island").agg(
        (F.max("__pos") - F.min("__pos") + k).alias("__span_tokens")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_spans"),
        F.sum("__span_tokens").alias("__dup_tokens"),
    )
    return (
        toks.select(id_col, F.size("__t").cast("long").alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("__n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("__dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
        )
    )
