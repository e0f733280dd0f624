"""X1/X2 dedup queries over `documents` (SURVEY.md §2.12).

The fixture corpus has no exact duplicates, so dedup queries that must
*demonstrate removal* union the corpus with deterministic perturbed
copies (same text → exact dup; text minus last 3 words → near dup).
The perturbation is part of the declared query on both sides, so the
DuckDB oracle sees the identical inflated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    SIMHASH_BITS,
    exact_dedup,
    exact_jaccard,
    simhash,
)
from ..registry import register
from ..tables import load_table

_COPY_OFFSET = 1_000_000


def _planted_near_dups(d: DataFrame) -> DataFrame:
    """x2-style planted near-dups: every doc with doc_id % 20 == 0 gets
    a copy (id + offset) missing its last 3 words. Shared by x2 and
    x12b so their 'planted pairs' stay the same pairs."""
    words = F.split("text", " ")
    return d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
        F.array_join(
            F.slice(words, 1, F.greatest(F.size(words) - 3, F.lit(1))), " "
        ).alias("text"),
    )


# --- Shared md5 MinHash-LSH machinery (cross-engine hash family) -----------
# The repo's MinHash has two hash families with one banding mechanism:
# xxhash64 (operators/dedup.py::minhash_lsh_pairs — one 8-byte JVM hash
# per (shingle, seed); the cheapest spelling when no second engine must
# replay it, property-tested in tests/test_operators.py) and this md5
# family, where per shingle one md5 yields two 32-bit halves and seed
# s's hash is the Kirsch-Mitzenmacher affine (h1 + s*h2) mod 2^32
# (products <= ~2^37, no bigint overflow under ANSI — bloom.py's
# derivation). Band key = md5 of the band's comma-joined signature
# slice. Because DuckDB reproduces md5 bit-for-bit, every signature,
# band digest and candidate pair value-oracles — so the REGISTERED
# LSH queries (x2, x2e, x12b, x12c) all ride this family, each with
# its own band geometry. Scale shape is family-independent: shuffles
# carry (doc, band digest), never text; the bucket join emits
# O(sum bucket^2) candidates, never all-pairs.

_X2E_SEEDS = 16
_X2E_BANDS = 8
_X2E_ROWS = _X2E_SEEDS // _X2E_BANDS


def _md5_lsh_ctes(seeds: int, rows: int) -> str:
    """The md5 MinHash-LSH CTE chain (corpus -> shingles -> hash halves
    -> signatures -> band digests) for one band geometry — the DuckDB
    mirror of :func:`_md5_band_frame`. Shared by x2 (16 seeds x 2
    rows + jaccard verify), x2e (16x2 candidate set), x12c (16x2 full
    pipeline) and x12b (16x4 — the production band choice). Emitted
    WITHOUT the leading WITH so the pipeline oracles can prepend
    RECURSIVE for their closure stage."""
    return f"""corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET},
         array_to_string(list_slice(string_split(text, ' '), 1,
           greatest(len(string_split(text, ' ')) - 3, 1)), ' ')
  FROM documents WHERE doc_id % 20 = 0
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> concat(string_split(text,' ')[i], ' ',
                       coalesce(string_split(text,' ')[i+1], ''), ' ',
                       coalesce(string_split(text,' ')[i+2], ''))))) AS shingle
  FROM corpus
  WHERE len(string_split(text, ' ')) >= 3
),
hh AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
  FROM sh
),
sig AS (
  SELECT doc_id, s, min((h1 + s * h2) % 4294967296) AS mh
  FROM hh, LATERAL (SELECT unnest(generate_series(0, {seeds - 1})) AS s) g
  GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, s // {rows} AS band_id,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY s)) AS band_val
  FROM sig GROUP BY doc_id, s // {rows}
)"""


#: x2e/x12c's geometry, kept as the module constant their r10-era
#: oracles reference verbatim
_MD5_LSH_CTES = _md5_lsh_ctes(_X2E_SEEDS, _X2E_ROWS)


def _md5_band_frame(
    corpus: DataFrame, seeds: int = _X2E_SEEDS, rows: int = _X2E_ROWS
) -> DataFrame:
    """Cross-engine md5 MinHash band frame (doc_id, band_id, band_val)
    over a (doc_id, text) corpus — the Spark mirror of
    :func:`_md5_lsh_ctes` (same geometry parameters). Per shingle one
    md5 yields two 32-bit halves; seed s's hash is the
    Kirsch-Mitzenmacher affine (h1 + s*h2) mod 2^32; band key = md5 of
    the band's comma-joined signature slice. Shared by x2/x2e
    (candidate sets) and x12b/x12c (full pipelines).

    Geometry note (ADVICE r19): before r19, a non-dividing
    seeds/rows pair formed a PARTIAL trailing band (`s div rows`
    grouping); the one-aggregate respell enumerates complete bands
    only and rejects that geometry loudly below — if a future caller
    needs partial bands, that is a deliberate semantics change, not a
    regression."""
    from .text_queries import _padded_ngrams

    if seeds % rows != 0:
        # the one-aggregate band projection below enumerates complete
        # bands only; a partial trailing band (which the old
        # `s div rows` grouping would have formed) must reject loudly
        # rather than silently vanish
        raise ValueError(f"seeds ({seeds}) must be a multiple of rows ({rows})")
    corpus = corpus.withColumn(
        "__words", F.split("text", " ")  # materialized — x4d idiom
    )
    words = F.col("__words")
    sh = (
        corpus.filter(F.size(words) >= 3)
        .select(
            "doc_id",
            F.explode(F.array_distinct(_padded_ngrams(words, 3))).alias(
                "shingle"
            ),
        )
        # md5 ONCE per shingle through a named column (r19, the
        # probe_bloom idiom): the inline pair hashed every shingle
        # twice — CollapseProject keeps a multiply-referenced
        # non-cheap alias materialized
        .select("doc_id", F.md5("shingle").alias("__m"))
        .select(
            "doc_id",
            F.conv(F.substring("__m", 1, 8), 16, 10)
            .cast("long")
            .alias("h1"),
            F.conv(F.substring("__m", 9, 8), 16, 10)
            .cast("long")
            .alias("h2"),
        )
    )
    # ALL seed minima in ONE per-doc aggregate (r19, guide §2.3/§2.4):
    # the old explode(sequence(0, seeds-1)) multiplied the shuffle into
    # the signature aggregate by `seeds` (x16), and a SECOND exchange
    # re-grouped (doc_id, s) rows into bands.  One groupBy(doc_id) with
    # `seeds` min() columns shuffles each doc's partial row exactly
    # once (combiner-friendly), and the band digests are then pure
    # map-side projections — identical (h1 + s*h2) % 2^32 arithmetic,
    # identical comma-joined digest strings, zero plan-shape risk on
    # ties since min() is order-free.
    per_doc = sh.groupBy("doc_id").agg(
        *[
            F.min(
                (F.col("h1") + F.lit(s) * F.col("h2")) % F.lit(4294967296)
            ).alias(f"__mh{s}")
            for s in range(seeds)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band_id"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"__mh{s}").cast("string")
                            for s in range(b * rows, (b + 1) * rows)
                        ],
                    )
                ).alias("band_val"),
            )
            for b in range(seeds // rows)
        ]
    )
    return per_doc.select(
        "doc_id", F.explode(band_structs).alias("__b")
    ).select("doc_id", "__b.band_id", "__b.band_val")


def _md5_lsh_candidates(bands: DataFrame) -> DataFrame:
    """Distinct (id_a < id_b) candidate pairs from a band frame — the
    bucket self-join all four md5-family LSH queries share."""
    a = bands.select(F.col("doc_id").alias("id_a"), "band_id", "band_val")
    b = bands.select(F.col("doc_id").alias("id_b"), "band_id", "band_val")
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _md5_verified_pairs(corpus: DataFrame, cand: DataFrame) -> DataFrame:
    """(id_a, id_b, n_inter, n_union) word-set overlap counts for
    candidate pairs — the exact-verification join shared by x2
    (>= 0.5 gate + jaccard values), x12b and x12c (>= 0.85 edge
    gates), so the Spark side cannot drift from the single SQL
    spelling in the oracles (review-pass r13). Carries word arrays of
    CANDIDATES only, never all pairs; gates stay integer-exact at the
    call sites."""
    pool = corpus.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("w")
    )
    scored = cand.join(
        pool.select(F.col("doc_id").alias("id_a"), F.col("w").alias("wa")),
        "id_a",
    ).join(
        pool.select(F.col("doc_id").alias("id_b"), F.col("w").alias("wb")),
        "id_b",
    )
    inter = F.size(F.array_intersect("wa", "wb"))
    return scored.select(
        "id_a",
        "id_b",
        inter.alias("n_inter"),
        (F.size("wa") + F.size("wb") - inter).alias("n_union"),
    )


#: Closure + per-cluster summary SQL shared by the two end-to-end LSH
#: pipeline oracles (x12b: 16 seeds x 4-row bands, the production
#: geometry; x12c: 16 x 2): banded candidates -> integer-exact jaccard
#: gate (>= 0.85 spelled 20*inter >= 17*union so no float predicate
#: can flip cross-engine) -> undirected min-label reachability ->
#: non-singleton cluster summary. Appended after a band-geometry CTE
#: chain from :func:`_md5_lsh_ctes` under WITH RECURSIVE.
_MD5_PIPELINE_TAIL = """
cand AS (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
),
pool AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w FROM corpus
),
edges0 AS (
  SELECT ia AS s, ib AS d
  FROM cand
  JOIN pool pa ON pa.doc_id = cand.ia
  JOIN pool pb ON pb.doc_id = cand.ib
  WHERE 20 * len(list_intersect(pa.w, pb.w))
        >= 17 * (len(pa.w) + len(pb.w) - len(list_intersect(pa.w, pb.w)))
),
edges AS (SELECT s, d FROM edges0 UNION SELECT d, s FROM edges0),
reach AS (
  SELECT doc_id AS n, doc_id AS m FROM corpus
  UNION
  SELECT e.s, r.m FROM edges e JOIN reach r ON e.d = r.n
),
comp AS (SELECT n, min(m) AS c FROM reach GROUP BY n)
SELECT c AS cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
       min(n) AS canonical_doc
FROM comp GROUP BY c HAVING count(*) > 1
ORDER BY cluster_id
"""


# --- X1: exact dedup (hash-first keep-lowest-id) ---------------------------

_X1_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % 10 = 0
)
SELECT doc_id, md5(text) AS text_hash FROM (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM corpus
) WHERE rn = 1
ORDER BY doc_id
"""


@register("x1_exact_dedup", oracle=_X1_ORACLE, tags=("X1",))
def x1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"), "text"
    )
    corpus = d.unionByName(dups)
    kept = exact_dedup(corpus, "text", "doc_id")
    return kept.select("doc_id", F.md5("text").alias("text_hash")).orderBy("doc_id")


# --- X1b: keyed dedup (keep-first per business key) ------------------------

_X1B_ORACLE = """
SELECT lang, source, min(doc_id) AS kept_doc, count(*) AS group_size
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


@register("x1b_keyed_dedup", oracle=_X1B_ORACLE, tags=("X1",))
def x1b_keyed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(F.min("doc_id").alias("kept_doc"), F.count("*").alias("group_size"))
        .orderBy("lang", "source")
    )


# --- X2: MinHash-LSH near-dup detection (value-oracled since r13) ----------

_X2_ORACLE = f"""
WITH {_md5_lsh_ctes(_X2E_SEEDS, _X2E_ROWS)},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
),
sets AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM corpus
)
SELECT id_a, id_b,
       round(CAST(len(list_intersect(sa.ws, sb.ws)) AS DOUBLE)
             / (len(sa.ws) + len(sb.ws) - len(list_intersect(sa.ws, sb.ws))),
             4) AS jaccard
FROM cand
JOIN sets sa ON sa.doc_id = cand.id_a
JOIN sets sb ON sb.doc_id = cand.id_b
WHERE 2 * len(list_intersect(sa.ws, sb.ws))
      >= len(sa.ws) + len(sb.ws) - len(list_intersect(sa.ws, sb.ws))
ORDER BY id_a, id_b
"""


@register("x2_minhash_lsh", oracle=_X2_ORACLE, tags=("X2",))
def x2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded MinHash-LSH over an inflated corpus with known near-dups
    (docs %20==0 copied minus their last 3 words): banded candidates
    -> exact word-set Jaccard verification -> verified pairs.

    VALUE-ORACLED r13 (VERDICT r12 #5): the signatures ride the
    cross-engine md5 hash family (see the shared-machinery comment
    above :func:`_md5_lsh_ctes`), so DuckDB replays the ENTIRE
    pipeline — every band digest, the candidate set, and each
    verified pair's jaccard — and the driver hash-checks the result.
    The xxhash64 family (operators/dedup.py::minhash_lsh_pairs — the
    cheaper per-shingle fold when no second engine must replay the
    hashes) keeps its property-test coverage in tests/test_operators.

    The >= 0.5 verification gate is spelled integer-exact
    (2*|A∩B| >= |A∪B|) on BOTH engines so no float predicate can flip
    across them (r8 rule); the displayed jaccard is a single exact
    division, bit-identical cross-engine, rounded for display only.

    Self-verifies recall on top of the oracle: >= 80% of planted pairs
    must be among the VERIFIED pairs.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(_planted_near_dups(d))
    cand = _md5_lsh_candidates(_md5_band_frame(corpus))
    ver = _md5_verified_pairs(corpus, cand)
    verified = ver.filter(
        2 * F.col("n_inter") >= F.col("n_union")
    ).select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_inter").cast("double") / F.col("n_union"), 4
        ).alias("jaccard"),
    )
    # cache() stays live for the caller: the self-check below consumes
    # the pipeline once, and the returned DataFrame re-reads the cached
    # result instead of recomputing the full LSH pipeline; the pin is
    # cleared by the harness (bench.py / driver_sim clearCache).
    out = verified.orderBy("id_a", "id_b").cache()
    # Recall self-check, fully distributed (ADVICE r17): the former
    # spelling collect()ed every verified pair and ABORTED above 50k —
    # on a legitimately duplicate-heavy corpus the O(Σ bucket²) pair
    # growth is inherent to LSH, so that scalability guard was an
    # availability failure.  The planted pairs are (k, k+offset) for
    # k % 20 == 0, so found ∩ planted is a FILTER on the verified
    # frame, not a driver set intersection: two counts cross the
    # driver, zero pairs do, and no cap is needed at any corpus size.
    n_hit = out.filter(
        (F.col("id_a") % 20 == 0)
        & (F.col("id_b") == F.col("id_a") + _COPY_OFFSET)
    ).count()
    n_planted = d.filter(F.col("doc_id") % 20 == 0).count()
    recall = n_hit / max(n_planted, 1)
    if recall < 0.8:
        raise AssertionError(f"LSH recall too low: {recall:.2f}")
    return out


# --- X2b: banded LSH candidates + exact n-gram Jaccard (oracle-able) -------
# The SCALE-SHAPED spelling (r9 verdict #6; previously an all-pairs
# crossJoin fixture): candidate pairs come from an x2e-style banded
# minhash join over the WORD sets — O(docs·bands) signature rows plus
# O(Σ bucket²) candidates, never |A|×|B| — and only candidates get the
# exact-Jaccard verification kernel. Everything (md5 hex-half hashes,
# KM affine minhash, band digests, the candidate set, the Jaccard
# values) replays in DuckDB, so the banding itself is value-oracled.
# Pool B plants a near-copy (last 3 words dropped) of every pool-A doc
# so the banded candidate set is non-degenerate by construction.

_X2B_SEEDS = 16
_X2B_ROWS = 2  # rows per band -> 8 bands

_X2B_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 40 IN (0, 1)
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET},
         array_to_string(list_slice(string_split(text, ' '), 1,
           greatest(len(string_split(text, ' ')) - 3, 1)), ' ')
  FROM documents WHERE doc_id % 40 = 0
),
w AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
  FROM corpus
),
hh AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(word), 9, 8)) AS BIGINT) AS h2
  FROM w
),
sig AS (
  SELECT doc_id, s, min((h1 + s * h2) % 4294967296) AS mh
  FROM hh, LATERAL (SELECT unnest(generate_series(0, {_X2B_SEEDS - 1})) AS s) g
  GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, s // {_X2B_ROWS} AS band_id,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY s)) AS band_val
  FROM sig GROUP BY doc_id, s // {_X2B_ROWS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
  WHERE a.doc_id % 40 = 0 AND a.doc_id < {_COPY_OFFSET}
    AND (b.doc_id % 40 = 1 OR b.doc_id >= {_COPY_OFFSET})
),
sets AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM corpus
)
SELECT id_a, id_b,
       round(CAST(len(list_intersect(sa.ws, sb.ws)) AS DOUBLE)
             / (len(sa.ws) + len(sb.ws) - len(list_intersect(sa.ws, sb.ws))),
             6) AS jaccard
FROM cand
JOIN sets sa ON sa.doc_id = cand.id_a
JOIN sets sb ON sb.doc_id = cand.id_b
WHERE len(list_intersect(sa.ws, sb.ws)) >= 1
ORDER BY id_a, id_b
"""


@register("x2b_ngram_jaccard", oracle=_X2B_ORACLE, tags=("X2",))
def x2b_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidate generation + exact word-set Jaccard — the
    100 TB near-dup shape end-to-end, fully value-oracled: shuffles
    carry (doc, band digest) and word hashes, never text; candidates
    are O(Σ bucket²), not all-pairs; the exact kernel (explode+join,
    linear in pair count × doc length) verifies only candidates.
    The oracle filter mirrors exact_jaccard's inner join (pairs with
    zero shared words cannot surface a Jaccard)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # NO slice cache here (r20, measured and reverted): caching the
    # ~5% doc slice to collapse the union's six documents scans into
    # one measured a consistent ~+1 exec-s across three back-to-back
    # A/B orderings — the narrow text scans are cheaper re-run than
    # the cache write/read, the same verdict as x22's token frame and
    # x34's gram frame (OPTIMIZATION_r20.md).
    pool_a = d.filter(F.col("doc_id") % 40 == 0)
    planted = pool_a.select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
        F.array_join(
            F.slice(
                F.split("text", " "),
                1,
                F.greatest(
                    F.size(F.split("text", " ")) - 3, F.lit(1)
                ),
            ),
            " ",
        ).alias("text"),
    )
    corpus = (
        d.filter(F.col("doc_id") % 40 == 1)
        .unionByName(pool_a)
        .unionByName(planted)
    )
    # md5 once per word through a named column, all 16 seed minima in
    # ONE per-doc aggregate, band digests as map-side projections —
    # the _md5_band_frame r19 respell (see its comment: the old
    # explode(sequence(0, 15)) multiplied the signature shuffle x16
    # and paid a second bands exchange); identical arithmetic and
    # digest strings
    words = (
        corpus.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("word"),
        )
        .select("doc_id", F.md5("word").alias("__m"))
        .select(
            "doc_id",
            F.conv(F.substring("__m", 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring("__m", 9, 8), 16, 10).cast("long").alias("h2"),
        )
    )
    per_doc = words.groupBy("doc_id").agg(
        *[
            F.min(
                (F.col("h1") + F.lit(s) * F.col("h2")) % F.lit(4294967296)
            ).alias(f"__mh{s}")
            for s in range(_X2B_SEEDS)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band_id"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"__mh{s}").cast("string")
                            for s in range(b * _X2B_ROWS, (b + 1) * _X2B_ROWS)
                        ],
                    )
                ).alias("band_val"),
            )
            for b in range(_X2B_SEEDS // _X2B_ROWS)
        ]
    )
    bands = per_doc.select(
        "doc_id", F.explode(band_structs).alias("__b")
    ).select("doc_id", "__b.band_id", "__b.band_val")
    a = bands.filter(
        (F.col("doc_id") % 40 == 0) & (F.col("doc_id") < _COPY_OFFSET)
    ).select(F.col("doc_id").alias("id_a"), "band_id", "band_val")
    b = bands.filter(
        (F.col("doc_id") % 40 == 1) | (F.col("doc_id") >= _COPY_OFFSET)
    ).select(F.col("doc_id").alias("id_b"), "band_id", "band_val")
    cand = (
        a.join(b, ["band_id", "band_val"])
        .select("id_a", "id_b")
        .distinct()
    )
    # LOUD growth bound, banded edition (r6 rule: "named so it never
    # silently grows"): degenerate band buckets — many docs with
    # identical word sets, exactly what dedup corpora contain — would
    # explode the bucket join quadratically; fail here rather than
    # silently running a giant verification join.  cand is cached
    # first (review-pass r16): the count otherwise executed the whole
    # minhash/banding pipeline once for the bound and AGAIN when the
    # returned exact_jaccard frame evaluates; the frame is bounded to
    # <= 50k pairs by this very check, and the harness clears the pin.
    cand.cache()
    n_cand = cand.count()
    if n_cand > 50_000:
        raise AssertionError(
            f"x2b banded candidate set grew to {n_cand} pairs — band "
            "buckets degenerated; tighten bands or dedup exact copies "
            "(x1) before the LSH pass"
        )
    return (
        exact_jaccard(corpus, cand, "doc_id", "text")
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


# --- X2c: SimHash signatures (bit-exact cross-engine oracle) ---------------


def _simhash_oracle() -> str:
    votes = ",\n    ".join(
        f"sum(((h // {1 << j}) % 2) * 2 - 1) AS v{j}" for j in range(SIMHASH_BITS)
    )
    bits = ", ".join(
        f"CASE WHEN v{j} > 0 THEN '1' ELSE '0' END"
        for j in range(SIMHASH_BITS - 1, -1, -1)
    )
    return f"""
WITH words AS (
  SELECT doc_id AS doc,
         CAST(('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15)) AS BIGINT) AS h
  FROM documents
  WHERE doc_id % 25 = 0
),
votes AS (
  SELECT doc,
    {votes}
  FROM words GROUP BY doc
)
SELECT doc, concat({bits}) AS simhash_bits
FROM votes
ORDER BY doc
"""


@register("x2c_simhash", oracle=_simhash_oracle(), tags=("X2",))
def x2c_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return simhash(d, "doc_id", "text").orderBy("doc")


# --- X1c: embedding-cosine near-duplicate detection (oracle-able) ----------

_X1C_TNUM, _X1C_TDEN = 2401, 2500  # θ² = 0.98² = 9604/10000 exact rational
_X1C_SCALE = 10_000

_X1C_ORACLE = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id % 10 = 0
),
corpus AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + {_COPY_OFFSET} AS vec_id,
         list_transform(v, x -> x * 1.01 + 0.001) AS v
  FROM base
),
quant AS (
  SELECT vec_id, vq,
         CAST(list_sum(list_transform(vq, x -> x*x)) AS BIGINT) AS n2
  FROM (
    SELECT vec_id,
           list_transform(
             v, x -> CAST(floor(x / sqrt(n2d) * {_X1C_SCALE} + 0.5)
                          AS BIGINT)) AS vq
    FROM (SELECT vec_id, v,
                 list_reduce(list_transform(v, x -> x*x),
                             (a, b) -> a + b) AS n2d
          FROM corpus))
),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.n2 AS n2a, b.n2 AS n2b,
         CAST(list_sum(list_transform(list_zip(a.vq, b.vq),
                                      p -> p[1]*p[2])) AS BIGINT) AS dd
  FROM quant a JOIN quant b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       round(CAST(dd AS DOUBLE)
             / sqrt(CAST(n2a AS DOUBLE) * CAST(n2b AS DOUBLE)), 6) AS cosine
FROM scored
WHERE dd > 0
  AND CAST(dd AS HUGEINT) * CAST(dd AS HUGEINT) * {_X1C_TDEN}
      >= {_X1C_TNUM} * CAST(n2a AS HUGEINT) * CAST(n2b AS HUGEINT)
ORDER BY id_a, id_b
"""


@register("x1c_embedding_neardup", oracle=_X1C_ORACLE, tags=("X1", "X3"))
def x1c_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection by embedding cosine ≥ 0.98 over a corpus with
    planted perturbed copies (v*1.01+0.001 — near-parallel, cosine ≈ 1).
    Exact all-pairs here; at scale the candidate set comes from the LSH/
    IVF buckets (operators/similarity.py) and only candidates are scored.

    Integer-exact gate (r17, VERDICT-r16 #1 — the last documented
    correctness latent): a raw float ``cosine >= 0.98`` filter flips
    cross-engine when a pair lands within a ULP of the boundary, so the
    gate respells as the x20/x49 rational predicate over quantized unit
    vectors — ``dd > 0 AND dd²·2500 ≥ 2401·n2a·n2b`` in decimal(38,0)
    (HUGEINT in DuckDB), every term an exact integer. The display
    ``cosine`` derives AFTER the gate from the same integers via a fixed
    sequence of single correctly-rounded IEEE ops (long→double casts are
    exact at these magnitudes: dd ≤ 6.4e9, n2 ≈ 1e8), so both engines
    emit bit-identical doubles.
    """
    from ..operators.semantic import quantized_unit_vectors

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    base = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    planted = base.select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"),
        F.transform("v", lambda x: x * 1.01 + 0.001).alias("v"),
    )
    corpus = base.unionByName(planted)
    quant = quantized_unit_vectors(corpus, "vec_id", "v", _X1C_SCALE)
    a = quant.select(
        F.col("vec_id").alias("id_a"),
        F.col("vq").alias("vqa"),
        F.col("n2").alias("n2a"),
    )
    b = quant.select(
        F.col("vec_id").alias("id_b"),
        F.col("vq").alias("vqb"),
        F.col("n2").alias("n2b"),
    )
    # materialize dd BEFORE the gate references it twice (__words idiom)
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        "n2a",
        "n2b",
        F.aggregate(
            F.zip_with(F.col("vqa"), F.col("vqb"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dd"),
    )
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    gated = pairs.filter(
        (F.col("dd") > 0)
        & (
            dec(F.col("dd")) * dec(F.col("dd")) * F.lit(_X1C_TDEN)
            >= F.lit(_X1C_TNUM) * dec(F.col("n2a")) * dec(F.col("n2b"))
        )
    )
    return gated.select(
        "id_a",
        "id_b",
        F.round(
            F.col("dd").cast("double")
            / F.sqrt(F.col("n2a").cast("double") * F.col("n2b").cast("double")),
            6,
        ).alias("cosine"),
    ).orderBy("id_a", "id_b")


# --- X12: transitive near-dup clusters (connected components) --------------

_X12_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
),
corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET},
         array_to_string(string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) - 3, 1)], ' ')
  FROM base
  UNION ALL
  SELECT doc_id + {2 * _COPY_OFFSET},
         array_to_string(string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) - 6, 1)], ' ')
  FROM base
),
pool AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w FROM corpus
),
jac AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib,
         CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
         / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) AS j
  FROM pool a JOIN pool b ON a.doc_id < b.doc_id
),
edges0 AS (SELECT ia AS s, ib AS d FROM jac WHERE j >= 0.9),
edges AS (SELECT s, d FROM edges0 UNION SELECT d, s FROM edges0),
reach AS (
  SELECT doc_id AS n, doc_id AS m FROM corpus
  UNION
  SELECT e.s, r.m FROM edges e JOIN reach r ON e.d = r.n
),
comp AS (SELECT n, min(m) AS c FROM reach GROUP BY n)
SELECT n AS doc_id, c AS cluster_id,
       CAST(n = c AS INTEGER) AS is_canonical,
       CAST(count(*) OVER (PARTITION BY c) AS BIGINT) AS cluster_size
FROM comp ORDER BY doc_id
"""


@register("x12_neardup_clusters", oracle=_X12_ORACLE, tags=("X2", "X1"))
def x12_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end transitive fuzzy dedup: word-Jaccard pairs (>= 0.9)
    over a corpus with two planted perturbed copies per base doc (drop
    last 3 / last 6 words), clustered into connected components
    (operators/components.py — min-label propagation + pointer jumping,
    O(log diameter) rounds), then one canonical doc per cluster
    (smallest id). A~B and B~C collapse to one cluster even when A~C
    scores below threshold — the pairs-only detectors can't do that.

    The all-pairs candidate stage is a small-pool verification probe
    (like x2b); at scale candidates come from the LSH buckets and ONLY
    the clustering step shown here is on the full-corpus path.
    NOTE: unlike the declarative queries, calling this function RUNS
    the clustering (iterative fixpoint with per-round checkpoints); the
    returned frame is the materialized final labelling plus the cheap
    per-cluster projection.
    The DuckDB oracle computes the same clusters by recursive-CTE
    transitive closure — an independent algorithm, same fixpoint.
    """
    from pyspark.sql import Window

    from ..operators.components import connected_components

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )

    def drop_last(n: int):
        words = F.split("text", " ")
        keep = F.greatest(F.size(words) - F.lit(n), F.lit(1))
        return F.array_join(F.slice(words, F.lit(1), keep), " ")

    corpus = d.unionByName(
        d.select((F.col("doc_id") + _COPY_OFFSET).alias("doc_id"), drop_last(3).alias("text"))
    ).unionByName(
        d.select((F.col("doc_id") + 2 * _COPY_OFFSET).alias("doc_id"), drop_last(6).alias("text"))
    )
    pool = corpus.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("w")
    )
    a = pool.select(F.col("doc_id").alias("id_a"), F.col("w").alias("wa"))
    b = pool.select(F.col("doc_id").alias("id_b"), F.col("w").alias("wb"))
    scored = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("wa", "wb"))
    jac = inter / (F.size("wa") + F.size("wb") - inter)
    edges = scored.filter(jac >= 0.9).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(
        edges, "src", "dst", nodes=corpus.select("doc_id")
    )
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).cast("int").alias("is_canonical"),
        F.count("*").over(w).alias("cluster_size"),
    ).orderBy("doc_id")


_X12B_SEEDS = 16
_X12B_ROWS = 4  # -> 4 bands: the production geometry (see docstring)

_X12B_ORACLE = f"""
WITH RECURSIVE {_md5_lsh_ctes(_X12B_SEEDS, _X12B_ROWS)},{_MD5_PIPELINE_TAIL}"""


@register("x12b_lsh_dedup_pipeline", oracle=_X12B_ORACLE, tags=("X2", "X6"))
def x12b_lsh_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fuzzy-dedup pipeline in its FULL-CORPUS shape — exactly what
    runs at 100 TB, with no all-pairs stage anywhere:

      MinHash-LSH bucketed candidates → exact-Jaccard verification on
      candidates only → connected components (operators/components.py)
      → one canonical doc per cluster (smallest id).

    VALUE-ORACLED r13 (VERDICT r12 #5): rides the cross-engine md5
    hash family (shared-machinery comment above :func:`_md5_lsh_ctes`)
    with the PRODUCTION band geometry — 16 hashes / 4 bands: the
    signature pass is the pipeline's dominant cost and planted dups
    sit at jaccard >= 0.9, where 4 bands of 4 rows still collide with
    P ~ 0.99 per pair (x12c is the same pipeline at 16x2). DuckDB
    re-derives the candidate set, the verified edge set, the
    transitive clusters and the final summary end to end. The 0.85
    dup gate is integer-exact (20*inter >= 17*union) on both engines:
    the synthetic corpus's tiny vocabulary makes unrelated docs
    overlap heavily (mean cross-doc jaccard ~0.65); a threshold below
    that connects half the corpus and bloats the edge list.

    Self-verifies: >= 80% of planted (base, copy) pairs (x2-style:
    docs %20==0 copied minus their last 3 words) land in the SAME
    cluster — LSH recall flowing through the clustering step. The
    canonical is min(cluster) by construction. Returns the per-cluster
    summary for non-singleton clusters.
    """
    from ..operators.components import connected_components

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(_planted_near_dups(d))
    cand = _md5_lsh_candidates(
        _md5_band_frame(corpus, seeds=_X12B_SEEDS, rows=_X12B_ROWS)
    )
    edges = (
        _md5_verified_pairs(corpus, cand)
        .filter(20 * F.col("n_inter") >= 17 * F.col("n_union"))
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comp = connected_components(edges, "src", "dst", nodes=corpus.select("doc_id"))

    # planted pairs must share a component (bounded: one row per planted pair)
    planted = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("base_id"),
        (F.col("doc_id") + _COPY_OFFSET).alias("copy_id"),
    )
    joined = (
        planted.join(
            comp.select(
                F.col("node").alias("base_id"), F.col("component").alias("c1")
            ),
            "base_id",
        )
        .join(
            comp.select(
                F.col("node").alias("copy_id"), F.col("component").alias("c2")
            ),
            "copy_id",
        )
    )
    n_planted = planted.count()
    n_together = joined.filter(F.col("c1") == F.col("c2")).count()
    if n_planted == 0:
        # 0 < 0.8*0 is False — the recall check would self-certify on
        # an empty plant (review-pass r16; the x20/x49 guard pattern)
        raise AssertionError("x12b: planted-pair set is empty")
    if n_together < 0.8 * n_planted:
        raise AssertionError(
            f"dedup pipeline recall too low: {n_together}/{n_planted} "
            "planted pairs clustered together"
        )

    out = (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("node").alias("canonical_doc"),
        )
        .filter(F.col("cluster_size") > 1)
        .orderBy("component")
    )
    return out.select(
        F.col("component").alias("cluster_id"), "cluster_size", "canonical_doc"
    )


# --- X19: incremental dedup — new batch vs existing corpus ------------------
# The workflow every continuously-crawled 100 TB corpus actually runs:
# dedup the NEW batch against itself and against what's already stored,
# WITHOUT re-deduping the corpus. Scale shape: the corpus is never
# shuffled — its single scan is semi-joined against a BROADCAST of the
# (small) batch's hashes to find collisions, and the batch then
# anti-joins the (even smaller) collision set. Both joins broadcast the
# small side; at 1000 executors the 100 TB side stays map-only.

_X19_ORACLE = """
WITH new_batch AS (
  SELECT doc_id + 2000000 AS doc_id, text
  FROM documents WHERE doc_id % 15 = 0          -- re-crawls (already stored)
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, concat('fresh ', text) AS text
  FROM documents WHERE doc_id % 15 = 7          -- genuinely new
)
SELECT doc_id, md5(text) AS text_hash
FROM (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM new_batch nb
  WHERE NOT EXISTS (
    SELECT 1 FROM documents c WHERE md5(c.text) = md5(nb.text)
  )
) WHERE rn = 1
ORDER BY doc_id
"""


@register("x19_incremental_dedup", oracle=_X19_ORACLE, tags=("X1", "X2"))
def x19_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admit only new-batch docs whose text is neither already in the
    corpus nor duplicated within the batch (keep-lowest-id within the
    batch)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new_batch = (
        d.filter(F.col("doc_id") % 15 == 0)
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 15 == 7).select(
                (F.col("doc_id") + 3_000_000).alias("doc_id"),
                F.concat(F.lit("fresh "), F.col("text")).alias("text"),
            )
        )
    )
    batch_hashed = new_batch.withColumn("text_hash", F.md5("text"))
    # corpus scan (the 100 TB side): ONE pass, semi-join against the
    # broadcast batch hash set -> the collision hashes (<= batch size)
    collisions = (
        d.select(F.md5("text").alias("text_hash"))
        .join(
            F.broadcast(batch_hashed.select("text_hash").distinct()),
            "text_hash",
            "left_semi",
        )
        .distinct()
    )
    # batch side: drop corpus collisions (broadcast anti), then
    # within-batch exact dedup (window over the hash, keep lowest id)
    from pyspark.sql import Window

    w = Window.partitionBy("text_hash").orderBy("doc_id")
    return (
        batch_hashed.join(F.broadcast(collisions), "text_hash", "left_anti")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "text_hash")
        .orderBy("doc_id")
    )


# --- X20: SemDeDup — semantic dedup via clustering --------------------------
# Exact/MinHash dedup (x1/x2) catch textual copies; SemDeDup (Abbas et
# al. 2023) catches *semantic* copies — embeddings that nearly coincide
# — by confining the O(n²) cosine scan to k-means clusters. Rows-only
# through r7 (iterative clustering + a sequential greedy prune looked
# non-SQL-expressible); VALUE-ORACLED from r8 by making every decision
# integer-exact and unrolling both recursions the x35 way:
#   * unit vectors quantize to integers once (bit-identical IEEE op
#     sequence in both engines), so centroid assignment (an exact
#     integer comparator key — no sqrt, no float dot), centroid sums,
#     and the θ²-threshold test are pure integer arithmetic DuckDB
#     replays exactly (operators/semantic.py, integer section);
#   * the k-means iterations unroll as assign/update CTE pairs;
#   * greedy keep-first pruning respells as a FIXPOINT UNROLL —
#     keep_t(i) = no edge to a smaller-id j with keep_{t-1}(j) — exact
#     once t covers the deepest drop/keep chain; the Spark side replays
#     greedy per cluster and RAISES if the unroll depth is short, so
#     the oracle can never silently diverge.

_X20_K = 8
_X20_ITERS = 2
_X20_ROUNDS = 6  # fixpoint unroll depth, shared with the oracle
_X20_TNUM, _X20_TDEN = 9801, 10_000  # θ² = 0.99² as an exact rational
_X20_SCALE = 10_000


def _int_kmeans_cte_parts(
    base_cte: str, k: int, iters: int, scale: int
) -> tuple[list[str], str]:
    """Unrolled-CTE DuckDB replay of operators/semantic.py's integer
    spherical k-means over a caller-supplied ``base`` CTE (vec_id,
    emb double-list): quantized unit vectors -> seeded centroids ->
    ``iters`` (assign, integer centroid-sum) rounds -> final
    assignment. Returns (cte_parts, final_assignment_name) so callers
    append their own downstream CTEs — shared by x20 (SemDeDup prune)
    and x51 (cluster-balanced sampling)."""
    quant = f"""
{base_cte},
vec AS (
  SELECT vec_id, vq,
         CAST(list_sum(list_transform(vq, x -> x*x)) AS BIGINT) AS n2
  FROM (
    SELECT vec_id,
           list_transform(
             emb, x -> CAST(floor(x / sqrt(n2d) * {scale} + 0.5)
                            AS BIGINT)) AS vq
    FROM (SELECT vec_id, emb,
                 list_reduce(list_transform(emb, x -> x*x),
                             (a, b) -> a + b) AS n2d
          FROM base))
),
cent0 AS (
  -- n2s > 0 mirrors the engine's zero-centroid dropout
  -- (operators/semantic.py::_int_assign): a zero-sum centroid carries
  -- no direction and DROPS OUT instead of dividing by zero — the
  -- oracle must take the identical decision (ADVICE r9)
  SELECT cluster, sv, n2s FROM (
    SELECT cluster, sv,
           CAST(list_sum(list_transform(sv, x -> x*x)) AS HUGEINT) AS n2s
    FROM (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                   AS cluster,
                 vq AS sv
          FROM (SELECT vec_id, vq FROM vec ORDER BY vec_id LIMIT {k})))
  WHERE n2s > 0
)"""
    parts = [quant]
    for t in range(iters + 1):
        parts.append(f"""
k{t} AS (
  SELECT vec_id, vq, n2, cluster,
         CASE WHEN dot >= 0 THEN (dot*dot*1000000) // n2s
              ELSE -((dot*dot*1000000) // n2s) END AS key
  FROM (
    SELECT v.vec_id, v.vq, v.n2, c.cluster, c.n2s,
           CAST(list_sum(list_transform(list_zip(v.vq, c.sv),
                                        p -> p[1]*p[2])) AS HUGEINT) AS dot
    FROM vec v CROSS JOIN cent{t} c)
),
a{t} AS (
  SELECT vec_id, vq, n2, cluster FROM (
    SELECT vec_id, vq, n2, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY key DESC, cluster) AS rn
    FROM k{t}) WHERE rn = 1
)""")
        if t < iters:
            parts.append(f"""
cent{t + 1} AS (
  -- n2s > 0: zero-sum centroids drop out, mirroring _int_assign
  SELECT cluster, sv, n2s FROM (
    SELECT cluster, sv,
           CAST(list_sum(list_transform(sv, x -> x*x)) AS HUGEINT) AS n2s
    FROM (
      SELECT cluster, list(sx ORDER BY d) AS sv
      FROM (
        SELECT cluster, d, CAST(sum(x) AS BIGINT) AS sx
        FROM (SELECT cluster, unnest(vq) AS x,
                     generate_subscripts(vq, 1) AS d
              FROM a{t})
        GROUP BY cluster, d)
      GROUP BY cluster))
  WHERE n2s > 0
)""")
    return parts, f"a{iters}"


_X20_BASE = f"""base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
  UNION ALL
  SELECT vec_id + {_COPY_OFFSET},
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01 + 0.001)
  FROM embeddings WHERE vec_id % 5 = 0
)"""


def _x20_oracle() -> str:
    """Unrolled-CTE DuckDB replay of the integer SemDeDup pipeline."""
    parts, fin = _int_kmeans_cte_parts(
        _X20_BASE, _X20_K, _X20_ITERS, _X20_SCALE
    )
    parts.append(f"""
edges AS (
  SELECT i, j FROM (
    SELECT a.vec_id AS i, b.vec_id AS j,
           CAST(list_sum(list_transform(list_zip(a.vq, b.vq),
                                        p -> p[1]*p[2])) AS HUGEINT) AS dd,
           CAST(a.n2 AS HUGEINT) AS n2i, CAST(b.n2 AS HUGEINT) AS n2j
    FROM {fin} a JOIN {fin} b
      ON a.cluster = b.cluster AND b.vec_id < a.vec_id)
  WHERE dd > 0 AND dd*dd*{_X20_TDEN} >= {_X20_TNUM} * n2i * n2j
),
keep0 AS (SELECT vec_id, TRUE AS keep FROM {fin})""")
    for r in range(1, _X20_ROUNDS + 1):
        parts.append(f"""
keep{r} AS (
  SELECT a.vec_id,
         NOT EXISTS (SELECT 1 FROM edges e JOIN keep{r - 1} p
                       ON p.vec_id = e.j
                     WHERE e.i = a.vec_id AND p.keep) AS keep
  FROM {fin} a
)""")
    parts.append(f"""
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN k.keep THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM {fin} a JOIN keep{_X20_ROUNDS} k USING (vec_id)
ORDER BY a.vec_id""")
    ctes = ",".join(parts[:-1])
    return "WITH " + ctes + parts[-1]


@register("x20_semantic_dedup", oracle=_x20_oracle(), tags=("X20", "X1", "X3"))
def x20_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.semantic import (
        int_kmeans_assign,
        int_semdedup_keep,
        quantized_unit_vectors,
    )

    e = load_table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding")
    planted = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"),
        # near-parallel perturbation: cosine to the original ≈ 1
        F.transform("embedding", lambda x: x * 1.01 + 0.001).alias(
            "embedding"
        ),
    )
    corpus = base.unionByName(planted)
    quant = quantized_unit_vectors(corpus, "vec_id", "embedding", _X20_SCALE)
    assigned = int_kmeans_assign(quant, k=_X20_K, iters=_X20_ITERS)
    out = int_semdedup_keep(
        assigned,
        threshold_num=_X20_TNUM,
        threshold_den=_X20_TDEN,
        rounds=_X20_ROUNDS,
    ).cache()
    try:
        # the oracle proves cross-engine equality; this proves the
        # dedup WORKS — ≥90% of planted near-parallel pairs must lose
        # at least one half
        pairs = (
            out.filter(F.col("vec_id") < _COPY_OFFSET)
            .select(F.col("vec_id").alias("o_id"), F.col("keep").alias("ok"))
            .join(
                out.filter(F.col("vec_id") >= _COPY_OFFSET).select(
                    (F.col("vec_id") - _COPY_OFFSET).alias("o_id"),
                    F.col("keep").alias("ck"),
                ),
                "o_id",
            )
        )
        n_pairs = pairs.count()
        if n_pairs == 0:
            # a broken origin/copy join must FAIL the check, not skip
            # it — zero pairs means the plant itself is gone
            raise AssertionError("SemDeDup planted-pair join lost all rows")
        n_resolved = pairs.filter(
            (F.col("ok") == 0) | (F.col("ck") == 0)
        ).count()
        if n_resolved < 0.9 * n_pairs:
            raise AssertionError(
                f"SemDeDup resolved only {n_resolved}/{n_pairs} planted pairs"
            )
        return (
            out.select(
                "vec_id", F.col("cluster").cast("long").alias("cluster"), "keep"
            )
            .orderBy("vec_id")
            .localCheckpoint()  # sever lineage from the cached frame
        )
    finally:
        out.unpersist(blocking=False)


# --- X49: semantic benchmark contamination (embedding-space x16) ------------
# The decontamination quartet's fourth member: x16 catches exact
# n-gram overlap, x24 its zero-shuffle bloom spelling, x41 fractional
# overlap — but a PARAPHRASED benchmark item shares no shingles. The
# semantic pass flags corpus embeddings whose cosine to ANY benchmark
# embedding clears θ, on x20's integer machinery: unit vectors
# quantize to integers once (bit-identical IEEE op sequence both
# engines), and cos ≥ θ respells as dot > 0 AND dot²·den ≥ num·n2i·n2j
# (θ² = 9801/10000 exact rational, decimal(19,0) products JVM-side,
# HUGEINT in DuckDB) — so every flag decision is integer-exact and the
# whole pass value-oracles. Scale shape: the benchmark side is an eval
# suite (KBs against 100 TB) → broadcast nested-loop with a map-side
# integer dot; the corpus streams through ONE scan, no shuffle before
# the per-doc aggregate of the flagged slice. Planted contamination:
# perturbed copies (v·1.01 + 0.001, cosine ≈ 1) of every third
# benchmark vector join the corpus under offset ids.

_X49_TNUM, _X49_TDEN = 9801, 10_000  # θ² = 0.99² as an exact rational
_X49_SCALE = 10_000

_X49_ORACLE = f"""
WITH raw AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
pool AS (
  SELECT vec_id, emb, vec_id % 13 = 0 AS is_bench FROM raw
  UNION ALL
  SELECT vec_id + {_COPY_OFFSET},
         list_transform(emb, x -> x * 1.01 + 0.001), FALSE
  FROM raw WHERE vec_id % 13 = 0 AND vec_id % 3 = 0
),
quant AS (
  SELECT vec_id, is_bench, vq,
         CAST(list_sum(list_transform(vq, x -> x*x)) AS BIGINT) AS n2
  FROM (
    SELECT vec_id, is_bench,
           list_transform(
             emb, x -> CAST(floor(x / sqrt(n2d) * {_X49_SCALE} + 0.5)
                            AS BIGINT)) AS vq
    FROM (SELECT vec_id, is_bench, emb,
                 list_reduce(list_transform(emb, x -> x*x),
                             (a, b) -> a + b) AS n2d
          FROM pool))
),
hits AS (
  SELECT c.vec_id, CAST(count(*) AS BIGINT) AS n_bench_hits
  FROM (SELECT * FROM quant WHERE NOT is_bench) c
  JOIN (SELECT * FROM quant WHERE is_bench) b
    ON CAST(list_sum(list_transform(list_zip(c.vq, b.vq),
                                    p -> p[1]*p[2])) AS HUGEINT) > 0
   AND CAST(list_sum(list_transform(list_zip(c.vq, b.vq),
                                    p -> p[1]*p[2])) AS HUGEINT)
       * CAST(list_sum(list_transform(list_zip(c.vq, b.vq),
                                      p -> p[1]*p[2])) AS HUGEINT)
       * {_X49_TDEN}
       >= {_X49_TNUM} * CAST(c.n2 AS HUGEINT) * CAST(b.n2 AS HUGEINT)
  GROUP BY c.vec_id
)
SELECT vec_id, n_bench_hits,
       CAST(CASE WHEN vec_id >= {_COPY_OFFSET} THEN 1 ELSE 0 END AS BIGINT)
         AS is_planted
FROM hits ORDER BY vec_id
"""


@register(
    "x49_semantic_contamination",
    oracle=_X49_ORACLE,
    tags=("X49", "X16", "X20", "X3"),
)
def x49_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag corpus embeddings within cosine θ=0.99 of any benchmark
    embedding — contamination x16/x24/x41 cannot see (paraphrases share
    no shingles). Integer-exact end-to-end on x20's quantizer
    (operators/semantic.py): the flag predicate is the same
    dot²·den ≥ num·n2·n2 decimal spelling int_semdedup_keep uses.
    Self-asserts: ≥90% of planted perturbed benchmark copies flag
    (quantization wobble bounds it below 100%), and no flagged row is
    a benchmark member itself (bench ids are excluded from the corpus
    side by construction)."""
    from ..operators.semantic import quantized_unit_vectors

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bench = e.filter(F.col("vec_id") % 13 == 0)
    planted = bench.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01 + 0.001).alias(
            "embedding"
        ),
    )
    corpus = e.filter(F.col("vec_id") % 13 != 0).unionByName(planted)
    # No repartition (r18, VERDICT-r17 #2): the former
    # repartition(defaultParallelism) undid the single-file fixture
    # layout at the price of shuffling the whole corpus — the bench now
    # reads a 16-slice layout (bench.py bench_layout), so the
    # integer-dot scan parallelism is the input's own, as at 100 TB.

    cq = quantized_unit_vectors(corpus, "vec_id", "embedding", _X49_SCALE)
    bq = quantized_unit_vectors(bench, "vec_id", "embedding", _X49_SCALE).select(
        F.col("vec_id").alias("bid"),
        F.col("vq").alias("bvq"),
        F.col("n2").alias("bn2"),
    )
    # VECTORIZED integer-dot scan (r20, guide §4.2 — the x3g/x29/
    # int_kmeans "blessed embedding-math path"): the old spelling was a
    # BroadcastNestedLoopJoin whose per-PAIR dot ran an interpreted
    # zip_with + aggregate HOF — |corpus|·|bench| O(d) expression-tree
    # evaluations dominated the query.  The bench side is an eval
    # suite (bounded — the x3 broadcast contract; guarded below), so
    # it rides the task closure and each Arrow batch of corpus vectors
    # does ONE exact int64 matmul (|dot| ≤ 64·scale² « 2^63).  The
    # θ-threshold compare dd²·den ≥ num·n2·bn2 needs >63 bits: a
    # float64 pre-filter decides everything outside a ±1e12 margin
    # (values ~1e20, accumulated float error ~1e5 — eight orders of
    # magnitude of slack) and only borderline pairs re-check in exact
    # arbitrary-precision Python ints, so every verdict is identical
    # to the old decimal(19,0) spelling.  Same one-corpus-scan shape,
    # zero joins.
    brows = bq.collect()  # bounded: the benchmark embedding set
    if len(brows) > 250_000:
        raise AssertionError(
            f"x49 bench side grew to {len(brows)} vectors — too large "
            "for the closure-shipped scan; shard the benchmark set"
        )
    import numpy as _np

    _bm = _np.array([list(r.bvq) for r in brows], dtype=_np.int64)
    _bn2 = _np.array([int(r.bn2) for r in brows], dtype=_np.int64)
    num, den = _X49_TNUM, _X49_TDEN

    def _score(batches):
        import numpy as np
        import pandas as pd

        if _bm.size == 0:
            return
        bt = _bm.T  # (d, m)
        bn2f = _bn2.astype(np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(
                [np.asarray(v, dtype=np.int64) for v in pdf["vq"]]
            )
            n2v = pdf["n2"].to_numpy(dtype=np.int64)
            dd = x @ bt  # (n, m) exact int64
            lhs = dd.astype(np.float64) ** 2 * den
            rhs = np.outer(n2v.astype(np.float64), bn2f) * num
            hit = (dd > 0) & (lhs >= rhs)
            border = (dd > 0) & (np.abs(lhs - rhs) <= 1e12)
            if border.any():
                for i, j in zip(*np.nonzero(border)):
                    d_ij = int(dd[i, j])
                    hit[i, j] = d_ij > 0 and (
                        d_ij * d_ij * den
                        >= num * int(n2v[i]) * int(_bn2[j])
                    )
            n_hits = hit.sum(axis=1).astype(np.int64)
            keep = n_hits > 0
            if keep.any():
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy()[keep],
                        "n_bench_hits": n_hits[keep],
                    }
                )

    hits = cq.select("vec_id", "vq", "n2").mapInPandas(
        _score, "vec_id bigint, n_bench_hits bigint"
    )
    out = hits.select(
        "vec_id",
        "n_bench_hits",
        (F.col("vec_id") >= _COPY_OFFSET).cast("long").alias("is_planted"),
    ).cache()
    try:
        # scale assert (x16/x37 pattern, checked HERE because the
        # returned frame is checkpointed): the integer-dot scan must be
        # ONE map-side pass — the bench rides the task closure, so the
        # plan must carry the MapInPandas node and NO join of any kind
        # (r20: the former BroadcastNestedLoopJoin assert retired with
        # the join itself). Inside the try so an assert failure still
        # unpersists the cache (review-pass finding).
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "MapInPandas" not in plan or "Join" in plan:
            raise AssertionError(
                "x49: integer-dot scan must be one map-side pass: " + plan
            )
        n_planted = planted.count()
        n_flagged_planted = out.filter(F.col("is_planted") == 1).count()
        if n_planted == 0:
            raise AssertionError("x49 fixture lost its planted copies")
        if n_flagged_planted < 0.9 * n_planted:
            raise AssertionError(
                f"semantic pass missed planted contamination: "
                f"{n_flagged_planted}/{n_planted}"
            )
        # NO bench-leak self-check here (review-pass r17): the old
        # left_semi count==0 assert was structurally vacuous — corpus =
        # (vec_id%13!=0) ∪ (planted ids >= 1e6) excludes every bench id
        # (vec_id%13==0, « 1e6) by construction, so the assert guarded
        # the fixture plant, never the flag pipeline, and could not
        # fire under any realizable data. The falsifiable exclusion
        # proof is the value oracle: the oracle's pool CTE re-derives
        # the same corpus/bench split, so a leaked bench id would
        # surface as a hash mismatch.
        return out.orderBy("vec_id").localCheckpoint()
    finally:
        out.unpersist(blocking=False)


# --- X2d: MLlib MinHashLSH (the packaged alternative) -----------------------
# operators/dedup.py builds MinHash-LSH from first principles (banded,
# seed-deterministic, no fitted model object). Spark also SHIPS the op:
# ml.feature.MinHashLSH + approxSimilarityJoin — the path most users
# reach for first. This query proves that packaged path end-to-end on
# the same planted near-dups x2 uses: HashingTF shingle vectors →
# fitted MinHash model → approxSimilarityJoin at a Jaccard-distance
# threshold; recall over planted pairs asserted. The model's hash
# seeds are internal, so candidate SETS are engine-specific (the
# custom x2 carries the hash-oracled twin x2b/x2c) — but the recall
# CONTRACT and the planted-pair denominator are fixture-derivable,
# so they are oracled as a flag + count (r11).

_X2D_ORACLE = """
SELECT CAST(1 AS BIGINT) AS recall_ge_80pct,
       CAST(1 AS BIGINT) AS has_candidates,
       CAST(count(*) AS BIGINT) AS n_planted_total
FROM documents WHERE doc_id % 20 = 0
"""


@register("x2d_mllib_minhash", oracle=_X2D_ORACLE, tags=("X2",))
def x2d_mllib_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    from ..operators.dedup import word_shingles

    corpus = d.select("doc_id", "text").unionByName(
        _planted_near_dups(d)
    ).select("doc_id", word_shingles("text", 3).alias("shingles"))
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18
    )
    feats = tf.transform(corpus).filter(
        # MinHashLSH requires at least one non-zero entry
        F.size("shingles") > 0
    )
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    )
    model = lsh.fit(feats)
    pairs = (
        model.approxSimilarityJoin(feats, feats, 0.6, distCol="jaccard_dist")
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            "jaccard_dist",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    # cache before the two counts (review-pass r16): planted.count()
    # and pairs.count() each independently executed the
    # approxSimilarityJoin self-join — the query's dominant cost ran
    # twice; the harness clears the pin
    pairs.cache()
    planted = pairs.filter(F.col("id_b") == F.col("id_a") + _COPY_OFFSET)
    n_planted_found = planted.count()
    n_expected = d.filter(F.col("doc_id") % 20 == 0).count()
    if n_expected == 0:
        # with a zero denominator the recall check AND the oracle's
        # literal-1 recall flag both pass vacuously (review-pass r16)
        raise AssertionError("x2d: planted-copy set is empty")
    if n_planted_found < 0.8 * n_expected:
        raise AssertionError(
            f"MLlib LSH recall too low: {n_planted_found}/{n_expected}"
        )
    n_pairs = pairs.count()
    return spark.createDataFrame(
        [
            (
                int(n_planted_found >= 0.8 * n_expected),
                int(n_pairs > 0),
                int(n_expected),
            )
        ],
        "recall_ge_80pct long, has_candidates long, n_planted_total long",
    )


# --- X26: deterministic corpus shuffle (training-order permutation) ---------
# Before sharding a corpus for training you shuffle it ONCE,
# reproducibly — seeded hash keys, not rand(): the layout is a pure
# function of (seed, doc_id), so any re-run, resume, or debugging
# session sees byte-identical shard contents. Scale shape: shard
# assignment is a hash mod (map-side, no order needed ACROSS shards —
# shards are consumed independently), and in-shard order is a window
# sort PARTITIONED BY shard, so the sort parallelizes per shard. A
# global row_number would funnel the corpus through one partition —
# the exact bottleneck this formulation avoids.
#
# VALUE-ORACLED since r7 (was rows-only): addressing moved from
# xxhash64 (Spark-only) to the repo's md5 scheme, so the ENTIRE
# permutation is cross-engine reproducible — DuckDB derives the
# identical (shard, position) for every document, and the oracle
# hash-checks a per-shard digest of the full address map. That is the
# operator's own contract ("any engine can re-derive the layout")
# promoted from a claim to a checked property. Self-checks retained:
# permutation, determinism, seed sensitivity, shard balance.

_X26_ORACLE = """
WITH addr AS (
  SELECT doc_id,
         md5('42:' || CAST(doc_id AS VARCHAR)) AS key_hex,
         CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 8 AS shard
  FROM documents
),
placed AS (
  SELECT shard, doc_id,
         row_number() OVER (PARTITION BY shard
                            ORDER BY key_hex, doc_id) AS position
  FROM addr
)
SELECT CAST(shard AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       md5(string_agg(CAST(doc_id AS VARCHAR) || ':' ||
                      CAST(position AS VARCHAR), ',' ORDER BY position))
         AS addr_digest
FROM placed GROUP BY shard ORDER BY shard
"""


@register("x26_corpus_shuffle", oracle=_X26_ORACLE, tags=("X26", "X13", "O4"))
def x26_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    n_shards = 8

    def shuffled(seed: int) -> DataFrame:
        key = F.md5(
            F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))
        )
        shard = (
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
        ).cast("int")
        w = W.partitionBy("shard").orderBy("key", "doc_id")  # tie-safe
        return (
            d.select("doc_id", key.alias("key"), shard.alias("shard"))
            .withColumn("position", F.row_number().over(w))
            .drop("key")
        )

    a1, a2, b1 = shuffled(42), shuffled(42), shuffled(7)
    # a1/b1 feed ~7 self-check actions plus the returned groupBy — the
    # md5 + per-shard window pipeline re-ran for each action uncached
    # (review-pass r16). a2 stays UNCACHED on purpose: the determinism
    # probe compares a FRESH execution of the same plan against the
    # pinned a1. localCheckpoint (the x23 idiom): blocks GC with the
    # reference, and the checks below consume it immediately.
    a1 = a1.localCheckpoint()
    b1 = b1.localCheckpoint()
    # determinism: same seed → identical (doc_id, shard, position)
    if a1.exceptAll(a2).count() != 0:
        raise AssertionError("seeded shuffle not reproducible")
    # permutation: nothing lost, nothing duplicated, addresses unique
    if (
        a1.count() != n
        or a1.select("doc_id").distinct().count() != n
        or a1.select("shard", "position").distinct().count() != n
    ):
        raise AssertionError("shuffle is not a permutation")
    # seed sensitivity: a different seed must move most documents
    n_same = a1.join(b1, ["doc_id", "shard", "position"]).count()
    if n_same > 0.05 * n:
        raise AssertionError(
            f"seeds 42 and 7 agree on {n_same}/{n} addresses — not shuffling"
        )
    # hash-mod shard balance: binomial, allow a generous band
    sizes = [
        r.c
        for r in a1.groupBy("shard").agg(F.count(F.lit(1)).alias("c")).collect()
    ]
    lo, hi = 0.5 * n / n_shards, 1.5 * n / n_shards
    if len(sizes) != n_shards or min(sizes) < lo or max(sizes) > hi:
        raise AssertionError(f"shards unbalanced: {sorted(sizes)}")
    # the full address map, digested per shard — the oracle re-derives
    # every (doc_id -> shard, position) and must hash identically
    return (
        a1.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    "position",
                                    F.concat_ws(
                                        ":",
                                        F.col("doc_id").cast("string"),
                                        F.col("position").cast("string"),
                                    ).alias("s"),
                                )
                            )
                        ),
                        lambda x: x["s"],
                    ),
                    ",",
                )
            ).alias("addr_digest"),
        )
        .orderBy("shard")
    )


# --- X27: paragraph-level exact dedup with document reassembly --------------
# RefinedWeb/C4-style sub-document dedup: boilerplate (headers, nav,
# license blocks) repeats ACROSS documents that are not duplicates as
# wholes, so document-level dedup (x1) misses it. Split each document
# into fixed token windows ("paragraphs" — the fixture text has no
# newlines, so the window is the paragraph analog), keep only the
# globally FIRST occurrence of each window, and reassemble documents
# from their surviving windows.
#
# 100 TB shape: the keep-decision shuffles ONLY (digest, doc_id, idx)
# — 16-byte hashes plus two longs, never the text (the same x1 economy
# at sub-document granularity); reassembly then shuffles the SURVIVING
# window text once, grouped by doc_id. At full scale the reassembly
# stage is optional — downstream tokenization can consume the
# chunk-level stream directly and skip that second shuffle entirely.
# Window choice is w5-style documented policy: first-occurrence rank
# partitions by digest (cardinality ~= distinct windows, uniformly
# hash-distributed), so no single-task funnel anywhere.

_X27_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
chunks AS (
  SELECT doc_id, i,
         array_to_string(list_slice(t, i*10 + 1, i*10 + 10), ' ') AS chunk
  FROM toks,
       LATERAL (SELECT unnest(generate_series(
                  0, CAST(floor((len(t) - 1) / 10.0) AS INT))) AS i)
),
ranked AS (
  SELECT doc_id, i, chunk,
         row_number() OVER (PARTITION BY md5(chunk)
                            ORDER BY doc_id, i) AS rn
  FROM chunks
),
rebuilt AS (
  SELECT doc_id,
         count(*) AS n_chunks,
         count(*) FILTER (WHERE rn = 1) AS n_kept,
         md5(coalesce(string_agg(chunk, ' ' ORDER BY i)
                        FILTER (WHERE rn = 1), '')) AS rebuilt_digest
  FROM ranked GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(n_kept AS BIGINT)   AS n_kept,
       rebuilt_digest
FROM rebuilt
ORDER BY doc_id
"""


@register("x27_paragraph_dedup", oracle=_X27_ORACLE, tags=("X27", "X1", "X4"))
def x27_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.size("t") - 1) / 10.0).cast("int"),
            )
        ).alias("i"),
        "t",
    ).select(
        "doc_id",
        "i",
        F.array_join(
            F.slice(F.col("t"), F.col("i") * 10 + 1, 10), " "
        ).alias("chunk"),
    )
    # global first-occurrence rank per window content: partitioned by
    # the 16-byte digest (uniform, high-cardinality — no skew funnel)
    rn = F.row_number().over(
        W.partitionBy(F.md5("chunk")).orderBy("doc_id", "i")
    )
    ranked = chunks.withColumn("rn", rn)
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
            F.md5(
                F.coalesce(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.when(
                                        F.col("rn") == 1,
                                        F.struct("i", "chunk"),
                                    )
                                )
                            ),
                            lambda s: s["chunk"],
                        ),
                        " ",
                    ),
                    F.lit(""),
                )
            ).alias("rebuilt_digest"),
        )
        .orderBy("doc_id")
    )


# --- X31: composed curation pipeline v2 (dedup → mixture → packing) ---------
# x11 composes quality-gate → exact-dedup → chunking; this is the r7
# counterpart over the round's NEW operators, as ONE declarative plan:
#   1. paragraph-level dedup (x27 kernel) — drop every non-first
#      10-word window globally, rebuild documents, recount tokens;
#   2. temperature mixture (x28 kernel, alpha=0.5 on lang) over the
#      DEDUPED corpus — rates derive from post-dedup counts;
#   3. sequence packing (x14 kernel): per-lang greedy 256-token bins
#      via cumulative-token arithmetic.
# Value-oracled end-to-end: DuckDB re-derives dedup, rates, sampling
# AND bin assignment exactly (all content-addressed / integer math).
# Scale: stage 1 shuffles digests; stage 2 is a broadcast-rate filter;
# stage 3 (r12) runs the x50 chunked two-pass prefix sum — every
# window partitions on (lang, chunk), never lang alone, so the
# dominant language of a real corpus spreads across n_chunks tasks
# (plan-guard-asserted in-query; the oracle's single ordered cumsum
# replays the identical arithmetic).

_X31_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
),
chunks AS (
  SELECT doc_id, lang, i,
         array_to_string(list_slice(t, i*10 + 1, i*10 + 10), ' ') AS chunk,
         len(list_slice(t, i*10 + 1, i*10 + 10)) AS n_tok
  FROM toks,
       LATERAL (SELECT unnest(generate_series(
                  0, CAST(floor((len(t) - 1) / 10.0) AS INT))) AS i)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY md5(chunk)
                               ORDER BY doc_id, i) AS rn
  FROM chunks
),
deduped AS (
  SELECT doc_id, lang, sum(n_tok) AS n_tokens
  FROM ranked WHERE rn = 1 GROUP BY doc_id, lang
),
counts AS (SELECT lang, count(*) AS c FROM deduped GROUP BY lang),
quant AS (
  SELECT lang, c,
         CAST(floor(sqrt(c) * 1000000 + 0.5) AS BIGINT) AS sq
  FROM counts
),
denom AS (SELECT CAST(sum(sq) AS BIGINT) AS zq,
                 CAST(sum(c) AS BIGINT) AS total FROM quant),
rates AS (
  SELECT lang, c,
         least(CAST(10000 AS BIGINT),
               CAST((5000 * CAST(total AS HUGEINT) * CAST(sq AS HUGEINT))
                    // (CAST(zq AS HUGEINT) * CAST(c AS HUGEINT))
                    AS BIGINT)) AS bp
  FROM quant CROSS JOIN denom
),
sampled AS (
  SELECT d.lang, d.doc_id, d.n_tokens
  FROM deduped d JOIN rates r USING (lang)
  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 10000 < r.bp
),
packed AS (
  SELECT lang, doc_id, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
                     - n_tokens) / 256.0) AS BIGINT) AS bin
  FROM sampled
)
SELECT lang, bin,
       CAST(count(*) AS BIGINT)      AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM packed GROUP BY lang, bin ORDER BY lang, bin
"""


@register("x31_curation_pipeline_v2", oracle=_X31_ORACLE, tags=("X31", "X27", "X28", "X14"))
def x31_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", F.split("text", " ").alias("t"))
    chunks = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.sequence(
                F.lit(0), F.floor((F.size("t") - 1) / 10.0).cast("int")
            )
        ).alias("i"),
        "t",
    ).select(
        "doc_id",
        "lang",
        "i",
        F.array_join(F.slice(F.col("t"), F.col("i") * 10 + 1, 10), " ").alias(
            "chunk"
        ),
        F.size(F.slice(F.col("t"), F.col("i") * 10 + 1, 10)).alias("n_tok"),
    )
    # keep-first respelled as ONE hash aggregate on the digest (r19,
    # guide §2.3/§2.4): the old row_number() OVER (PARTITION BY
    # md5(chunk) ORDER BY doc_id, i) shuffled every row — chunk TEXT
    # included — then sorted each partition, for what is a per-digest
    # argmin.  min(struct(doc_id, i, ...)) is the identical first-
    # occurrence rule ((doc_id, i) lexicographic), but the exchange now
    # carries (digest, struct) only — text never shuffles — and
    # map-side partial aggregation collapses duplicate chunks before
    # the wire.
    first = (
        chunks.select(
            F.md5("chunk").alias("__h"), "doc_id", "lang", "i", "n_tok"
        )
        .groupBy("__h")
        .agg(F.min(F.struct("doc_id", "i", "lang", "n_tok")).alias("__f"))
        .select("__f.doc_id", "__f.lang", "__f.n_tok")
    )
    deduped = first.groupBy("doc_id", "lang").agg(
        F.sum("n_tok").alias("n_tokens")
    )
    counts = deduped.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    # INTEGER-EXACT sampling rates (review-pass r17, reproduced): the
    # old z = sum(sqrt(c)) was a float sum in engine-dependent order —
    # a 1-ulp z difference could shift a lang's basis points by 1 and
    # flip every doc in the boundary hash bucket cross-engine (the
    # class every sibling sampler — x38/x39/x48/x51 — already avoids
    # with ppm/bp integer arithmetic). sqrt(c) quantizes to integer
    # once (single correctly-rounded sqrt/mul/add/floor — bit-identical
    # IEEE both engines), then rate·1e4 = (5000·total·sq) div (zq·c)
    # is pure integer floor division (decimal(38,0) here, HUGEINT in
    # DuckDB), capped at 10000 = the old least(1.0, rate).
    quant = counts.withColumn(
        "sq", F.floor(F.sqrt("c") * 1000000 + F.lit(0.5)).cast("long")
    )
    denom = quant.agg(F.sum("sq").alias("zq"), F.sum("c").alias("total"))
    rates = quant.crossJoin(F.broadcast(denom)).select(
        "lang",
        F.least(
            F.lit(10000).cast("long"),
            F.expr(
                "CAST((CAST(5000 AS DECIMAL(19,0))"
                " * CAST(total AS DECIMAL(19,0))"
                " * CAST(sq AS DECIMAL(19,0))) div"
                " (CAST(zq AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))"
                " AS BIGINT)"
            ),
        ).alias("bp"),
    )
    sampled = deduped.join(F.broadcast(rates), "lang").filter(
        hash_bucket(F.col("doc_id")) < F.col("bp")
    )
    # packing stage, r12 respell (VERDICT-r11 #2): the old spelling ran
    # ONE running-cumsum window per language over every surviving row —
    # at 100 TB the dominant language funnels through a single task,
    # the exact shape the x50 machinery exists to replace. Same bigint
    # arithmetic on the chunked two-pass prefix sum instead: checkpoint
    # the narrow survivor frame (3 columns; also severs the triple
    # re-derivation of the dedup+sampling pipeline that the boundary
    # and totals passes would otherwise trigger), chunk the doc_id axis
    # monotonically, take chunk-LOCAL exclusive cumsums over
    # (lang, chunk) windows, and add driver-prefixed per-(lang, chunk)
    # totals back as broadcast offsets — a bounded |langs| * n_chunks
    # row collect. exclusive_prefix = loc + off is identical to the old
    # inclusive-cumsum-minus-self, so the oracle is unchanged.
    from ..operators.skew import chunked_exclusive_prefix
    from ..plans.explain import assert_windows_partitioned_by

    sampled = sampled.select("lang", "doc_id", "n_tokens").localCheckpoint()
    packed = chunked_exclusive_prefix(
        sampled, "doc_id", "n_tokens", part_cols=("lang",), out_col="excl"
    ).withColumn("bin", F.floor(F.col("excl") / 256.0).cast("long"))
    out = (
        packed.groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("lang", "bin")
    )
    # the 100 TB contract, enforced on every execution: the packing
    # window must be chunk-partitioned (and exist at all)
    assert_windows_partitioned_by(out, "chunk", "x31")
    return out


# --- X32: contamination-safe split assignment (cluster-aware) ---------------
# The subtle eval leak: doc-level hash splits (x13) can strand two
# NEAR-DUPLICATES on opposite sides of a train/val boundary — the val
# example is then effectively memorized. The fix used by careful
# pipelines: split by the near-dup CLUSTER's canonical id, so every
# cluster lands wholly in one split. Composition of proven kernels:
# x12's transitive clusters (planted-copy fixture, recursive-CTE
# oracle) + x13's content-addressed hash split keyed on the cluster
# rep instead of the doc. Value-oracled END TO END, including the
# atomicity property itself (n_splits_per_cluster = 1 for every
# cluster, a column the oracle derives independently).
# Scale: clustering is the x12/x12b path (LSH candidates at corpus
# scale); the split is a map-side filter on the cluster label already
# carried by the dedup output — zero extra shuffle.

_X32_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
),
corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET},
         array_to_string(string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) - 3, 1)], ' ')
  FROM base
),
pool AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w FROM corpus
),
jac AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib,
         CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
         / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) AS j
  FROM pool a JOIN pool b ON a.doc_id < b.doc_id
),
edges0 AS (SELECT ia AS s, ib AS d FROM jac WHERE j >= 0.9),
edges AS (SELECT s, d FROM edges0 UNION SELECT d, s FROM edges0),
reach AS (
  SELECT doc_id AS n, doc_id AS m FROM corpus
  UNION
  SELECT e.s, r.m FROM edges e JOIN reach r ON e.d = r.n
),
comp AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
split AS (
  SELECT doc_id, cluster_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 10000 < 1000 THEN 'test'
              WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 10000 < 2000 THEN 'val'
              ELSE 'train' END AS split
  FROM comp
),
atomic AS (
  SELECT cluster_id, count(DISTINCT split) AS n_splits
  FROM split GROUP BY cluster_id
)
SELECT s.split,
       CAST(count(*) AS BIGINT)                 AS n_docs,
       CAST(count(DISTINCT s.cluster_id) AS BIGINT) AS n_clusters,
       CAST(max(a.n_splits) AS BIGINT)          AS max_splits_per_cluster
FROM split s JOIN atomic a USING (cluster_id)
GROUP BY s.split ORDER BY s.split
"""


@register("x32_cluster_safe_splits", oracle=_X32_ORACLE, tags=("X32", "X12", "X13"))
def x32_cluster_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components
    from ..operators.sampling import hash_bucket

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    words = F.split("text", " ")
    keep = F.greatest(F.size(words) - F.lit(3), F.lit(1))
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
            F.array_join(F.slice(words, F.lit(1), keep), " ").alias("text"),
        )
    )
    pool = corpus.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("w")
    )
    a = pool.select(F.col("doc_id").alias("id_a"), F.col("w").alias("wa"))
    b = pool.select(F.col("doc_id").alias("id_b"), F.col("w").alias("wb"))
    inter = F.size(F.array_intersect("wa", "wb"))
    jac = inter / (F.size("wa") + F.size("wb") - inter)
    edges = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(jac >= 0.9)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comp = connected_components(
        edges, "src", "dst", nodes=corpus.select("doc_id")
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
    bucket = hash_bucket(F.col("cluster_id"))
    split = comp.withColumn(
        "split",
        F.when(bucket < 1000, "test")
        .when(bucket < 2000, "val")
        .otherwise("train"),
    )
    atomic = split.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    # the leak-proof property, asserted AND exported for the oracle
    if atomic.filter(F.col("n_splits") > 1).count() != 0:
        raise AssertionError("a near-dup cluster straddles a split boundary")
    return (
        split.join(atomic, "cluster_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.max("n_splits").alias("max_splits_per_cluster"),
        )
        .orderBy("split")
    )


# --- X34: exact duplicated-span detection (sliding k-gram) ------------------
# The exact-substring complement of x27: x27 dedups NON-overlapping
# stride-10 chunks (misses spans straddling a chunk boundary or shifted
# by one token); this slides a k-token window at stride 1, so a span
# duplicated anywhere in the corpus at ANY alignment is caught — the
# Lee et al. "Deduplicating Training Data Makes Language Models Better"
# exact-substring semantics, respelled from suffix arrays (inherently
# sequential) to the Spark-native form: k-gram digests → duplicate-key
# aggregate → flagged windows merged into maximal spans per doc.
# Scale: one gram per token, so the exploded frame is corpus-LINEAR;
# everything shuffled after the explode is 16-byte digests and
# (doc_id, pos) ints, never text. The duplicate-digest aggregate is
# map-side-combinable; the island merge windows on doc_id (natural,
# unskewed key). At 100 TB swap md5 for xxhash64 (8-byte, halves
# shuffle width — md5 here only because the DuckDB oracle must replay
# the digest) and persist `grams` DISK_ONLY so explode runs once, not
# twice (here re-derived to keep the harness cache-free).

_X34_K = 8


def _span_cte_chain(k: int) -> str:
    """CTE steps from a ``toks(doc_id, t)`` relation to
    ``per_doc(doc_id, n_spans, dup_tokens)`` — the SQL twin of
    ``operators.dedup.dup_span_stats``, shared by the x34 and x36
    oracles so both verify the identical island-merge semantics."""
    return f"""grams AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(list_slice(t, i + 1, i + {k}), ' ')) AS g
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0, len(t) - {k})) AS i)
  WHERE len(t) >= {k}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
flagged AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {k}
              THEN 0 ELSE 1 END AS brk
  FROM flagged
),
isl2 AS (SELECT doc_id, pos,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         FROM isl),
spans AS (SELECT doc_id, island,
                 max(pos) - min(pos) + {k} AS span_tokens
          FROM isl2 GROUP BY 1, 2),
per_doc AS (SELECT doc_id, count(*) AS n_spans,
                   sum(span_tokens) AS dup_tokens
            FROM spans GROUP BY 1)"""


_X34_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
{_span_cte_chain(_X34_K)}
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT)    AS n_tokens,
       CAST(coalesce(p.n_spans, 0) AS BIGINT)            AS n_spans,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT)         AS dup_tokens,
       round(coalesce(p.dup_tokens, 0) * 1.0
             / len(string_split(d.text, ' ')), 4) + 0.0  AS dup_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


@register("x34_dup_span_detect", oracle=_X34_ORACLE, tags=("X34", "X1", "X4"))
def x34_dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span report: windows of ``_X34_K`` tokens
    whose digest occurs >1 time corpus-wide (any doc, any offset,
    self-repeats included), merged into maximal spans — two flagged
    windows join one span iff their starts differ by <= k (overlap or
    touch). dup_frac is the fraction of the doc's tokens inside
    duplicated spans — the drop/trim signal. Core logic lives in
    ``operators.dedup.dup_span_stats`` (reused by x36)."""
    from ..operators.dedup import dup_span_stats

    d = load_table(spark, sf_dir, "documents")
    stats = dup_span_stats(d, "doc_id", "text", k=_X34_K)
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "dup_tokens",
        F.round(F.col("dup_tokens") / F.col("n_tokens"), 4).alias(
            "dup_frac"
        ),
    ).orderBy("doc_id")


# --- X36: composed governance pipeline (quota → span dedup → drop) ----------
# Production curation is a PIPELINE, not isolated operators: cap every
# host at its top-Q docs (x33), THEN detect duplicated spans WITHIN the
# surviving corpus (x34 — duplicate evidence must come from survivors,
# or a doc can be dropped for matching text the quota already removed),
# then drop any survivor with >= 50% duplicated tokens. The drop rule
# is integer arithmetic (dup_tokens·2 >= n_tokens), so the composed
# oracle is float-free end to end. One declarative plan: the window,
# the k-gram digest aggregate and the threshold filter all fuse under
# Catalyst; per-host accounting is the auditable governance artifact.

_X36_QUOTA = 15
_X36_K = 8

#: the ranked/kept quota CTEs mirror _X33_ORACLE (text_queries.py) —
#: kept as a literal here because importing across query modules at
#: registration time would reorder the driver's execution order; the
#: span chain itself is the shared _span_cte_chain
_X36_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, text, n_chars, source || '.example.org' AS host,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
),
kept AS (SELECT doc_id, text, n_chars, host FROM ranked WHERE rk <= {_X36_QUOTA}),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM kept),
{_span_cte_chain(_X36_K)},
final AS (
  SELECT k.host, k.doc_id, k.n_chars,
         coalesce(p.dup_tokens, 0) AS dup_tokens,
         len(string_split(k.text, ' ')) AS n_tokens
  FROM kept k LEFT JOIN per_doc p USING (doc_id)
)
SELECT r.host,
       CAST(count(DISTINCT r.doc_id) AS BIGINT) AS n_candidates,
       CAST(count(DISTINCT CASE WHEN r.rk <= {_X36_QUOTA} THEN r.doc_id END)
            AS BIGINT) AS n_quota_kept,
       CAST(count(DISTINCT CASE WHEN f.dup_tokens * 2 >= f.n_tokens
                                THEN f.doc_id END) AS BIGINT)
         AS n_dupspan_dropped,
       CAST(count(DISTINCT CASE WHEN f.dup_tokens * 2 < f.n_tokens
                                THEN f.doc_id END) AS BIGINT) AS n_final,
       CAST(sum(CASE WHEN f.dup_tokens * 2 < f.n_tokens
                     THEN f.n_chars ELSE 0 END) AS BIGINT) AS final_chars
FROM ranked r LEFT JOIN final f ON f.doc_id = r.doc_id
GROUP BY r.host ORDER BY r.host
"""


@register(
    "x36_governance_pipeline",
    oracle=_X36_ORACLE,
    tags=("X36", "X33", "X34", "X1"),
)
def x36_governance_pipeline(
    spark: SparkSession,
    sf_dir: str,
    *,
    salted: bool = False,
    n_salts: int = 32,
) -> DataFrame:
    """``salted=True`` (r14, VERDICT r13 #4) routes the quota cut
    through operators/skew.py::salted_top_k — the mega-host respell;
    the driver default stays the single group-limited window (the
    honest plan at fixture scale).  Parity pinned in
    tests/test_operators.py::test_x33_x36_salted_path_parity."""
    from pyspark.sql import Window

    from ..operators.dedup import dup_span_stats

    d = load_table(spark, sf_dir, "documents")
    hosts = d.select(
        "doc_id",
        "text",
        "n_chars",
        "source",
        F.concat("source", F.lit(".example.org")).alias("host"),
    )
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    if salted:
        from ..operators.skew import salted_top_k

        kept = salted_top_k(hosts, ["source"], order, _X36_QUOTA, n_salts)
    else:
        ranked = hosts.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(*order)
            ),
        )
        kept = ranked.filter(F.col("rk") <= _X36_QUOTA).drop("rk")
    stats = dup_span_stats(
        kept.select("doc_id", "text"), "doc_id", "text", k=_X36_K
    )
    final = kept.select("host", "doc_id", "n_chars").join(stats, "doc_id")
    dropped = F.col("dup_tokens") * 2 >= F.col("n_tokens")
    per_host_final = final.groupBy("host").agg(
        F.sum(dropped.cast("long")).alias("n_dupspan_dropped"),
        F.sum((~dropped).cast("long")).alias("n_final"),
        F.sum(F.when(~dropped, F.col("n_chars")).otherwise(0)).alias(
            "final_chars"
        ),
    )
    # candidate accounting WITHOUT the window (r12 audit): row_number
    # is dense 1..n per host, so count(rk <= Q) == least(n, Q) — a
    # pure combiner-friendly aggregate. The old sum-over-rk spelling
    # forced a second, NON-group-limited instance of the quota window
    # (every row per host through one task); now the only windowed
    # branch is the rk <= Q rank-filter, which Spark bounds with
    # WindowGroupLimit below the shuffle (<= Q rows per host per map
    # task — plan-pinned in tests/test_plans.py). Host carries the
    # same scale note as x33: high-cardinality in a real crawl, and
    # salted_top_k is the mega-host respell.
    per_host_cand = hosts.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.least(F.count(F.lit(1)), F.lit(_X36_QUOTA))
        .cast("long")
        .alias("n_quota_kept"),
    )
    return (
        per_host_cand.join(per_host_final, "host")
        .select(
            "host",
            "n_candidates",
            "n_quota_kept",
            "n_dupspan_dropped",
            "n_final",
            "final_chars",
        )
        .orderBy("host")
    )


# --- X39: soft dedup — duplicate down-weighting -----------------------------
# SlimPajama/Doremi-adjacent alternative to hard dedup: instead of
# DROPPING duplicate copies, keep every copy but give each a sampling
# weight 1/cluster_size, so the CONTENT's total weight is 1 regardless
# of how many crawls re-captured it — preserves corpus shape (domain
# mix, ordering locality) while killing the memorization multiplier.
# Weights are basis points (floor(1e4 / c), integer-exact both
# engines); the emission step turns the fractional weight into a
# deterministic keep/skip per copy via the content-addressed
# hash_bucket scheme (rescale/append-stable, DuckDB-replayable) — the
# same machinery as the x28/x30 mixture samplers.
# Scale shape: cluster key is md5(text) — 16-byte digests shuffle,
# never text (x1's property); everything after the digest groupBy is
# |clusters|-sized; the emission decision is a map-side filter.
# Planted corpus: every doc_id % 10 == 0 gains TWO extra exact copies,
# so those clusters have c=3 (wbp=3333 — exercises the fractional
# path); everything else c=1.

_X39_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text, lang, n_chars FROM documents
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET}, text, lang, n_chars
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + {2 * _COPY_OFFSET}, text, lang, n_chars
  FROM documents WHERE doc_id % 10 = 0
),
cl AS (
  SELECT md5(text) AS digest, count(*) AS c
  FROM corpus GROUP BY md5(text)
),
weighted AS (
  SELECT doc_id, lang, n_chars, c,
         10000 // c AS wbp,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 10000 < 10000 // c
              THEN 1 ELSE 0 END AS emitted
  FROM corpus JOIN cl ON md5(corpus.text) = cl.digest
)
SELECT lang,
       CAST(count(*) AS BIGINT)                    AS n_docs,
       CAST(count(DISTINCT CASE WHEN c > 1 THEN doc_id % {_COPY_OFFSET} END)
            AS BIGINT)                             AS n_dup_contents,
       CAST(sum(wbp) AS BIGINT)                    AS sum_wbp,
       CAST(sum(n_chars * wbp // 10000) AS BIGINT) AS eff_chars,
       CAST(sum(emitted) AS BIGINT)                AS n_emitted,
       CAST(sum(CASE WHEN emitted = 1 THEN n_chars ELSE 0 END) AS BIGINT)
                                                   AS emitted_chars
FROM weighted
GROUP BY lang ORDER BY lang
"""


@register("x39_soft_dedup_weights", oracle=_X39_ORACLE, tags=("X39", "X1"))
def x39_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    copies = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.unionByName(
        copies.withColumn("doc_id", F.col("doc_id") + _COPY_OFFSET)
    ).unionByName(
        copies.withColumn("doc_id", F.col("doc_id") + 2 * _COPY_OFFSET)
    )
    corpus = corpus.withColumn("digest", F.md5("text")).drop("text")
    cl = corpus.groupBy("digest").agg(F.count(F.lit(1)).alias("c"))
    weighted = (
        corpus.join(cl, "digest")
        .withColumn("wbp", F.expr("10000L div c"))
        .withColumn(
            "emitted",
            (hash_bucket(F.col("doc_id")) < F.col("wbp")).cast("long"),
        )
    )
    return (
        weighted.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(
                F.when(F.col("c") > 1, F.col("doc_id") % _COPY_OFFSET)
            ).alias("n_dup_contents"),
            F.sum("wbp").alias("sum_wbp"),
            F.sum(F.expr("n_chars * wbp div 10000L")).alias("eff_chars"),
            F.sum("emitted").alias("n_emitted"),
            F.sum(
                F.when(F.col("emitted") == 1, F.col("n_chars")).otherwise(0)
            ).alias("emitted_chars"),
        )
        .orderBy("lang")
    )


# --- X2e: the bare MinHash-LSH candidate set, value-oracled -----------------
# The banding MECHANISM alone (shingle -> per-seed min-hash -> banded
# signature -> bucket join -> candidate pairs), without x2's
# verification stage on top, so the candidate set itself — before any
# jaccard gate can mask a banding bug — is hash-checked values.
# (Historically this was x2's md5-family twin; since r13 x2 rides the
# same family and oracles its VERIFIED pairs, while this entry keeps
# the raw candidates pinned.) 16 seeds x 8 bands (2 rows/band): the
# planted near-dups (~0.9 Jaccard) collide w.p. ~1-(1-0.9^2)^8 ~ 1.

_X2E_ORACLE = f"""
WITH {_MD5_LSH_CTES}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(CASE WHEN b.doc_id - a.doc_id = {_COPY_OFFSET}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_planted
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_val = b.band_val
 AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
"""


@register("x2e_lsh_value_oracle", oracle=_X2E_ORACLE, tags=("X2", "X2E"))
def x2e_lsh_value_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(_planted_near_dups(d))
    # is_planted is a pure function of the pair, so deriving it AFTER
    # the shared candidate helper's distinct is equivalent to the old
    # inline project-then-distinct spelling (review-pass r13 dedup)
    return (
        _md5_lsh_candidates(_md5_band_frame(corpus))
        .select(
            "id_a",
            "id_b",
            (F.col("id_b") - F.col("id_a") == _COPY_OFFSET)
            .cast("long")
            .alias("is_planted"),
        )
        .orderBy("id_a", "id_b")
    )


# --- X12c: end-to-end LSH dedup pipeline, value-oracled ----------------------
# Historically the md5-family composition of x2e's banding and x12's
# clustering oracles (r10 verdict #4), back when x12b rode xxhash64
# with recall self-asserts. Since r13 x12b itself is md5-family and
# value-oracled; the two now differ only in band GEOMETRY — x12b runs
# the production 16 seeds x 4-row bands (higher per-band precision),
# this entry 16 x 2 (higher per-pair recall) — so together they pin
# the banding-curve behavior of one pipeline at two operating points.
# The jaccard gate is spelled integer-exact (20*|A∩B| >= 17*|A∪B|,
# i.e. >= 0.85) so no float predicate can flip across engines. Scale
# shape: shuffles carry band digests and word arrays of CANDIDATES
# only — never all pairs; the clustering is min-label propagation
# with pointer jumping.

_X12C_ORACLE = f"""
WITH RECURSIVE {_MD5_LSH_CTES},{_MD5_PIPELINE_TAIL}"""


@register(
    "x12c_lsh_pipeline_values", oracle=_X12C_ORACLE, tags=("X2", "X6", "X1")
)
def x12c_lsh_pipeline_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidates -> integer-exact jaccard verify ->
    connected components -> per-cluster summary, every stage
    DuckDB-replayed (see module comment above _X12C_ORACLE).
    NOTE: calling this RUNS the clustering fixpoint (x12 caveat); the
    returned frame is the materialized labelling's cheap projection."""
    from ..operators.components import connected_components

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(_planted_near_dups(d))
    cand = _md5_lsh_candidates(_md5_band_frame(corpus))
    edges = (
        _md5_verified_pairs(corpus, cand)
        .filter(20 * F.col("n_inter") >= 17 * F.col("n_union"))
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comp = connected_components(
        edges, "src", "dst", nodes=corpus.select("doc_id")
    )
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("node").alias("canonical_doc"),
        )
        .filter(F.col("cluster_size") > 1)
        .select(
            F.col("component").alias("cluster_id"),
            "cluster_size",
            "canonical_doc",
        )
        .orderBy("cluster_id")
    )


# --- X51: cluster-balanced diversity sampling --------------------------------
# The mixture tool the embedding-space pipelines (SemDeDup/DataComp
# lineage) pair with semantic dedup: k-means the corpus in embedding
# space, then give every cluster an EQUAL sample budget — rare
# semantic regions survive at full strength while the dominant
# cluster is cut to its quota, the embedding-space analog of x40's
# per-language UniMax. Deterministic end-to-end on x20's integer
# k-means (operators/semantic.py — quantized unit vectors, exact
# integer comparator) + md5 content-addressed emission
# (operators/sampling.py::hash_bucket), so DuckDB replays cluster
# assignment, per-cluster rates, and EVERY emission decision; id_sum
# pins which ids were emitted, not just how many. Scale shape: the
# k-means collects only k·dim aggregated longs per round; rates are a
# k-row broadcast; emission is one map-side hash compare — the corpus
# is never shuffled after assignment.

_X51_K = 8
_X51_ITERS = 2
#: corpus-wide sample budget = 2/5 of rows, split evenly over live
#: clusters (bigint arithmetic both engines)
_X51_BNUM, _X51_BDEN = 2, 5


def _x51_oracle() -> str:
    base = """base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
)"""
    parts, fin = _int_kmeans_cte_parts(base, _X51_K, _X51_ITERS, _X20_SCALE)
    parts.append(f"""
per AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs
  FROM {fin} GROUP BY cluster
),
tot AS (
  SELECT CAST(sum(n_vecs) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS kc
  FROM per
),
rates AS (
  SELECT cluster, n_vecs,
         least(10000,
               (10000 * ((SELECT (n * {_X51_BNUM} // {_X51_BDEN}) // kc
                          FROM tot))) // n_vecs) AS rate_bp
  FROM per
),
s AS (
  SELECT a.cluster, r.n_vecs, r.rate_bp, a.vec_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 10000
                   < r.rate_bp
              THEN 1 ELSE 0 END AS emit
  FROM {fin} a JOIN rates r USING (cluster)
)""")
    parts.append("""
SELECT CAST(cluster AS BIGINT) AS cluster,
       max(n_vecs) AS n_vecs,
       CAST(max(rate_bp) AS BIGINT) AS rate_bp,
       CAST(sum(emit) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN emit = 1 THEN vec_id ELSE 0 END) AS BIGINT)
         AS id_sum
FROM s GROUP BY cluster ORDER BY cluster""")
    return "WITH " + ",".join(parts[:-1]) + parts[-1]


@register(
    "x51_cluster_balanced_sample",
    oracle=_x51_oracle(),
    tags=("X6", "X13", "X3", "X20"),
)
def x51_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal per-cluster sample budgets over integer k-means cells —
    see the module comment above _x51_oracle. Returns one row per
    live cluster: size, emission rate (basis points), sampled count,
    and the emitted ids' sum (content proof)."""
    from ..operators.sampling import hash_bucket
    from ..operators.semantic import (
        int_kmeans_assign,
        quantized_unit_vectors,
    )

    e = load_table(spark, sf_dir, "embeddings")
    quant = quantized_unit_vectors(e, "vec_id", "embedding")
    # no cache here (r20): int_kmeans_assign now returns an eagerly
    # localCheckpoint-materialized frame, so both consumers (the
    # per-cluster counts and the emission join) read checkpoint blocks
    # directly — the former .cache() pinned a second in-memory copy of
    # rows that were already materialized, and the k-means pipeline can
    # no longer run twice regardless
    assigned = int_kmeans_assign(quant, k=_X51_K, iters=_X51_ITERS).select(
        "vec_id", "cluster"
    )
    per = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    tot = per.agg(
        F.sum("n_vecs").alias("n"), F.count(F.lit(1)).alias("kc")
    ).first()  # bounded: one row
    quota = (int(tot.n) * _X51_BNUM // _X51_BDEN) // int(tot.kc)
    rates = per.withColumn(
        "rate_bp",
        F.least(F.lit(10000), F.expr(f"(10000 * {quota}L) div n_vecs")),
    )
    out = (
        assigned.join(F.broadcast(rates), "cluster")
        .withColumn(
            "emit",
            (hash_bucket(F.col("vec_id")) < F.col("rate_bp")).cast(
                "long"
            ),
        )
        .groupBy("cluster")
        .agg(
            F.max("n_vecs").alias("n_vecs"),
            F.max("rate_bp").cast("long").alias("rate_bp"),
            F.sum("emit").alias("n_sampled"),
            F.sum(
                F.when(F.col("emit") == 1, F.col("vec_id")).otherwise(0)
            ).alias("id_sum"),
        )
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            "n_vecs",
            "rate_bp",
            "n_sampled",
            "id_sum",
        )
        .orderBy("cluster")
    )
    return out.localCheckpoint()  # bounded per-cluster rows, eager
