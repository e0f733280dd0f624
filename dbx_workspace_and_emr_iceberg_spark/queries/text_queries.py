"""X4: text-analysis queries over `documents` (SURVEY.md §2.12) —
token counting, quality scoring, language-ID heuristic, fingerprinting.

All JVM-side string/array expressions (split/regexp/higher-order) —
single-scan, shuffle-free plans that keep their shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

def _token_frame(d: DataFrame, meta_cols: list[str]) -> DataFrame:
    """(meta_cols..., __sp) — the materialized token-array frame.
    Split once here so every consumer (bigram explode, vocab explode)
    shares ONE text scan + regex split when the caller caches this
    frame (r20, guide §5: the x22/x43 bigram-LM queries tokenized the
    corpus 3x — bc derivation, probe derivation, vocab pass)."""
    return d.select(*meta_cols, F.split("text", " ").alias("__sp"))


def _bigrams_from_tokens(toks: DataFrame, meta_cols: list[str]) -> DataFrame:
    """(meta_cols..., w1, w2) off a :func:`_token_frame` output — one
    row per adjacent token pair, derived MAP-SIDE from the token array
    ((sp[i], sp[i+1]), exactly the oracles' ``LATERAL
    generate_series`` spelling). The old posexplode + ``lead() OVER
    (PARTITION BY doc_id ORDER BY pos)`` spelling paid a full
    token-frame Exchange + Sort + Window — and paid it once PER
    CONSUMER of the bigram frame (bc, uc and the probe join each
    re-derive it; Catalyst cannot share the subtree across differing
    aggregations) — for what is a per-row array operation (r19
    optimization, guide §2.4: remove shuffles outright). Identical
    bigram multiset: lead over pos == adjacency in the array. Docs
    with < 2 tokens contribute zero pairs (the lead spelling's
    w2-IS-NULL filter), guarded against sequence(1, 0)'s DESCENDING
    [1, 0] surprise (the x46 clamp precedent)."""
    arr = F.col("__sp")
    pairs = F.transform(
        F.when(F.size(arr) >= 2, F.sequence(F.lit(1), F.size(arr) - 1))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.struct(
            F.element_at(arr, i.cast("int")).alias("w1"),
            F.element_at(arr, (i + 1).cast("int")).alias("w2"),
        ),
    )
    return toks.select(*meta_cols, F.explode(pairs).alias("__p")).select(
        *meta_cols, "__p.w1", "__p.w2"
    )


def _adjacent_bigrams(d: DataFrame, meta_cols: list[str]) -> DataFrame:
    """(meta_cols..., w1, w2) — one row per adjacent token pair of
    ``text``; see :func:`_bigrams_from_tokens`."""
    return _bigrams_from_tokens(_token_frame(d, meta_cols), meta_cols)


def _bigram_nll(bc: DataFrame, uc: DataFrame, vocab: DataFrame) -> DataFrame:
    """(w1, w2, nll) — the add-one-smoothed negative log-likelihood of
    each DISTINCT bigram (r20, guide §2.3: the x22/x43 probe used to
    evaluate ``-ln((c+1)/(c1+vsize))`` once per bigram INSTANCE, i.e.
    corpus-linearly; the expression is a pure function of the bigram's
    count row, so it is computed once per distinct bigram here and the
    instance stream joins the finished double.  Value-identical: the
    same IEEE expression over the same (c, c1, vsize) inputs yields the
    same double whether evaluated before or after the instance join)."""
    return (
        bc.join(uc, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            (
                -F.log(
                    (F.col("c") + F.lit(1.0))
                    / (F.col("c1") + F.col("vsize"))
                )
            ).alias("nll"),
        )
    )


def _padded_ngrams(words, n: int):
    """Word n-grams over ``words`` with ''-padding past the array end —
    count = max(len(words) - n + 1, 1), so a doc shorter than n yields
    ONE padded gram (mirrors the DuckDB oracles' words[i+k] -> NULL ->
    coalesce('')). try_element_at: ANSI element_at raises on
    out-of-bounds. Shared by x4d / x4g / x16, whose oracles all build
    the identical padded grams in SQL."""
    count = F.greatest(F.size(words) - (n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(
            " ",
            F.try_element_at(words, i.cast("int")),
            *[
                F.coalesce(
                    F.try_element_at(words, (i + j).cast("int")), F.lit("")
                )
                for j in range(1, n)
            ],
        ),
    )


# --- X4: token counting -----------------------------------------------------
# "BPE-ish" tokens: runs of letters, runs of digits, or single non-space
# symbols — the standard pre-tokenizer shape, countable by regexp.

_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

_X4_ORACLE = f"""
SELECT
  doc_id,
  cast(len(string_split(text, ' ')) AS INTEGER)            AS n_words,
  cast(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS INTEGER) AS n_tokens,
  cast(length(text) AS INTEGER)                            AS len_chars,
  (length(text) = n_chars)                                 AS n_chars_consistent,
  round(cast(length(replace(text, ' ', '')) AS DOUBLE)
        / len(string_split(text, ' ')), 4)                 AS avg_word_len
FROM documents
ORDER BY doc_id
"""


@register("x4_token_stats", oracle=_X4_ORACLE, tags=("X4",))
def x4_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit(_TOKEN_RE), 0)).alias("n_tokens"),
        F.length("text").alias("len_chars"),
        (F.length("text") == F.col("n_chars")).alias("n_chars_consistent"),
        F.round(
            F.length(F.replace("text", F.lit(" "), F.lit(""))).cast("double")
            / F.size(words),
            4,
        ).alias("avg_word_len"),
    ).orderBy("doc_id")


# --- X4b: quality scoring ---------------------------------------------------

_STOPWORDS = "('the','a','and','of','to','in','is','it','on','for')"

_X4B_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
)
SELECT
  doc_id,
  cast(len(words) AS INTEGER)                                          AS n_words,
  round(cast(len(list_filter(words, w -> list_contains(
      ['the','a','and','of','to','in','is','it','on','for'], w))) AS DOUBLE)
      / len(words), 4)                                                 AS stopword_ratio,
  round(cast(len(list_distinct(words)) AS DOUBLE) / len(words), 4)     AS uniq_ratio,
  round(cast(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
      / length(text), 4)                                               AS digit_ratio,
  (len(words) >= 20 AND len(words) <= 1000
   AND cast(len(list_distinct(words)) AS DOUBLE) / len(words) > 0.3)   AS passes_quality
FROM t
ORDER BY doc_id
"""


@register("x4b_quality_scores", oracle=_X4B_ORACLE, tags=("X4",))
def x4b_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in
                     ["the", "a", "and", "of", "to", "in", "is", "it", "on", "for"]])
    nw = F.size(words)
    uniq = F.size(F.array_distinct(words)).cast("double") / nw
    return d.select(
        "doc_id",
        nw.alias("n_words"),
        F.round(
            F.size(F.filter(words, lambda w: F.array_contains(stop, w))).cast("double")
            / nw,
            4,
        ).alias("stopword_ratio"),
        F.round(uniq, 4).alias("uniq_ratio"),
        F.round(
            F.size(F.regexp_extract_all("text", F.lit("[0-9]"), 0)).cast("double")
            / F.length("text"),
            4,
        ).alias("digit_ratio"),
        ((nw >= 20) & (nw <= 1000) & (uniq > 0.3)).alias("passes_quality"),
    ).orderBy("doc_id")


# --- X4c: language-ID heuristic --------------------------------------------
# Score = count of language-marker stopword hits; argmax wins, ties break
# alphabetically. (The fixture text is synthetic word soup; the operator
# contract is the deterministic scoring mechanics, mirrored in SQL.)

_MARKERS = {
    "de": ["der", "die", "und", "ist", "nicht"],
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "les", "des"],
}


def _lang_score_sql(lang: str) -> str:
    arr = "[" + ",".join(f"'{w}'" for w in _MARKERS[lang]) + "]"
    return f"len(list_filter(string_split(text, ' '), w -> list_contains({arr}, w)))"


_X4C_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_lang_score_sql('de')} AS s_de,
         {_lang_score_sql('en')} AS s_en,
         {_lang_score_sql('es')} AS s_es,
         {_lang_score_sql('fr')} AS s_fr
  FROM documents
)
SELECT doc_id, lang,
  CASE greatest(s_de, s_en, s_es, s_fr)
    WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es' ELSE 'fr'
  END AS predicted_lang,
  cast(greatest(s_de, s_en, s_es, s_fr) AS INTEGER) AS top_score
FROM scored
ORDER BY doc_id
"""


@register("x4c_langid", oracle=_X4C_ORACLE, tags=("X4",))
def x4c_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")

    def marker_score(ms: list[str]) -> F.Column:
        arr = F.array(*[F.lit(m) for m in ms])
        return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))

    scores = {lang: marker_score(ms) for lang, ms in _MARKERS.items()}
    top = F.greatest(*scores.values())
    pred = (
        F.when(top == scores["de"], "de")
        .when(top == scores["en"], "en")
        .when(top == scores["es"], "es")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        top.alias("top_score"),
    ).orderBy("doc_id")


# --- X4d: document fingerprint (min-hash of word 3-shingles) ---------------

_X4D_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> concat(string_split(text,' ')[i], ' ',
                       coalesce(string_split(text,' ')[i+1], ''), ' ',
                       coalesce(string_split(text,' ')[i+2], ''))) AS shingles
  FROM documents
)
SELECT
  doc_id,
  list_aggregate(list_transform(shingles, s -> md5(s)), 'min') AS fingerprint,
  cast(len(list_distinct(shingles)) AS INTEGER)                AS n_uniq_shingles
FROM sh
ORDER BY doc_id
"""


@register("x4d_fingerprint", oracle=_X4D_ORACLE, tags=("X4",))
def x4d_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "__words", F.split("text", " ")
    )
    # Materialize words then shingles as columns: each is computed once
    # per row instead of once per downstream lambda reference.
    words = F.col("__words")
    d = d.withColumn("__shingles", _padded_ngrams(words, 3))
    shingles = F.col("__shingles")
    return d.select(
        "doc_id",
        F.array_min(F.transform(shingles, F.md5)).alias("fingerprint"),
        F.size(F.array_distinct(shingles)).alias("n_uniq_shingles"),
    ).orderBy("doc_id")


# --- X4e: corpus-level rollup (source × lang quality dashboard) ------------

_X4E_ORACLE = """
SELECT
  source,
  lang,
  count(*)                                                 AS n_docs,
  cast(sum(len(string_split(text, ' '))) AS BIGINT)        AS total_words,
  round(avg(n_chars), 2)                                   AS avg_chars,
  cast(min(doc_id) AS BIGINT)                              AS first_doc
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


@register("x4e_corpus_rollup", oracle=_X4E_ORACLE, tags=("X4",))
def x4e_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_words"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("source", "lang")
    )


# --- X8: batch sessionization (gap-based sessions over the event log) -------
# The batch twin of T4's session_window: at 100 TB this is ONE shuffle on
# user_id + a partition-local sort; the lag/cumsum pair never rescans.

_X8_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN date_diff('second', lag(ts) OVER w, ts) <= 1800
              THEN 0 ELSE 1 END
           AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM flagged
)
SELECT user_id,
       session_seq,
       CAST(count(*) AS BIGINT)                              AS n_events,
       round(sum(value), 2)                                  AS session_value,
       date_diff('second', min(ts), max(ts))                 AS duration_s
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


@register("x8_sessionization", oracle=_X8_ORACLE, tags=("X6", "W2", "W3"))
def x8_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event log (30-min inactivity gap):
    lag → new-session flag → running sum = session id → per-session
    rollup. Ties on ts break by event_id so the order is total and the
    oracle deterministic.

    Gap quantization is SECOND-FLOOR on both sides (review-pass r17,
    reproduced): Spark diffs epoch-truncated seconds, so the oracle
    must use date_diff('second', ...) — its old full-microsecond
    INTERVAL predicate sessionized sub-second gaps in (1800 s, 1801 s)
    differently (the sf0.01 fixture already carries one adjacent pair
    in that band; it hashed green only because its fractional parts
    happened to truncate to 1801)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ (tables.py normalization); no direct BIGINT
    # cast — hop through TIMESTAMP with the session pinned to UTC.
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap_s = ts_s - F.lag(ts_s).over(w)
    flagged = ev.withColumn(
        "new_sess", F.when(gap_s <= 1800, F.lit(0)).otherwise(F.lit(1))
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            (F.max(ts_s) - F.min(ts_s)).alias("duration_s"),
        )
        .orderBy("user_id", "session_seq")
    )


# --- X9: sliding-window document chunking (tokenize → overlapping chunks) ---
# The standard pre-training step: fixed-size token windows with overlap.
# Pure built-ins (split/sequence/slice/posexplode) — whole plan stays JVM-side,
# and chunks explode map-side so no shuffle carries document bodies.

_X9_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
idx AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(floor(greatest(len(toks) - 50, 0) / 40) AS BIGINT) + 1))
           AS i
  FROM t
)
SELECT doc_id,
       i                                                    AS chunk_id,
       CAST(len(toks[i*40 + 1 : i*40 + 50]) AS BIGINT)      AS chunk_tokens,
       md5(array_to_string(toks[i*40 + 1 : i*40 + 50], ' ')) AS chunk_digest
FROM idx
ORDER BY doc_id, chunk_id
"""


@register("x9_doc_chunking", oracle=_X9_ORACLE, tags=("X4", "F4"))
def x9_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 50-token chunks with stride 40 per document. The
    chunk set is derived with sequence+posexplode (no Python, no UDF);
    emitting an md5 digest instead of the chunk text keeps the compare
    payload small — and is itself the dedup key downstream."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    idx = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(F.greatest(F.size("toks") - 50, F.lit(0)) / 40).cast("int"),
            )
        ).alias("i"),
    )
    chunk = F.slice(F.col("toks"), F.col("i") * 40 + 1, 50)
    return idx.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_digest"),
    ).orderBy("doc_id", "chunk_id")


# --- X11: end-to-end training-data pipeline ---------------------------------
# The composition a 100 TB pretraining-data job actually runs: quality
# gate -> exact dedup -> overlapping chunking, as ONE declarative plan:
# scan (filter pushed, columns pruned) -> 16-byte-hash shuffle for the
# dedup window -> explode to chunks. No Python, one shuffle, and the
# chunk digest doubles as the downstream dedup key.

_X11_ORACLE = """
WITH scored AS (
  SELECT doc_id, text, string_split(text, ' ') AS words, md5(text) AS content_hash
  FROM documents
),
quality AS (
  SELECT * FROM scored
  WHERE len(words) BETWEEN 20 AND 1000
    AND cast(len(list_distinct(words)) AS DOUBLE) / len(words) > 0.3
),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
    FROM quality
  ) WHERE rn = 1
),
idx AS (
  SELECT doc_id, words,
         unnest(range(0, CAST(floor(greatest(len(words) - 50, 0) / 40) AS BIGINT) + 1))
           AS i
  FROM dedup
)
SELECT doc_id,
       i                                                     AS chunk_id,
       CAST(len(words[i*40 + 1 : i*40 + 50]) AS BIGINT)      AS chunk_tokens,
       md5(array_to_string(words[i*40 + 1 : i*40 + 50], ' ')) AS chunk_digest
FROM idx
ORDER BY doc_id, chunk_id
"""


@register("x11_training_pipeline", oracle=_X11_ORACLE, tags=("X1", "X4"))
def x11_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter -> exact-dedup -> chunk, composed as one lazy plan
    (the stages are the x4b / x1 / x9 operators; composing them stays a
    single declarative pipeline with exactly one shuffle — the dedup
    window on the md5 content hash)."""
    from ..operators.dedup import exact_dedup

    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    scored = d.select("doc_id", "text", words.alias("words"))
    nw = F.size("words")
    uniq = F.size(F.array_distinct("words")).cast("double") / nw
    quality = scored.filter((nw >= 20) & (nw <= 1000) & (uniq > 0.3))
    deduped = exact_dedup(quality, "text", "doc_id")
    idx = deduped.select(
        "doc_id",
        "words",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(F.greatest(F.size("words") - 50, F.lit(0)) / 40).cast(
                    "int"
                ),
            )
        ).alias("i"),
    )
    chunk = F.slice(F.col("words"), F.col("i") * 40 + 1, 50)
    return idx.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_digest"),
    ).orderBy("doc_id", "chunk_id")


# --- X14: sequence packing (token-budget batching) --------------------------

_X14_ORACLE = """
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS ntok,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         % 8 AS shard
  FROM documents
),
c AS (
  SELECT shard, doc_id, ntok,
         sum(ntok) OVER (PARTITION BY shard ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
),
p AS (
  SELECT shard, ntok,
         CAST(floor((cum - ntok) / 512.0) AS BIGINT) AS pack_id
  FROM c
)
SELECT shard, pack_id,
       count(*) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS pack_tokens
FROM p GROUP BY shard, pack_id ORDER BY shard, pack_id
"""


@register("x14_sequence_packing", oracle=_X14_ORACLE, tags=("X4", "X6"))
def x14_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget training sequences (512
    tokens here): shard by md5(doc_id) (content-addressed, so packing
    is reshuffle-stable — operators/sampling.py::hash_bucket), then a
    per-shard running token sum assigns each doc the pack its first
    token falls in. ONE shuffle (the shard window) + a partition-local
    sort; shards bound window-partition size, so a 100 TB corpus packs
    with shard-count parallelism and no straggler partition. The greedy
    sequential-fill semantics are exactly reproducible in SQL (DuckDB
    oracle) — packing decisions, like split decisions, must not depend
    on cluster layout."""
    from ..operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ntok"),
        hash_bucket(F.col("doc_id"), 8).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.select(
        "shard",
        "ntok",
        F.floor((F.sum("ntok").over(w) - F.col("ntok")) / F.lit(512.0)).alias(
            "pack_id"
        ),
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("pack_tokens"),
        )
        .orderBy("shard", "pack_id")
    )


# --- X15: per-language quality-quantile gate --------------------------------

_X15_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS ntok,
         percent_rank() OVER (PARTITION BY lang ORDER BY
                              len(string_split(text, ' '))) AS pr
  FROM documents
)
SELECT lang,
       count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(min(ntok) AS BIGINT) AS min_tokens
FROM scored WHERE pr >= 0.75
GROUP BY lang ORDER BY lang
"""


@register("x15_quality_quantile_gate", oracle=_X15_ORACLE, tags=("X4",))
def x15_quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each language's top quality quartile (score = token count
    here; any score column works) via per-lang percent_rank — a
    RELATIVE gate, so low-resource languages aren't wiped out by one
    absolute threshold tuned on the high-resource one.

    Respelled (r9 verdict #3) onto chunked_percent_ranks
    (operators/skew.py — the x37/x43/qd10 machinery): a bare
    ``Window.partitionBy(lang)`` funnels the dominant language's
    billions of rows through ONE task at 100 TB, exactly the skewed
    shape the repo's own rule forbids. The respell drops the previous
    doc_id tie-break in favor of SQL percent_rank's native ties-share-
    min-rank rule (the x37/x43 precedent): gate-wise that is the RIGHT
    semantics — two docs with identical scores must get the identical
    keep/drop decision, not be split by id accident — and it is what
    keeps every window chunk-partitioned (a tie-break-by-id needs a
    (lang, score)-cell window, itself a skew funnel when one score
    value dominates). Exact DuckDB oracle — contrast
    approx_percentile gates, whose sketches differ per engine."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("ntok")
    )
    # cached: the rank machinery consumes d three ways (its eager
    # approxQuantile pass, the explode/groupBy pipeline, the final
    # rank-frame join) — uncached, the corpus scan + tokenization ran
    # three times (r19, the qd10/x43 convention; measured ~2x on this
    # query's executor time at sf0.1).  Pin cleared by the harness
    # (bench.py / driver_sim clearCache).
    d = d.cache()
    from ..operators.skew import chunked_percent_ranks

    ranked = chunked_percent_ranks(
        d,
        part_col="lang",
        value_cols=["ntok"],
        id_cols=["doc_id", "ntok"],
        out_prefix="pr_",
    )
    # scale assert (x37 pattern): every window in the rank pipeline
    # must be chunk-partitioned — a window partitioned on lang alone
    # (or unpartitioned) would re-open the single-language funnel
    from ..plans.explain import assert_windows_partitioned_by

    assert_windows_partitioned_by(ranked, "chunk", "x15")
    return (
        ranked.filter(F.col("pr_ntok") >= 0.75)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
            F.min("ntok").cast("long").alias("min_tokens"),
        )
        .orderBy("lang")
    )


# --- X16: benchmark contamination check -------------------------------------

_X16_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> concat(string_split(text,' ')[i], ' ',
                       coalesce(string_split(text,' ')[i+1], ''), ' ',
                       coalesce(string_split(text,' ')[i+2], ''))))) AS shingle
  FROM documents
),
b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 97 = 0),
t AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % 97 <> 0)
SELECT bench_id, train_id, CAST(count(*) AS BIGINT) AS n_shared
FROM b JOIN t USING (shingle)
GROUP BY bench_id, train_id
HAVING count(*) >= 3
ORDER BY bench_id, train_id
"""


@register("x16_contamination_check", oracle=_X16_ORACLE, tags=("X4", "X2"))
def x16_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: flag (benchmark doc, training doc)
    pairs sharing >= 3 distinct word 3-shingles. The join key is the
    shingle (16-byte hash at scale — x4d's fingerprint machinery), so
    the shuffle carries shingles, never documents; the benchmark side
    is tiny and BROADCAST, so the 100 TB training corpus streams
    map-side through one scan. This is the eval-hygiene pass every
    pretraining pipeline runs before training."""
    # __words materialized (x4d idiom): a split embedded in the ngram
    # lambda re-evaluates per element access — measured ~8x on this
    # explode at sf0.1
    d = load_table(spark, sf_dir, "documents").withColumn(
        "__words", F.split("text", " ")
    )
    words = F.col("__words")
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(_padded_ngrams(words, 3))).alias("shingle"),
    )
    bench = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    train = sh.filter(F.col("doc_id") % 97 != 0).select(
        F.col("doc_id").alias("train_id"), "shingle"
    )
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("bench_id", "train_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
        .orderBy("bench_id", "train_id")
    )


# --- X17: PII redaction pass ------------------------------------------------

_SSN_RE = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[.][a-z]+"

_X17_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id,
         text ||
         CASE WHEN doc_id % 7 = 0
              THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.com now'
              ELSE '' END ||
         CASE WHEN doc_id % 11 = 0
              THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-42-1337'
              ELSE '' END AS text
  FROM documents
),
red AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
         CAST(len(regexp_extract_all(text, '{_SSN_RE}')) AS INTEGER)   AS n_ssns,
         md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                            '{_SSN_RE}', '[SSN]', 'g')) AS redacted_md5
  FROM corpus
)
SELECT doc_id, n_emails, n_ssns, redacted_md5
FROM red WHERE n_emails + n_ssns > 0
ORDER BY doc_id
"""


@register("x17_pii_redaction", oracle=_X17_ORACLE, tags=("X4",))
def x17_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and redact emails/SSNs with portable regexes
    (character classes only — identical semantics in Java and RE2-style
    engines; the md5 of the redacted text is hash-compared against the
    oracle, proving byte-identical replacement). Deterministic PII is
    injected into the fixture corpus on both sides so the pass has
    something to find. Map-side only — a scan + regexp projection with
    NO shuffle before the final filter/sort; at 100 TB this runs at
    scan speed and composes with pruning."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact u"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail.example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" ssn "),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-42-1337"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_SSN_RE), 0)).alias("n_ssns"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"),
                _SSN_RE,
                "[SSN]",
            )
        ).alias("redacted_md5"),
    )
    return red.filter(F.col("n_emails") + F.col("n_ssns") > 0).orderBy("doc_id")


# --- X4g: repetition metrics (Gopher-style quality rules) -------------------

_X4G_ORACLE = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(words) - 1, 1)),
                        i -> concat(words[i], ' ', coalesce(words[i+1], '')))
         AS g2
  FROM base
),
gm AS (
  SELECT doc_id,
         CAST(len(g2) AS INTEGER) AS n_2grams,
         round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
         AS dup_2gram_frac
  FROM grams
),
wc AS (
  SELECT doc_id, unnest(words) AS w FROM base
),
tw AS (
  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_word_frac
  FROM (SELECT doc_id, count(*) AS c FROM wc GROUP BY doc_id, w)
  GROUP BY doc_id
)
SELECT gm.doc_id, n_2grams, dup_2gram_frac, top_word_frac,
       (dup_2gram_frac < 0.6 AND top_word_frac < 0.2) AS passes_repetition
FROM gm JOIN tw ON gm.doc_id = tw.doc_id
ORDER BY gm.doc_id
"""


@register("x4g_repetition_metrics", oracle=_X4G_ORACLE, tags=("X4",))
def x4g_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: duplicate-2-gram
    fraction (array-local — no shuffle) and top-word dominance (one
    explode + two aggregations shuffling (doc_id, word) counts, never
    text). Repetitious machine-generated boilerplate fails these long
    before perplexity filters see it; the thresholds gate the doc the
    same way on any engine (exact DuckDB oracle)."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "__words", F.split("text", " ")
    )
    words = F.col("__words")
    # materialize the n-gram array ONCE (the x4d __shingles idiom,
    # review-pass r16): lambda-bearing transforms are not
    # subexpression-eliminated, so the three references below would
    # each rebuild the padded 2-gram array per row
    d2 = d.withColumn("__g2", _padded_ngrams(words, 2))
    g2 = F.col("__g2")
    gm = d2.select(
        "doc_id",
        F.size(g2).alias("n_2grams"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(g2)).cast("double") / F.size(g2),
            6,
        ).alias("dup_2gram_frac"),
    )
    tw = (
        d.select("doc_id", F.explode(words).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
                "top_word_frac"
            )
        )
    )
    return (
        gm.join(tw, "doc_id")
        .select(
            "doc_id",
            "n_2grams",
            "dup_2gram_frac",
            "top_word_frac",
            (
                (F.col("dup_2gram_frac") < 0.6) & (F.col("top_word_frac") < 0.2)
            ).alias("passes_repetition"),
        )
        .orderBy("doc_id")
    )


# --- X18: corpus-version drift report ---------------------------------------

_X18_ORACLE = """
WITH v1 AS (
  SELECT lang, count(*) AS n FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
),
v2 AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
t1 AS (SELECT sum(n) AS tot FROM v1),
t2 AS (SELECT sum(n) AS tot FROM v2)
SELECT v2.lang,
       CAST(coalesce(v1.n, 0) AS BIGINT) AS docs_v1,
       CAST(v2.n AS BIGINT) AS docs_v2,
       round(CAST(coalesce(v1.n, 0) AS DOUBLE) / t1.tot, 6) AS share_v1,
       round(CAST(v2.n AS DOUBLE) / t2.tot, 6) AS share_v2,
       round(abs(CAST(v2.n AS DOUBLE) / t2.tot
                 - CAST(coalesce(v1.n, 0) AS DOUBLE) / t1.tot), 6) AS share_drift
FROM v2 LEFT JOIN v1 USING (lang)
CROSS JOIN t1 CROSS JOIN t2
ORDER BY lang
"""


@register("x18_corpus_drift", oracle=_X18_ORACLE, tags=("X4", "X6"))
def x18_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-drift report between two corpus versions (v1 = half the
    docs standing in for "yesterday's snapshot", v2 = all docs): per-
    language doc counts, shares, and absolute share drift — the
    monitoring pass that catches a scraper or filter change silently
    re-weighting the training mixture. Two aggregates + broadcast-scale
    joins of per-lang rollups; the fact scans never join each other.
    With the lakehouse layer, v1/v2 come from time travel
    (`table_snapshot`) over the same table."""
    d = load_table(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 2 == 0).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n1")
    )
    v2 = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n2"))
    t1 = v1.agg(F.sum("n1").alias("tot1"))
    t2 = v2.agg(F.sum("n2").alias("tot2"))
    s1 = F.coalesce("n1", F.lit(0)).cast("double") / F.col("tot1")
    s2 = F.col("n2").cast("double") / F.col("tot2")
    return (
        v2.join(v1, "lang", "left")
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select(
            "lang",
            F.coalesce("n1", F.lit(0)).alias("docs_v1"),
            F.col("n2").alias("docs_v2"),
            F.round(s1, 6).alias("share_v1"),
            F.round(s2, 6).alias("share_v2"),
            F.round(F.abs(s2 - s1), 6).alias("share_drift"),
        )
        .orderBy("lang")
    )


# --- X21: URL parsing / host-level corpus rollup ----------------------------
# Web-scraped pretraining corpora are governed per host: domain
# blocklists, per-host caps, URL dedup. parse_url is the JVM-side
# operator for that (no Python, no UDF); here synthetic-but-
# deterministic URLs are built from document columns so the DuckDB
# oracle can reproduce every extraction with string/regexp ops. The
# rollup (docs + chars per host) is the canonical per-host cap input.

_X21_ORACLE = """
WITH urls AS (
  SELECT
    doc_id,
    n_chars,
    'https://' || source || '.example.org/docs/' || CAST(doc_id AS VARCHAR)
      || '?lang=' || lang || '&v=2' AS url
  FROM documents
)
SELECT
  regexp_extract(url, '^https://([^/]+)/', 1)                   AS host,
  min(regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1))       AS sample_path_min,
  CAST(count(*) AS BIGINT)                                      AS n_docs,
  CAST(sum(n_chars) AS BIGINT)                                  AS total_chars,
  regexp_extract(min(url), 'lang=([a-z]+)', 1)                  AS min_url_lang
FROM urls
GROUP BY 1
ORDER BY 1
"""


@register("x21_url_parsing", oracle=_X21_ORACLE, tags=("X21", "X4", "F1"))
def x21_url_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    urls = d.select(
        "n_chars",
        F.concat(
            F.lit("https://"),
            "source",
            F.lit(".example.org/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            "lang",
            F.lit("&v=2"),
        ).alias("url"),
    )
    parsed = urls.select(
        "n_chars",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.min("path").alias("sample_path_min"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.parse_url(F.min("url"), F.lit("QUERY"), F.lit("lang")).alias(
                "min_url_lang"
            ),
        )
        .orderBy("host")
    )


# --- X22: bigram LM scoring (perplexity-proxy quality signal) ---------------
# CCNet/Gopher-style pipelines score documents with a small LM and drop
# the high-perplexity tail. This is that operator with the LM itself
# trained IN the engine: bigram counts with add-one smoothing over the
# corpus (two hash aggregates), then every bigram scored by joining its
# count tables — all JVM-side, no Python. At 100 TB the count tables
# are Zipf-skewed but tiny relative to the corpus (vocab², sparse);
# they behave like dims: AQE broadcasts them. As written the exploded
# bigram stream is RE-DERIVED for each count table and the final probe
# (four passes over the exploded corpus — Catalyst cannot dedupe the
# differing aggregations without a persist); at 100 TB you persist
# `bi` to disk once and all four passes read that, which is a one-line
# .persist(DISK_ONLY) left out here to keep the driver-harness run
# cache-free. Rolled up per source (the governance unit); per-doc
# scores are the same plan minus the final regroup.

_X22_ORACLE = """
WITH docs AS (
  SELECT doc_id, source, string_split(text, ' ') AS sp FROM documents
),
bi2 AS (
  SELECT doc_id, source, sp[i] AS w1, sp[i + 1] AS w2
  FROM docs, LATERAL (SELECT unnest(generate_series(1, len(sp) - 1)) AS i) t
),
bc AS (SELECT w1, w2, count(*) AS c FROM bi2 GROUP BY 1, 2),
uc AS (SELECT w1, count(*) AS c1 FROM bi2 GROUP BY 1),
v  AS (SELECT count(DISTINCT w) AS vsize
       FROM (SELECT unnest(sp) AS w FROM docs))
SELECT
  b.source,
  CAST(count(*) AS BIGINT)                                   AS n_bigrams,
  round(avg(-ln((bc.c + 1.0) / (uc.c1 + v.vsize))), 4)       AS avg_nll
FROM bi2 b
JOIN bc USING (w1, w2)
JOIN uc USING (w1)
CROSS JOIN v
GROUP BY b.source
ORDER BY b.source
"""


@register("x22_bigram_lm", oracle=_X22_ORACLE, tags=("X22", "X4"))
def x22_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACCEPTED-FLOAT hazard, documented (review-pass r17): avg(-ln p)
    compares two independently-1-ulp ln implementations summed in
    engine-dependent order, masked by round(...,4) — a mean NLL within
    ~1e-12 of a 0.00005 boundary could round differently per engine.
    No integer respell exists for ln; the 4-decimal grid keeps the
    flip probability negligible on realistic NLL distributions (same
    class as x23's regression stats and x35's rank sums)."""
    d = load_table(spark, sf_dir, "documents")
    # NO token-frame cache here (r20, measured): x22's three
    # tokenization passes are cheaper re-run than cached — the
    # MEMORY_AND_DISK write/read of the token arrays costs more
    # executor time than two extra parquet scan+split passes at every
    # tested scale (A/B exec 8.9 -> 14.2 s with the cache; the same
    # cache IS a win in x43, whose probe side re-derives doc-grained
    # bigrams for a far heavier consumer chain).
    # bigrams map-side off the token array (r19): the old posexplode +
    # lead()-window re-ran a full token Exchange+Sort+Window per
    # consumer (bc, uc, probe) — see _bigrams_from_tokens
    bi = _adjacent_bigrams(d, ["source"])
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    # unigram counts roll up from the bigram counts (r19): count(w1)
    # over bi == sum of count(w1, w2) over bc, exactly — so uc
    # aggregates the <= |distinct bigrams|-row bc frame instead of
    # re-deriving the whole corpus-linear bigram stream a second time
    uc = bc.groupBy("w1").agg(F.sum("c").alias("c1"))
    # vocab size as a LAZY broadcast 1-row frame — an eager
    # .distinct().count() here would run a whole extra corpus job on
    # the driver before the main action even starts
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .agg(F.countDistinct("word").cast("double").alias("vsize"))
    )
    scored = (
        bi.join(_bigram_nll(bc, uc, vocab), ["w1", "w2"])
        .select("source", "nll")
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 4).alias("avg_nll"),
        )
        .orderBy("source")
    )


# --- X23: vocabulary growth curve (Heaps'-law fit) --------------------------
# Corpus-health telemetry: V(n) ≈ K·n^β — a log-log linear fit of
# cumulative vocabulary vs cumulative tokens. A falling β across
# ingestion batches signals the crawl is re-reading itself (dedup
# leak); composed entirely from engine primitives already proven here:
# first-occurrence via min(doc_id) per word, cumulative window sums,
# and the a12 regression aggregates for the fit. (The synthetic fixture
# draws from a ~31-word vocabulary, so it saturates instantly and
# β ≈ 0 — the oracle verifies the MECHANICS exactly; the statistic
# becomes meaningful on a real corpus.)

_X23_ORACLE = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
first_seen AS (SELECT word, min(doc_id) AS first_doc FROM words GROUP BY word),
new_per_doc AS (SELECT first_doc AS doc_id, count(*) AS n_new FROM first_seen GROUP BY 1),
tok_per_doc AS (SELECT doc_id, count(*) AS n_tok FROM words GROUP BY 1),
cum AS (
  SELECT t.doc_id,
         sum(t.n_tok) OVER (ORDER BY t.doc_id)          AS cum_tokens,
         sum(coalesce(n.n_new, 0)) OVER (ORDER BY t.doc_id) AS cum_vocab
  FROM tok_per_doc t LEFT JOIN new_per_doc n USING (doc_id)
)
SELECT
  CAST(count(*) AS BIGINT)                                   AS n_docs,
  CAST(max(cum_tokens) AS BIGINT)                            AS total_tokens,
  CAST(max(cum_vocab) AS BIGINT)                             AS total_vocab,
  round(regr_slope(log10(cum_vocab), log10(cum_tokens)), 4) + 0.0 AS heaps_beta,
  round(regr_r2(log10(cum_vocab), log10(cum_tokens)), 4) + 0.0    AS fit_r2
FROM cum
"""


@register("x23_vocab_growth", oracle=_X23_ORACLE, tags=("X23", "X4", "A12"))
def x23_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law telemetry with a DISTRIBUTED two-pass prefix sum.

    r6 verdict finding #1: the cumulative-tokens/vocab pass used
    ``Window.orderBy(doc_id)`` with no partitionBy — a global window
    that funnels one row per DOCUMENT through a single task (billions
    of rows at 100 TB). Respelled as the classic distributed prefix
    sum:

      pass 1 — bucket docs into value-range chunks of doc_id and cumsum
               WITHIN each chunk (window partitioned by chunk: parallel
               across ≤n_chunks tasks, never a single-partition funnel);
      pass 2 — per-chunk totals (≤n_chunks rows — a sketch, the bounded
               collect contract) cumsum on the driver and broadcast
               back as per-chunk offsets; cum = local + offset.

    Identical values to the global window (doc_id is unique, chunks are
    value-ordered), and the plan is ASSERTED to contain only
    partitioned window specs — the j13 pattern: the scale property is
    load-bearing, so it is checked, not hoped.

    ACCEPTED-FLOAT hazard, documented (review-pass r17): heaps_beta /
    fit_r2 hash-compare regr_slope/regr_r2 over log10 doubles — float
    co-moments whose partial-aggregation merge order is engine- and
    run-dependent, masked by round(...,4). The cumulative counts
    themselves are exact integers; only the regression statistics ride
    the x22-class accepted float grid (no integer respell exists for
    log-domain least squares).
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    first_seen = words.groupBy("word").agg(F.min("doc_id").alias("doc_id"))
    new_per_doc = first_seen.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    # per-doc token count MAP-SIDE (r20, guide §2.4): count(*) of the
    # exploded words per doc == size(split(text)) exactly (split always
    # yields >= 1 element, so every doc appears either way) — the old
    # explode + groupBy(doc_id) was a second corpus explode plus a
    # per-doc exchange for a value the row already carries.  new_per_doc
    # is bounded by |vocab| (<= one row per distinct word's first doc);
    # no broadcast HINT — a real corpus's vocab can be broadcast-hostile
    # at 100 TB, so the planner picks the join strategy from its size.
    tok_per_doc = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    per_doc = tok_per_doc.join(new_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    # cached: three consumers (the lo/hi range collect, the per-chunk
    # totals collect, and the final windowed pass) each re-ran the
    # corpus explode + both groupBys + the join (r19, the qd10/x43
    # convention).  Pin cleared by the harness (bench.py / driver_sim
    # clearCache).
    per_doc = per_doc.cache()

    # pass 0: chunking range — ONE tiny aggregate, a 1-row collect
    lo, hi = per_doc.agg(F.min("doc_id"), F.max("doc_id")).first()
    n_chunks = 32
    agg_cols = [
        F.count(F.lit(1)).alias("n_docs"),
        F.max("cum_tokens").cast("bigint").alias("total_tokens"),
        F.max("cum_vocab").cast("bigint").alias("total_vocab"),
    ]
    if lo is None:  # empty corpus: same shape, NULL stats
        cum = per_doc.select(
            "doc_id",
            F.col("n_tok").alias("cum_tokens"),
            F.col("n_new").alias("cum_vocab"),
        )
    else:
        width = max(1, (int(hi) - int(lo)) // n_chunks + 1)
        chunked = per_doc.withColumn(
            "chunk",
            ((F.col("doc_id") - F.lit(int(lo))) / F.lit(width)).cast("long"),
        )
        # pass 1: chunk-local cumsum — PARTITIONED window, parallel
        w_loc = (
            Window.partitionBy("chunk")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        local = chunked.select(
            "doc_id",
            "chunk",
            F.sum("n_tok").over(w_loc).alias("loc_tok"),
            F.sum("n_new").over(w_loc).alias("loc_new"),
        )
        # pass 2: per-chunk totals (≤n_chunks rows — bounded collect),
        # exclusive prefix on the driver, broadcast back as offsets
        totals = (
            chunked.groupBy("chunk")
            .agg(F.sum("n_tok").alias("t"), F.sum("n_new").alias("n"))
            .collect()
        )
        off_rows, ct, cn = [], 0, 0
        for r in sorted(totals, key=lambda r: r.chunk):
            off_rows.append((int(r.chunk), ct, cn))
            ct += int(r.t)
            cn += int(r.n)
        offsets = spark.createDataFrame(
            off_rows, "chunk long, off_tok long, off_new long"
        )
        cum = local.join(F.broadcast(offsets), "chunk").select(
            "doc_id",
            (F.col("loc_tok") + F.col("off_tok")).alias("cum_tokens"),
            (F.col("loc_new") + F.col("off_new")).alias("cum_vocab"),
        )
        # scale assert (j13 pattern): every window spec in the plan
        # must carry a partition clause — an unpartitioned spec's first
        # argument is the sort column ("doc_id#N ASC NULLS FIRST"),
        # a partitioned one's is the chunk column (no ASC/DESC).
        from ..plans.explain import assert_no_unpartitioned_window

        assert_no_unpartitioned_window(cum, "x23", require_window=True)
    lv, lt = F.log10("cum_vocab"), F.log10("cum_tokens")
    return cum.agg(
        *agg_cols,
        (F.round(F.regr_slope(lv, lt), 4) + F.lit(0.0)).alias("heaps_beta"),
        (F.round(F.regr_r2(lv, lt), 4) + F.lit(0.0)).alias("fit_r2"),
    )


# --- X24: bloom-filter decontamination (zero-shuffle x16) -------------------
# x16 proves contamination by JOINING training shingles against the
# benchmark's — exact, but the training side shuffles. This is the
# 100 TB spelling: a bloom filter over the (small) benchmark shingles
# broadcasts, and the training scan probes locally — one pass, no
# shuffle of corpus data (operators/bloom.py).
#
# VALUE-ORACLED from r10 (r9 verdict #4, last rows-only EXT flagship):
# the bloom's hash family is the repo's cross-engine md5 spelling
# (hex halves + Kirsch-Mitzenmacher affine, x2e precedent), so DuckDB
# re-derives EVERY set bit (bench shingle × k positions, DISTINCT)
# and EVERY probe verdict (a shingle hits iff all k of its positions
# joined a set bit) — false positives included, decision-for-decision.
# The flag rule is integer-exact on both sides: 2*n_hits >= n_shingles
# (== hit_frac >= 0.5, no float). Self-asserts kept: no false
# negatives vs the exact join, bounded false-positive rate.

_X24_M = 1 << 20
_X24_K = 5

_X24_ORACLE = f"""
WITH docsh AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, len(string_split(text, ' ')) - 2),
           i -> concat(string_split(text, ' ')[i], ' ',
                       string_split(text, ' ')[i+1], ' ',
                       string_split(text, ' ')[i+2])) AS sh
  FROM documents
),
bsh AS (
  SELECT DISTINCT unnest(sh) AS s FROM docsh WHERE doc_id % 11 = 0
),
bits AS (
  SELECT DISTINCT
         (CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
          + i * CAST(('0x' || substr(md5(s), 9, 8)) AS BIGINT))
         % {_X24_M} AS pos
  FROM bsh CROSS JOIN (SELECT unnest(generate_series(0, {_X24_K - 1})) AS i) g
),
inst AS (
  SELECT doc_id, unnest(sh) AS s, generate_subscripts(sh, 1) AS idx
  FROM docsh
),
hits AS (
  SELECT doc_id, idx,
         CASE WHEN count(b.pos) = {_X24_K} THEN 1 ELSE 0 END AS hit
  FROM (SELECT doc_id, idx,
               CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS h1,
               CAST(('0x' || substr(md5(s), 9, 8)) AS BIGINT) AS h2
        FROM inst) p
  CROSS JOIN (SELECT unnest(generate_series(0, {_X24_K - 1})) AS i) g
  LEFT JOIN bits b ON b.pos = (p.h1 + g.i * p.h2) % {_X24_M}
  GROUP BY doc_id, idx
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(hit) AS BIGINT) AS n_hits
  FROM hits GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_hits,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS is_planted
FROM scored
WHERE 2 * n_hits >= n_shingles
ORDER BY doc_id
"""


@register("x24_bloom_contamination", oracle=_X24_ORACLE, tags=("X24", "X16", "X4"))
def x24_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import build_bloom, probe_bloom_scalar
    from ..operators.dedup import word_shingles

    # No repartition here (r18, VERDICT-r17 #2): the old
    # repartition(defaultParallelism) existed only to undo the
    # single-file fixture layout and cost a full corpus shuffle that a
    # real multi-split table never needs — the bench now reads a
    # 16-slice layout (bench.py bench_layout), so scan parallelism is
    # the input's own, exactly as at 100 TB.
    d = load_table(spark, sf_dir, "documents")
    # "benchmark" = docs 0 mod 11; "training corpus" = all docs, so the
    # benchmark docs themselves are planted contamination
    bench = d.filter(F.col("doc_id") % 11 == 0)
    # ONE definition of the bench shingle frame (review-pass finding:
    # two spelled-out copies could silently diverge and break the
    # no-false-negative contract confusingly)
    bench_raw = bench.select(
        F.explode(word_shingles("text", 3)).alias("sh")
    )
    bench_sh = bench_raw.distinct()
    # build from the RAW explode, not the distinct frame: OR-ing a
    # duplicate shingle is idempotent, so the bitmap is identical, and
    # skipping distinct makes the build entirely map-side — zero
    # shuffle (measured: the distinct's string exchange + coalesced
    # single-task tail was over half the query's wall at sf0.1). The
    # distinct frame still feeds the truth probe, where multiplicity
    # would overcount.
    bitmap = build_bloom(bench_raw, "sh", m_bits=_X24_M, k=_X24_K)

    # ONE corpus pass for probe AND exact truth (r19, guide §1.2: the
    # r18 stage split measured the truth join at 67.9% of executor
    # time — it was a SECOND full corpus shingle pass plus a
    # scored⋈truth re-join).  Each exploded shingle instance carries
    # both verdicts on the same row: the bloom probe (map-side
    # pandas_udf over JVM-computed md5 halves) and the exact-truth
    # broadcast LEFT join against the distinct bench shingles (the x16
    # shape: eval suites are MBs; corpus shingles never shuffle).  One
    # per-doc aggregate then yields n_shingles / n_hits / n_true_hits
    # together — the values the old probe_bloom + truth-join pair
    # produced, row for row (explode_outer keeps zero-shingle docs, so
    # n_docs and the clean_flagged base are unchanged; sum over the
    # all-NULL __true column is NULL, matching the old left join's
    # missing-truth rows).
    ex = d.select(
        "doc_id", F.explode_outer(word_shingles("text", 3)).alias("s")
    )
    probed = probe_bloom_scalar(
        ex, "s", bitmap, m_bits=_X24_M, k=_X24_K, out_col="__in_bloom"
    )
    marked = probed.join(
        F.broadcast(
            bench_sh.withColumnRenamed("sh", "s").withColumn(
                "__true", F.lit(1)
            )
        ),
        "s",
        "left",
    )
    scored = (
        marked.groupBy("doc_id")
        .agg(
            F.count("s").cast("int").alias("n_shingles"),
            F.coalesce(
                F.sum(F.col("__in_bloom").cast("int")), F.lit(0)
            )
            .cast("int")
            .alias("n_hits"),
            F.sum("__true").alias("n_true_hits"),
        )
        .cache()
    )
    try:
        # integer flag rule — identical arithmetic to the oracle's
        # (2*n_hits >= n_shingles == hit_frac >= 0.5, float-free)
        is_flagged = (F.col("n_shingles") > 0) & (
            2 * F.col("n_hits") >= F.col("n_shingles")
        )
        # ALL self-checks in ONE pass over the per-doc frame:
        #   1) no false negatives: every planted benchmark doc with
        #      >= 1 shingle must flag (ALL its shingles are in the
        #      bloom by construction);
        #   2) per-shingle accounting never undercounts exact truth;
        #   3) false-positive discipline: clean docs (zero true
        #      overlap) stay overwhelmingly unflagged at this m/k.
        nt = F.coalesce(F.col("n_true_hits"), F.lit(0))
        stats = (
            scored
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(
                    ((F.col("doc_id") % 11 == 0) & (F.col("n_shingles") > 0))
                    .cast("long")
                ).alias("n_bench"),
                F.sum(
                    (
                        (F.col("doc_id") % 11 == 0)
                        & (F.col("n_shingles") > 0)
                        & is_flagged
                    ).cast("long")
                ).alias("n_bench_flagged"),
                F.sum((F.col("n_hits") < nt).cast("long")).alias("under"),
                F.sum(
                    (is_flagged & F.col("n_true_hits").isNull()).cast("long")
                ).alias("clean_flagged"),
            )
            .collect()[0]
        )
        if stats.n_bench == 0:
            # the no-false-negative check below is vacuous with zero
            # planted docs — raise like x20/x49 instead of silently
            # certifying an unexercised bloom (review-pass r16)
            raise AssertionError("x24: plant produced zero benchmark docs")
        if stats.n_bench_flagged != stats.n_bench:
            raise AssertionError(
                f"bloom missed planted contamination: "
                f"{stats.n_bench_flagged}/{stats.n_bench}"
            )
        if stats.under:
            raise AssertionError(
                f"{stats.under} docs undercounted vs exact join"
            )
        if stats.clean_flagged > max(2, 0.01 * stats.n_docs):
            raise AssertionError(
                f"bloom over-flagged {stats.clean_flagged} clean docs"
            )
        return (
            scored.filter(is_flagged)
            .select(
                "doc_id",
                F.col("n_shingles").cast("long").alias("n_shingles"),
                F.col("n_hits").cast("long").alias("n_hits"),
                (F.col("doc_id") % 11 == 0).cast("long").alias("is_planted"),
            )
            .orderBy("doc_id")
            # sever lineage BEFORE the finally unpersists the cache —
            # a lazy return would re-run the whole probe pipeline when
            # the caller evaluates it (x20/x49 pattern; review-pass
            # finding)
            .localCheckpoint()
        )
    finally:
        scored.unpersist(blocking=False)


# --- X33: per-host quota capping (domain-balanced corpus governance) --------
# The standard companion to X21's host rollup: web corpora cap any one
# host's contribution (mega-hosts like pastebins otherwise dominate the
# mixture), keeping each host's top-Q documents by a quality proxy.
# Spelled as one row_number window over host — a single shuffle on the
# governance key, no Python. 100 TB note: per-host top-Q is
# SALT-COMPOSABLE (top-Q of a union is the top-Q of per-salt top-Qs),
# so a skewed mega-host is handled by the two-phase spelling
# IMPLEMENTED as operators/skew.py::salted_top_k (equivalence with the
# single window proven in tests/test_operators.py) — the same respell
# AQE's skew-join applies to joins, done manually for the window. At
# this fixture scale the single window is the honest plan.

_X33_QUOTA = 15

_X33_ORACLE = f"""
WITH hosts AS (
  SELECT doc_id, n_chars, source || '.example.org' AS host FROM documents
),
ranked AS (
  SELECT host, doc_id, n_chars,
         row_number() OVER (PARTITION BY host
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM hosts
)
SELECT host,
       CAST(count(*) AS BIGINT)                                    AS n_docs,
       CAST(count(*) FILTER (WHERE rk <= {_X33_QUOTA}) AS BIGINT)  AS n_kept,
       CAST(count(*) FILTER (WHERE rk > {_X33_QUOTA}) AS BIGINT)   AS n_dropped,
       CAST(sum(n_chars) FILTER (WHERE rk <= {_X33_QUOTA}) AS BIGINT)
                                                                   AS kept_chars,
       CAST(min(n_chars) FILTER (WHERE rk <= {_X33_QUOTA}) AS BIGINT)
                                                                   AS kept_min_chars
FROM ranked GROUP BY host ORDER BY host
"""


@register("x33_host_quota", oracle=_X33_ORACLE, tags=("X33", "X21", "W4"))
def x33_host_quota(
    spark: SparkSession,
    sf_dir: str,
    *,
    salted: bool = False,
    n_salts: int = 32,
) -> DataFrame:
    """Cap every host at its top-``_X33_QUOTA`` docs by length (quality
    proxy), deterministic tie-break on doc_id; report the keep/drop
    accounting per host. The kept set itself is ``rk <= Q`` — the
    rollup is returned because it is the auditable governance artifact.
    Quota chosen to bite at sf0.01 (25 docs/host → 10 dropped).

    r12 respell (the x36 audit pattern): the old aggregate-over-ranks
    spelling forced the quota window to rank EVERY row per host with
    no group limit; now the kept-side stats come from the rk <= Q
    rank-FILTER branch — which Spark bounds with WindowGroupLimit
    below the shuffle (<= Q rows per host per map task) — and the
    totals are a pure aggregate; n_dropped is their difference (ranks
    are dense).

    ``salted=True`` (r14, VERDICT r13 #4) runs the SAME cut through
    operators/skew.py::salted_top_k — the two-phase salt-composable
    spelling for the mega-host skew case, where one pathologically hot
    host would otherwise funnel its <= Q-per-map-task survivors
    through a single reduce task: phase 1 ranks within (host, salt)
    across ``n_salts`` tasks, phase 2 re-ranks the bounded <=
    n_salts*Q survivors. Result-parity with the default path is
    pinned on a planted mega-host fixture in
    tests/test_operators.py::test_x33_x36_salted_path_parity; the
    driver default stays the single group-limited window — the honest
    plan at fixture scale."""
    d = load_table(spark, sf_dir, "documents")
    hosts = d.select(
        "doc_id",
        "n_chars",
        F.concat("source", F.lit(".example.org")).alias("host"),
    )
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    if salted:
        from ..operators.skew import salted_top_k

        kept = salted_top_k(hosts, ["host"], order, _X33_QUOTA, n_salts)
    else:
        w = Window.partitionBy("host").orderBy(*order)
        kept = (
            hosts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _X33_QUOTA)  # -> WindowGroupLimit
            .drop("rk")
        )
    kept_stats = kept.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
        F.min("n_chars").alias("kept_min_chars"),
    )
    totals = hosts.groupBy("host").agg(F.count(F.lit(1)).alias("n_docs"))
    # every host keeps >= 1 doc (Q >= 1), so the inner join drops none
    return (
        totals.join(kept_stats, "host")
        .select(
            "host",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
            "kept_chars",
            "kept_min_chars",
        )
        .orderBy("host")
    )


# --- X35: host-graph PageRank (link-based quality prior) --------------------
# Common-Crawl-style curation weights hosts by link centrality
# (PageRank / harmonic centrality) as a quality prior for sampling.
# The fixture has no hyperlinks, so the link graph is derived
# DETERMINISTICALLY from document columns (doc d links host(d) →
# host(doc (d.doc_id*31 + d.n_chars) mod N), weight n_chars, self-host
# links dropped) — both engines re-derive the identical weighted graph,
# so the oracle verifies the ITERATION exactly, not a fixture artifact.
# This is the repo's one value-oracled ITERATIVE algorithm: 8 fixed
# power iterations at damping 0.85, DuckDB replaying them as 8
# unrolled CTE steps (recursive CTEs forbid aggregation in the
# recursive term, so unrolling is the honest SQL spelling).
# Scale: every iteration is one join + one groupBy shuffle keyed on
# host — the Pregel pattern on DataFrames. At web scale persist the
# edge frame once, persist each rank frame and localCheckpoint every
# few iterations to truncate lineage; iteration count stays fixed
# (power iteration converges geometrically at d=0.85). Dangling-mass
# convention: dropped (contributions flow only along edges) —
# identical on both sides, so parity holds for any graph.

_X35_ITERS = 8
_X35_DAMP = 0.85


def _x35_cte_body() -> str:
    """WITH-body CTE chain deriving the deterministic host link graph
    and unrolling the ``_X35_ITERS`` power-iteration steps; the final
    rank relation is ``r{_X35_ITERS}(host, r)``. Shared by the x35 and
    x37 oracles so both engines replay the identical iteration."""
    base = """n_docs AS (SELECT max(doc_id) + 1 AS n FROM documents),
links AS (
  SELECT d.source || '.example.org' AS src,
         t.source || '.example.org' AS dst,
         d.n_chars AS w
  FROM documents d
  CROSS JOIN n_docs
  JOIN documents t ON t.doc_id = (d.doc_id * 31 + d.n_chars) % n_docs.n
  WHERE d.source <> t.source
),
edges AS (SELECT src, dst, CAST(sum(w) AS DOUBLE) AS w FROM links GROUP BY 1, 2),
outdeg AS (SELECT src, sum(w) AS wout FROM edges GROUP BY 1),
hosts AS (SELECT DISTINCT source || '.example.org' AS host FROM documents),
nh AS (SELECT count(*) AS n FROM hosts),
r0 AS (SELECT host, 1.0 / n AS r FROM hosts CROSS JOIN nh)"""
    # per-edge term is r * (w/wout) — PARENTHESIZED to match the Spark
    # operator's op sequence exactly (components.pagerank precomputes
    # __p = w/wout once, then sums rank*__p; the old left-assoc
    # (r*w)/wout rounded in a different association, up to 1 ulp per
    # contribution compounded over 8 iterations — review-pass r17).
    # Summation ORDER remains engine-dependent; round(6) absorbs it
    # (the documented accepted-float class, x22 precedent).
    steps = []
    for i in range(1, _X35_ITERS + 1):
        steps.append(
            f"""r{i} AS (
  SELECT h.host,
         {1 - _X35_DAMP} / nh.n
           + {_X35_DAMP} * coalesce(sum(p.r * (e.w / o.wout)), 0) AS r
  FROM hosts h
  CROSS JOIN nh
  LEFT JOIN edges e ON e.dst = h.host
  LEFT JOIN outdeg o ON o.src = e.src
  LEFT JOIN r{i - 1} p ON p.host = e.src
  GROUP BY h.host, nh.n
)"""
        )
    return base + ",\n" + ",\n".join(steps)


def _x35_oracle() -> str:
    return (
        "WITH "
        + _x35_cte_body()
        + f"\nSELECT host, round(r, 6) + 0.0 AS pagerank"
        f"\nFROM r{_X35_ITERS} ORDER BY host"
    )


def _host_rank_frame(d: DataFrame) -> DataFrame:
    """(host, rank) from the deterministic derived link graph — the
    shared Spark half of the x35/x37 PageRank prior (twin of
    ``_x35_cte_body``'s links/edges CTEs)."""
    from ..operators.components import pagerank

    host = F.concat("source", F.lit(".example.org"))
    n_docs = d.agg((F.max("doc_id") + 1).alias("n"))
    tgt = d.select(F.col("doc_id").alias("t_id"), host.alias("dst"))
    links = (
        d.crossJoin(F.broadcast(n_docs))
        .select(
            host.alias("src"),
            ((F.col("doc_id") * 31 + F.col("n_chars")) % F.col("n")).alias(
                "t_id"
            ),
            F.col("n_chars").alias("w"),
        )
        .join(tgt, "t_id")
        .filter(F.col("src") != F.col("dst"))
    )
    return pagerank(
        links,
        "src",
        "dst",
        "w",
        damping=_X35_DAMP,
        iters=_X35_ITERS,
        nodes=d.select(host.alias("host")),
    ).select(F.col("node").alias("host"), "rank")


@register("x35_host_pagerank", oracle=_x35_oracle(), tags=("X35", "X21"))
def x35_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        _host_rank_frame(d)
        .select("host", F.round("rank", 6).alias("pagerank"))
        .orderBy("host")
    )


# --- X37: quality-signal ensemble (CCNet/RefinedWeb-style fusion) -----------
# Real curation fuses independent quality signals — here length,
# lexical diversity (distinct/total tokens), and the x35 host-PageRank
# prior — by rank-normalizing each PER LANGUAGE (percent_rank: raw
# signal scales are incomparable across signals AND across languages)
# and blending 0.4/0.3/0.3, then keeping the top-5 docs per language
# (deterministic doc_id tie-break).
#
# SCALE (r7 verdict finding, closed r8): lang is a LOW-CARDINALITY,
# HEAVILY SKEWED partition key — a real corpus is English-dominated,
# so `percent_rank() OVER (PARTITION BY lang ...)` funnels one
# language's billions of rows through ONE task (the x23 failure class,
# one partition key better). Respelled with the w5b chunked prefix
# machinery, generalized in operators/skew.py::chunked_percent_ranks:
# all three signals rank in ONE pass over a distinct-value frame with
# every window partitioned by (lang, sig, chunk) — plan-ASSERTED below
# — and the top-5 cut is salted_top_k (x33's two-phase spelling), so
# no full-corpus window is partitioned on lang alone. The PageRank
# prior still joins in as a tiny broadcast |hosts|-row frame. The
# oracle replays everything, including all 8 power-iteration steps,
# via the shared _x35_cte_body — values hash-match because
# percent_rank = cnt_lt/(n-1) is the identical double arithmetic.

_X37_ORACLE = (
    "WITH "
    + _x35_cte_body()
    + f""",
sig AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_uniq,
         source || '.example.org' AS host
  FROM documents
),
scored0 AS (
  SELECT s.doc_id, s.lang,
         CAST(s.n_tok AS DOUBLE) AS s_len,
         CAST(s.n_uniq AS DOUBLE) / s.n_tok AS s_div,
         r.r AS s_host
  FROM sig s JOIN r{_X35_ITERS} r ON r.host = s.host
),
ranked AS (
  SELECT doc_id, lang,
         percent_rank() OVER (PARTITION BY lang ORDER BY s_len) AS r_len,
         percent_rank() OVER (PARTITION BY lang ORDER BY s_div) AS r_div,
         percent_rank() OVER (PARTITION BY lang ORDER BY s_host) AS r_host
  FROM scored0
),
blend AS (
  SELECT doc_id, lang,
         round(0.4 * r_len + 0.3 * r_div + 0.3 * r_host, 6) + 0.0 AS score
  FROM ranked
),
top AS (
  SELECT lang, doc_id, score,
         row_number() OVER (PARTITION BY lang
                            ORDER BY score DESC, doc_id) AS rk
  FROM blend
)
SELECT lang, CAST(rk AS BIGINT) AS lang_rank, doc_id, score
FROM top WHERE rk <= 5 ORDER BY lang, lang_rank"""
)


@register(
    "x37_quality_ensemble",
    oracle=_X37_ORACLE,
    tags=("X37", "X4", "X35", "W4"),
)
def x37_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sig = d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("double").alias("s_len"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "s_div"
        ),
        F.concat("source", F.lit(".example.org")).alias("host"),
    )
    scored0 = sig.join(
        F.broadcast(
            _host_rank_frame(d).select("host", F.col("rank").alias("s_host"))
        ),
        "host",
    )

    from ..operators.skew import chunked_percent_ranks, salted_top_k

    ranked = chunked_percent_ranks(
        scored0,
        part_col="lang",
        value_cols=["s_len", "s_div", "s_host"],
        id_cols=["doc_id"],
        out_prefix="r_",
    )
    # scale assert (x23/j13 pattern): every window in the rank pipeline
    # must be chunk-partitioned — a window partitioned on lang alone
    # (or unpartitioned) would re-open the single-language funnel.
    from ..plans.explain import assert_windows_partitioned_by

    assert_windows_partitioned_by(ranked, "chunk", "x37")
    blend = ranked.select(
        "doc_id",
        "lang",
        F.round(
            0.4 * F.col("r_s_len")
            + 0.3 * F.col("r_s_div")
            + 0.3 * F.col("r_s_host"),
            6,
        ).alias("score"),
    )
    # top-5 per lang via the two-phase salted spelling (x33 precedent):
    # phase 1 ranks within (lang, salt), phase 2's lang-only window
    # sees <= n_salts*5 bounded survivors per language, never the corpus
    top = salted_top_k(
        blend,
        key_cols=["lang"],
        order_cols=[F.col("score").desc(), "doc_id"],
        k=5,
        rank_col="lang_rank",
    )
    return top.select(
        "lang",
        F.col("lang_rank").cast("long").alias("lang_rank"),
        "doc_id",
        "score",
    ).orderBy("lang", "lang_rank")


# --- X38: DSIR-style importance resampling ----------------------------------
# Data Selection with Importance Resampling (Xie et al., 2023, public):
# score every raw document by how target-domain-like its hashed n-gram
# distribution is, then keep the top slice. Standard DSIR uses the
# log-likelihood ratio sum_tok log(p_tgt(b)/p_raw(b)); engine-exact
# cross-checking of float log sums is hostile (summation order), so
# this operator scores with the FIRST-ORDER surrogate — per-bucket
# probability DIFFERENCE in parts-per-million, integer-exact in both
# engines:
#
#   score_b  = ppm(p_tgt(b)) - ppm(p_raw(b)),  add-1 smoothed,
#   ppm(p)   = floor((count+1) * 1e6 / (total + B))  [floor division]
#   doc_score = sum_b count_in_doc(b) * score_b
#
# which preserves DSIR's ranking intent (upweight buckets the target
# over-uses) while every arithmetic step is bigint. The float
# log-ratio variant is a one-line swap where exactness isn't required.
#
# Scale shape: one corpus-linear token explode; the per-doc shuffle
# carries (doc_id, bucket, count) ints — never text; the bucket score
# table is B=256 rows, BROADCAST; final selection is a top-k
# (TakeOrdered — no global sort materialization). Overflow headroom:
# ppm scores are <= 1e6, per-doc token counts bounded, so doc_score
# stays far inside bigint at any corpus size (the raw-count
# formulation (t_b+1)*(R+B) would overflow at ~1e12 tokens — that is
# WHY the ppm normalization happens before the per-doc sum).
# Target domain here: lang='fr' documents (any small exemplar set
# works); raw = the full corpus.

_X38_BUCKETS = 256
_X38_TOPK = 100

_X38_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(t.tok), 1, 8)) AS BIGINT)
           % {_X38_BUCKETS} AS b
  FROM documents,
       LATERAL unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''
),
raw AS (SELECT b, count(*) AS r_b FROM tok GROUP BY b),
tgt AS (SELECT b, count(*) AS t_b FROM tok WHERE lang = 'fr' GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM tok) AS big_r,
               (SELECT count(*) FROM tok WHERE lang = 'fr') AS big_t),
scores AS (
  SELECT raw.b,
         (coalesce(t_b, 0) + 1) * 1000000
             // (big_t + {_X38_BUCKETS})
         - (r_b + 1) * 1000000 // (big_r + {_X38_BUCKETS}) AS score_b
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
),
doc_bucket AS (
  SELECT doc_id, lang, b, count(*) AS c FROM tok GROUP BY doc_id, lang, b
),
scored AS (
  SELECT doc_id, lang,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(sum(c * score_b) AS BIGINT) AS dsir_score
  FROM doc_bucket JOIN scores USING (b)
  GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_tokens, dsir_score
FROM scored
ORDER BY dsir_score DESC, doc_id
LIMIT {_X38_TOPK}
"""


@register("x38_dsir_importance", oracle=_X38_ORACLE, tags=("X38", "X4"))
def x38_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    B = _X38_BUCKETS
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        # md5 bucket, not xxhash64: cross-engine determinism (the
        # repo-standard hash_bucket scheme, replayable in DuckDB)
        .withColumn("b", hash_bucket(F.col("tok"), B))
        .drop("tok")
    )
    # ONE corpus-linear pass (review-pass r16): raw and tgt are pure
    # rollups of doc_bucket (per-bucket count == sum of per-doc
    # counts), so everything derives from the <= docs*B-row integer
    # frame and the old corpus-scale tok.cache() — the largest cache
    # in the module — is gone. No unpersist on doc_bucket: the
    # returned frame executes lazily AFTER this function returns; the
    # pin is cleared by the harness (bench.py / driver_sim clearCache).
    doc_bucket = tok.groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    doc_bucket.cache()
    raw = doc_bucket.groupBy("b").agg(F.sum("c").alias("r_b"))
    tgt = (
        doc_bucket.filter(F.col("lang") == "fr")
        .groupBy("b")
        .agg(F.sum("c").alias("t_b"))
    )
    # coalesce the totals (review-pass r16): with NO target-language
    # docs, sum() is NULL where the oracle's count is 0 — every
    # dsir_score silently NULLed while DuckDB returned real scores
    totals = raw.agg(
        F.coalesce(F.sum("r_b"), F.lit(0)).alias("big_r")
    ).crossJoin(
        tgt.agg(F.coalesce(F.sum("t_b"), F.lit(0)).alias("big_t"))
    )
    # `div` (not floor(a/b)): bigint floor division stays EXACT where
    # (count+1)*1e6 exceeds double's 2^53 integer range — DuckDB's //
    # is integer division too, so the engines agree bit-for-bit
    scores = (
        raw.join(F.broadcast(tgt), "b", "left")  # both sides <= B rows
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.expr(
                    f"(coalesce(t_b, 0L) + 1) * 1000000L div (big_t + {B})"
                )
                - F.expr(f"(r_b + 1) * 1000000L div (big_r + {B})")
            ).alias("score_b"),
        )
    )
    scored = (
        doc_bucket.join(F.broadcast(scores), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("score_b")).alias("dsir_score"),
        )
    )
    return scored.orderBy(F.col("dsir_score").desc(), "doc_id").limit(
        _X38_TOPK
    )


# --- X41: per-document benchmark-overlap fraction ---------------------------
# The GPT-3/Pile decontamination POLICY layer on top of x16's pairwise
# scan: for every training document, the fraction of its distinct word
# 3-grams that appear ANYWHERE in the benchmark set, flagging docs
# above a threshold. x16 answers "which (bench, train) pairs collide";
# x41 answers the operational question "which training docs do we
# DROP, and how contaminated are they" — per-doc aggregate semantics,
# not pairwise (a doc overlapping 50 benchmarks a little and one a lot
# scores the same as its union, which is what a drop decision needs).
# Scale shape: the benchmark shingle set is distinct-compressed and
# BROADCAST (eval suites are tiny next to a training corpus); the
# corpus streams through one scan + one corpus-linear explode; the
# per-doc aggregate shuffles (doc_id, counts) ints. The fraction is
# basis points via bigint floor division — engine-exact.

_X41_THRESH_BP = 500  # flag docs with >= 5% benchmark 3-gram overlap

_X41_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> concat(string_split(text,' ')[i], ' ',
                       coalesce(string_split(text,' ')[i+1], ''), ' ',
                       coalesce(string_split(text,' ')[i+2], ''))))) AS shingle
  FROM documents
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
scored AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(count(b.shingle) AS BIGINT) AS n_hit
  FROM train t LEFT JOIN bench b USING (shingle)
  GROUP BY t.doc_id
)
SELECT s.doc_id, d.lang, n_shingles, n_hit,
       n_hit * 10000 // n_shingles AS overlap_bp
FROM scored s JOIN documents d ON s.doc_id = d.doc_id
WHERE n_hit * 10000 // n_shingles >= {_X41_THRESH_BP}
ORDER BY overlap_bp DESC, s.doc_id
"""


@register("x41_ngram_overlap", oracle=_X41_ORACLE, tags=("X41", "X4"))
def x41_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "__words", F.split("text", " ")  # materialized — x4d idiom
    )
    words = F.col("__words")
    # lang rides through the explode (few bytes per shingle row) so the
    # per-doc aggregate needs no second corpus scan + doc_id join
    sh = d.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(_padded_ngrams(words, 3))).alias("shingle"),
    )
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % 97 != 0)
    scored = (
        train.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_hit"),
        )
    )
    return (
        scored
        .withColumn("overlap_bp", F.expr("n_hit * 10000L div n_shingles"))
        .filter(F.col("overlap_bp") >= _X41_THRESH_BP)
        .select("doc_id", "lang", "n_shingles", "n_hit", "overlap_bp")
        .orderBy(F.col("overlap_bp").desc(), "doc_id")
    )


# --- X43: CCNet head/middle/tail perplexity buckets -------------------------
# CCNet's signature move (public pipeline, Wenzek et al.): score every
# document with a small LM, split each LANGUAGE into perplexity
# terciles — head (most fluent), middle, tail — and train on
# head+middle while keeping tail for audit. Composes two proven
# pieces: x22's in-engine add-one bigram LM for the per-doc NLL, and
# the chunked percent_rank machinery (operators/skew.py, the x37/w5b
# respell) for the per-lang tercile WITHOUT a window partitioned on
# the skewed low-cardinality lang key — an English-dominated corpus
# never funnels through one task. Per-doc NLL is rounded to 4 decimals
# BEFORE ranking on both engines (the x22 float precedent), and the
# tercile is floor(pr*3) on the identical double pr both engines
# derive, so bucket assignment is engine-exact.

_X43_ORACLE = """
WITH docs AS (
  SELECT doc_id, lang, string_split(text, ' ') AS sp FROM documents
),
bi2 AS (
  SELECT doc_id, lang, sp[i] AS w1, sp[i + 1] AS w2
  FROM docs, LATERAL (SELECT unnest(generate_series(1, len(sp) - 1)) AS i) t
),
bc AS (SELECT w1, w2, count(*) AS c FROM bi2 GROUP BY 1, 2),
uc AS (SELECT w1, count(*) AS c1 FROM bi2 GROUP BY 1),
v  AS (SELECT count(DISTINCT w) AS vsize
       FROM (SELECT unnest(sp) AS w FROM docs)),
doc_nll AS (
  SELECT b.doc_id, b.lang,
         round(avg(-ln((bc.c + 1.0) / (uc.c1 + v.vsize))), 4) AS nll
  FROM bi2 b JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
  GROUP BY b.doc_id, b.lang
),
ranked AS (
  SELECT *,
         percent_rank() OVER (PARTITION BY lang ORDER BY nll) AS pr
  FROM doc_nll
),
bucketed AS (
  SELECT lang,
         least(CAST(floor(pr * 3) AS BIGINT), 2) AS bucket,
         doc_id, nll
  FROM ranked
)
SELECT lang, bucket,
       CASE bucket WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
            ELSE 'tail' END AS bucket_name,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       round(min(nll), 4) AS min_nll,
       round(max(nll), 4) AS max_nll
FROM bucketed
GROUP BY lang, bucket ORDER BY lang, bucket
"""


@register("x43_perplexity_buckets", oracle=_X43_ORACLE, tags=("X43", "X22", "X4"))
def x43_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACCEPTED-FLOAT hazard, documented (review-pass r17, x22's
    class with a sharper edge): the per-doc NLL is a float ln sum in
    engine-dependent order, and here it feeds percent-rank tercile
    assignment — a boundary flip would move a doc (and its cohort's
    id_sum/min/max) across bucket rows, not just nudge a rounded cell.
    The round(...,4) grid plus the rank tie-break on the exact nll
    keep the flip probability negligible; no integer respell exists
    for ln, so the hazard is documented rather than eliminated."""
    from ..operators.skew import chunked_percent_ranks

    d = load_table(spark, sf_dir, "documents")
    # ONE corpus scan + regex split (r20, guide §5): the cached token
    # frame feeds the bc bigram aggregate, the probe join's bigram
    # stream, and the vocab pass — previously three scan+split passes.
    # At 100 TB this persist goes to DISK_ONLY (x22 header note); pin
    # cleared by the harness clearCache.
    toks = _token_frame(d, ["doc_id", "lang"]).cache()
    # bigrams map-side off the token array (r19): the old posexplode +
    # lead()-window re-ran a full token Exchange+Sort+Window per
    # consumer (bc, uc, probe) — see _bigrams_from_tokens
    bi = _bigrams_from_tokens(toks, ["doc_id", "lang"])
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    # unigram counts roll up from the bigram counts (r19): count(w1)
    # over bi == sum of count(w1, w2) over bc, exactly — so uc
    # aggregates the <= |distinct bigrams|-row bc frame instead of
    # re-deriving the whole corpus-linear bigram stream a second time
    uc = bc.groupBy("w1").agg(F.sum("c").alias("c1"))
    vocab = (
        toks.select(F.explode("__sp").alias("word"))
        .agg(F.countDistinct("word").cast("double").alias("vsize"))
    )
    doc_nll = (
        bi.join(_bigram_nll(bc, uc, vocab), ["w1", "w2"])
        .groupBy("doc_id", "lang")
        .agg(F.round(F.avg("nll"), 4).alias("nll"))
    )
    # the per-doc NLL frame is tiny (one row per doc) but its subtree
    # is the whole bigram-LM join, and it feeds THREE consumers (the
    # rank machinery's approxQuantile action, its offset collect, and
    # the final join) — cache it so the LM trains once; pin cleared
    # by the harness (bench.py / driver_sim clearCache)
    doc_nll = doc_nll.cache()
    # keep_vals (r20): the rank machinery's stream already carries nll,
    # so asking for it back skips the old per-doc join of ranked ⋈
    # doc_nll (~16 exec-s of x43's stage split for a column the stream
    # held all along); nll is double before and after, value-identical
    ranked = chunked_percent_ranks(
        doc_nll, "lang", ["nll"], ["doc_id"], n_chunks=8, keep_vals=True
    )
    bucketed = ranked.withColumn(
        "bucket",
        F.least(F.floor(F.col("pr_nll") * 3), F.lit(2)).cast("long"),
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.round(F.min("nll"), 4).alias("min_nll"),
            F.round(F.max("nll"), 4).alias("max_nll"),
        )
        .withColumn(
            "bucket_name",
            F.when(F.col("bucket") == 0, "head")
            .when(F.col("bucket") == 1, "middle")
            .otherwise("tail"),
        )
        .select(
            "lang", "bucket", "bucket_name", "n_docs", "id_sum",
            "min_nll", "max_nll",
        )
        .orderBy("lang", "bucket")
    )


# --- X44: C4-style line-level filtering with document reassembly ------------
# The line-rule layer every C4/RefinedWeb-descended pipeline runs
# BEFORE document-level quality gates: split each document into lines,
# apply per-line keep rules, drop within-document repeated lines, and
# reassemble the survivors in order. Lines here are the fixture's
# 8-word windows (it has no newlines — x27's chunking idiom); the
# rules are content-grounded, not planted: (1) a line must have >= 5
# words (real: each doc's last window is usually short), (2) a line
# containing the blocklisted token 'value' is dropped (the C4
# bad-words rule shape), (3) within a doc, only a line's first
# occurrence survives (RefinedWeb line dedup — PER-DOC state, so it
# composes with x27's global chunk dedup rather than duplicating it).
# Scale shape: one corpus-linear explode; every rule is a map-side
# array expression; the dedup window partitions on (doc_id, line
# digest) — high-cardinality, no skew; reassembly is x27's
# sorted-collect per doc. Only changed documents are emitted.
# The fixture's 8-word windows never repeat within a doc, so rule (3)
# would be vacuous on raw text — every doc_id % 7 == 0 doc gets its
# first 8 words PREPENDED (declared identically on both sides, the
# planted-dup pattern of x1/x2/x39): prepending keeps the copy
# 8-aligned, so line 0 and line 1 are identical for EVERY planted doc
# (all fixture docs carry >= 10 words). The old APPENDED copy only
# formed a duplicate line when the doc's word count happened to be a
# multiple of 8 — ~7/8 of the plant was silently vacuous (review-pass
# r17, reproduced: 9/72 planted docs exercised occ>1 at sf0.001) and
# a fixture regen could zero it with the gate still green. A
# plant-coverage assert now backstops it.

_X44_ORACLE = """
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')
                   || ' ' || text
              ELSE text END AS text
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM corpus
),
lines AS (
  SELECT doc_id, i,
         list_slice(t, i*8 + 1, i*8 + 8) AS lw
  FROM toks,
       LATERAL (SELECT unnest(generate_series(
                  0, CAST(floor((len(t) - 1) / 8.0) AS INT))) AS i)
),
ruled AS (
  SELECT doc_id, i,
         array_to_string(lw, ' ') AS line,
         CASE WHEN len(lw) < 5 THEN 1 ELSE 0 END AS short_f,
         CASE WHEN list_contains(lw, 'value') THEN 1 ELSE 0 END AS blocked_f,
         row_number() OVER (PARTITION BY doc_id, md5(array_to_string(lw, ' '))
                            ORDER BY i) AS occ
  FROM lines
),
flagged AS (
  SELECT *,
         CASE WHEN short_f = 0 AND blocked_f = 0 AND occ = 1
              THEN 1 ELSE 0 END AS keep_f
  FROM ruled
),
rebuilt AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(keep_f) AS BIGINT) AS n_kept,
         CAST(sum(short_f) AS BIGINT) AS n_short,
         CAST(sum(blocked_f) AS BIGINT) AS n_blocked,
         CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         md5(coalesce(string_agg(line, ' ' ORDER BY i)
                        FILTER (WHERE keep_f = 1), '')) AS kept_digest
  FROM flagged GROUP BY doc_id
)
SELECT * FROM rebuilt WHERE n_kept < n_lines ORDER BY doc_id
"""


def _line_filter_stats(toks: DataFrame) -> DataFrame:
    """(doc_id, n_lines, n_kept, n_short, n_blocked, n_dup,
    kept_digest) — x44's per-doc line-rule kernel over a (doc_id,
    t token-array) frame, FULLY MAP-SIDE (r20, VERDICT r19 #7 / guide
    §2.4): every rule is per-document, so the old plan's two
    text-bearing shuffles — the occ row_number window on (doc_id,
    md5(line)) and the reassembly groupBy(doc_id) carrying line text —
    are both array HOFs over the doc's own line array.  Occ is
    first-occurrence within the doc: array_position(lines, line) ==
    i+1 is exactly "this index is the line's first occurrence" (string
    equality — strictly stronger than the old md5(line) partition
    key), and the kept digest joins the kept lines in NATIVE array
    order, which IS the old ORDER BY i (the collect_list + array_sort
    dance existed only because groupBy loses order).  Factored out of
    x44 so the equivalence test exercises THE production pipeline
    (review-pass r20).

    Scale note: array_position makes the dedup O(lines²) string
    compares WITHIN one document's row — fine for web-document line
    counts (hundreds; ~1e4–1e6 compares/doc), and upstream chunking
    (x9/x27) bounds document length; a corpus of pathological
    multi-100k-line documents should fall back to the r19 window
    spelling, which distributes occ across (doc, line-digest)
    partitions at the price of two corpus-linear text shuffles."""
    lws = F.transform(
        F.sequence(F.lit(0), F.floor((F.size("t") - 1) / 8.0).cast("int")),
        lambda i: F.slice(F.col("t"), i * 8 + 1, 8),
    )
    line_stats = F.transform(
        lws,
        lambda lw: F.struct(
            F.array_join(lw, " ").alias("line"),
            (F.size(lw) < 5).cast("long").alias("short_f"),
            F.array_contains(lw, "value").cast("long").alias("blocked_f"),
        ),
    )
    staged = toks.select("doc_id", line_stats.alias("st")).select(
        "doc_id",
        "st",
        F.transform("st", lambda s: s["line"]).alias("ls"),
    )
    is_dup = lambda s, i: F.array_position(  # noqa: E731
        F.col("ls"), s["line"]
    ) != (i + 1).cast("bigint")
    kept = F.filter(
        "st",
        lambda s, i: (s["short_f"] == 0)
        & (s["blocked_f"] == 0)
        & ~is_dup(s, i),
    )
    return staged.select(
        "doc_id",
        F.size("st").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.size(F.filter("st", lambda s: s["short_f"] == 1))
        .cast("long")
        .alias("n_short"),
        F.size(F.filter("st", lambda s: s["blocked_f"] == 1))
        .cast("long")
        .alias("n_blocked"),
        F.size(F.filter("st", is_dup)).cast("long").alias("n_dup"),
        F.md5(
            F.array_join(F.transform(kept, lambda s: s["line"]), " ")
        ).alias("kept_digest"),
    )


@register("x44_line_filtering", oracle=_X44_ORACLE, tags=("X44", "X4", "X27"))
def x44_line_filtering(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.array_join(F.slice(F.split("text", " "), 1, 8), " "),
                F.lit(" "),
                "text",
            ),
        ).otherwise(F.col("text")),
    )
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    rebuilt = _line_filter_stats(
        toks
    ).cache()  # feeds the plant-coverage check + the returned filter;
    # per-doc rows only — pin cleared by the harness clearCache
    # plant-coverage backstop (review-pass r17, the x12b/x24 guard
    # class): EVERY planted doc must exhibit a within-doc duplicate
    # line — prepending an 8-word copy guarantees it for docs with
    # >= 8 words, which the fixtures all have. A regenerated fixture
    # that breaks the plant now raises instead of silently turning
    # rule (3) vacuous under a green gate.  ONE aggregate action (r20:
    # previously two separate .count() jobs).
    planted = rebuilt.filter(F.col("doc_id") % 7 == 0).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_dup") >= 1).cast("long")).alias("n_dup_docs"),
    ).first()
    n_planted, n_planted_dup = planted["n"], planted["n_dup_docs"] or 0
    if n_planted == 0 or n_planted_dup < n_planted:
        raise AssertionError(
            f"x44 line-dedup plant went vacuous: {n_planted_dup}/"
            f"{n_planted} planted docs show a duplicate line"
        )
    return rebuilt.filter(F.col("n_kept") < F.col("n_lines")).orderBy(
        "doc_id"
    )


# --- X45: inverted-index build (token -> posting list) ----------------------
# The retrieval-side complement of the pipeline: build the
# token -> sorted-document posting map that powers BM25 (x4h) and
# exact-match decontamination lookups. The posting LIST is the
# output, so the shuffle carries (token, doc_id) pairs — that is the
# operator's irreducible cost; document frequency rides along free.
# Posting lists are emitted content-addressed (md5 of the sorted
# comma-joined ids) plus a 3-doc preview, so the result row stays
# O(1) wide while the oracle still proves the ENTIRE list, order
# included. 100 TB posture: stopword tokens produce monster postings —
# the real index shards postings by doc-id range (doc-partitioned
# secondary sort, one file per (token, shard)) and stores df
# separately; a df-threshold stoplist cut is the standard first knife.
# Both mitigations are notes here because the fixture vocabulary is
# tiny; the plan shape (explode -> distinct -> groupBy token) is the
# one that scales.

_X45_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT t.word, doc_id
  FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(word)
  WHERE t.word <> ''
)
SELECT word,
       CAST(count(*) AS BIGINT) AS df,
       md5(array_to_string(list_sort(list(doc_id)), ',')) AS posting_digest,
       array_to_string(list_slice(list_sort(list(doc_id)), 1, 3), ',')
         AS head_docs
FROM pairs
GROUP BY word
ORDER BY word
"""


@register("x45_inverted_index", oracle=_X45_ORACLE, tags=("X45", "X4"))
def x45_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    posting = F.array_sort(F.collect_list("doc_id"))
    return (
        pairs.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.md5(
                F.array_join(posting.cast("array<string>"), ",")
            ).alias("posting_digest"),
            F.array_join(
                F.slice(posting, 1, 3).cast("array<string>"), ","
            ).alias("head_docs"),
        )
        .orderBy("word")
    )


# --- X46: distributed BPE merge induction -----------------------------------
# Byte-pair-encoding vocabulary induction (Sennrich et al., public —
# the tokenizer-training step of every LLM data stack), run IN the
# engine: N iterations of (count adjacent symbol pairs across the
# corpus) -> (pick the most frequent pair, deterministic tie-break)
# -> (apply the merge corpus-wide). The corpus state is one string
# column of [sym][sym]... wrapped symbols ([ and ] are absent from
# the fixture charset — asserted), so a merge application is ONE
# map-side replace('[a][b]' -> '[ab]') with identical left-to-right
# non-overlapping semantics in Spark and DuckDB — which is exactly
# BPE's greedy scan. Like x35's PageRank, the FIXED iteration count
# makes the whole algorithm one lazy declarative plan (each argmax is
# a broadcast 1-row frame) and lets DuckDB replay it as unrolled CTE
# steps — the repo's second value-oracled iterative algorithm.
# Scale shape per iteration: corpus-linear pair explode, (pair ->
# count) int shuffle with map-side combine, 1-row argmax broadcast,
# map-side replace. Nothing ever collects; the merge table is N rows.
# At real scale you run this on a hash-sampled slice (x13) — the
# merge ranking is what matters, and counts concentrate fast.

_X46_MERGES = 4


def _x46_oracle() -> str:
    steps = []
    prev = "state0"
    selects = []
    for i in range(1, _X46_MERGES + 1):
        steps.append(f"""
arr{i} AS (
  SELECT doc_id,
         string_split(substr(s, 2, len(s) - 2), '][') AS a
  FROM {prev}
),
pairs{i} AS (
  SELECT a[i] AS sa, a[i + 1] AS sb
  FROM arr{i},
       LATERAL (SELECT unnest(generate_series(1, len(a) - 1)) AS i) t
),
best{i} AS (
  SELECT sa, sb, CAST(count(*) AS BIGINT) AS c
  FROM pairs{i} GROUP BY sa, sb
  ORDER BY c DESC, sa, sb LIMIT 1
),
state{i} AS (
  SELECT doc_id,
         replace(s, '[' || sa || '][' || sb || ']', '[' || sa || sb || ']')
           AS s
  FROM {prev} CROSS JOIN best{i}
)""")
        selects.append(
            f"SELECT {i} AS step, sa, sb, c FROM best{i}"
        )
        prev = f"state{i}"
    return (
        """
WITH state0 AS (
  SELECT doc_id,
         '[' || array_to_string(string_split(text, ' '), '][') || ']' AS s
  FROM documents
),"""
        + ",".join(steps)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY step"
    )


_X46_ORACLE = _x46_oracle()


@register("x46_bpe_merges", oracle=_X46_ORACLE, tags=("X46", "X4", "X22"))
def x46_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # sentinel-safety assert: symbols must never contain the wrappers
    n_bad = d.filter(
        F.col("text").contains("[") | F.col("text").contains("]")
    ).limit(1).count()
    if n_bad:
        raise AssertionError("x46: corpus contains the [ ] sentinels")
    state = d.select(
        "doc_id",
        F.concat(
            F.lit("["),
            F.array_join(F.split("text", " "), "]["),
            F.lit("]"),
        ).alias("s"),
    )
    merge_rows = None
    for i in range(1, _X46_MERGES + 1):
        # materialize the token array BEFORE the per-element lambdas
        # reference it (the quantizer's O(d²) lesson): a split()
        # embedded in transform() re-evaluates the whole split per
        # element access — measured 28 s before / 4.8 s after at
        # sf0.1 for this query
        arred = state.withColumn(
            "__arr",
            F.split(F.expr("substr(s, 2, length(s) - 2)"), r"\]\["),
        )
        arr = F.col("__arr")
        # greatest(..., 1): a doc merged down to ONE symbol has no
        # pairs — but Spark's sequence(1, 0) is the DESCENDING [1, 0]
        # and element_at(arr, 0) raises; clamp to [1,1] and let the
        # sb IS NULL filter below drop the lone padded pair (DuckDB's
        # generate_series(1, 0) is simply empty — same net rows)
        pairs = arred.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(arr) - 1, F.lit(1))
                    ),
                    lambda j: F.struct(
                        F.try_element_at(arr, j.cast("int")).alias("sa"),
                        F.try_element_at(arr, (j + 1).cast("int")).alias(
                            "sb"
                        ),
                    ),
                )
            ).alias("p")
        ).select("p.sa", "p.sb").filter(F.col("sb").isNotNull())
        best = (
            pairs.groupBy("sa", "sb")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "sa", "sb")
            .limit(1)
            # localCheckpoint the 1-row argmax (r19): it has TWO
            # consumers — the merge-table row and the next state's
            # broadcast — and TakeOrderedAndProject offers no exchange
            # for reuse, so each consumer re-ran the full corpus pairs
            # explode + aggregate; the checkpoint runs it once per
            # iteration
            .localCheckpoint()
        )
        row = best.select(
            F.lit(i).alias("step"), "sa", "sb", "c"
        )
        merge_rows = row if merge_rows is None else merge_rows.unionByName(row)
        state = state.crossJoin(F.broadcast(best)).select(
            "doc_id",
            F.replace(
                F.col("s"),
                F.concat(F.lit("["), "sa", F.lit("]["), "sb", F.lit("]")),
                F.concat(F.lit("["), "sa", F.col("sb"), F.lit("]")),
            ).alias("s"),
        )
        # cache each iteration's state: the merge-table union references
        # best1..bestN whose subtrees would otherwise each re-derive
        # every earlier state — O(N²) corpus passes in one action. At
        # real scale this is a per-iteration checkpoint (x35's
        # lineage note applies verbatim). Pins cleared by the harness
        # (bench.py / driver_sim clearCache).
        state = state.cache()
    return merge_rows.orderBy("step")


# --- X48: corpus drift report between crawl snapshots -----------------------
# The ops question every continuously-crawled corpus needs answered
# before retraining: did the NEW crawl's composition drift from the
# old one, and along which dimension? Two snapshots (here the
# deterministic doc_id parity halves — any two corpus versions slot
# in) are compared per dimension (lang, source, and length decile
# proxy) as share distributions, scored with the chi-square-style
# divergence on integer ppm shares:
#
#   share_ppm = count * 1e6 div total          (bigint, exact)
#   cell      = (a_ppm - b_ppm)^2 div (a_ppm + b_ppm + 1)
#   drift     = sum over cells                 (x2 the classic chi2)
#
# — every step bigint, so the drift score is engine-exact (the
# PSI/KL spellings need ln; the chi-square form is the standard
# float-free alternative and ranks dimensions identically for small
# drifts). Scale shape: one corpus scan per snapshot feeding
# |dimension|-row aggregates; the comparison frames never exceed the
# category counts. Output: per (dimension, category) the two shares
# and the cell contribution, plus per-dimension totals via ROLLUP —
# the report a data-ops dashboard renders directly.
# Fixture note: source is a pure function of doc_id (src{id % 20}),
# so the parity halves have DISJOINT source sets and the report
# correctly scores source at the ~2e6 ppm maximum while lang drifts
# only by sampling noise — the detector demonstrably separates a
# real composition break from jitter.

_X48_ORACLE = """
WITH tagged AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS snap,
         lang, source,
         CAST(least(n_chars // 100, 9) AS VARCHAR) AS len_bucket
  FROM documents
),
long_t AS (
  SELECT snap, 'lang' AS dim, lang AS category FROM tagged
  UNION ALL SELECT snap, 'source', source FROM tagged
  UNION ALL SELECT snap, 'len_bucket', len_bucket FROM tagged
),
counts AS (
  SELECT dim, category,
         count(*) FILTER (WHERE snap = 'a') AS ca,
         count(*) FILTER (WHERE snap = 'b') AS cb
  FROM long_t GROUP BY dim, category
),
tot AS (
  SELECT dim, sum(ca) AS ta, sum(cb) AS tb FROM counts GROUP BY dim
),
shares AS (
  SELECT c.dim, c.category,
         ca * 1000000 // ta AS a_ppm,
         cb * 1000000 // tb AS b_ppm
  FROM counts c JOIN tot USING (dim)
),
cells AS (
  SELECT dim, category, a_ppm, b_ppm,
         (a_ppm - b_ppm) * (a_ppm - b_ppm) // (a_ppm + b_ppm + 1)
           AS drift_cell
  FROM shares
)
SELECT dim,
       coalesce(category, '__TOTAL__') AS category,
       CAST(sum(a_ppm) AS BIGINT) AS a_ppm,
       CAST(sum(b_ppm) AS BIGINT) AS b_ppm,
       CAST(sum(drift_cell) AS BIGINT) AS drift
FROM cells
GROUP BY ROLLUP (dim, category)
HAVING dim IS NOT NULL
ORDER BY dim, category
"""


@register("x48_corpus_drift", oracle=_X48_ORACLE, tags=("X48", "X25", "A7"))
def x48_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tagged = d.select(
        F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b").alias("snap"),
        "lang",
        "source",
        F.least(F.expr("n_chars div 100"), F.lit(9))
        .cast("string")
        .alias("len_bucket"),
    )
    long_t = (
        tagged.select("snap", F.lit("lang").alias("dim"), F.col("lang").alias("category"))
        .unionByName(
            tagged.select(
                "snap", F.lit("source").alias("dim"),
                F.col("source").alias("category"),
            )
        )
        .unionByName(
            tagged.select(
                "snap", F.lit("len_bucket").alias("dim"),
                F.col("len_bucket").alias("category"),
            )
        )
    )
    counts = long_t.groupBy("dim", "category").agg(
        F.sum((F.col("snap") == "a").cast("long")).alias("ca"),
        F.sum((F.col("snap") == "b").cast("long")).alias("cb"),
    )
    tot = counts.groupBy("dim").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    cells = (
        counts.join(F.broadcast(tot), "dim")
        .select(
            "dim",
            "category",
            F.expr("ca * 1000000L div ta").alias("a_ppm"),
            F.expr("cb * 1000000L div tb").alias("b_ppm"),
        )
        .withColumn(
            "drift_cell",
            F.expr(
                "(a_ppm - b_ppm) * (a_ppm - b_ppm) div (a_ppm + b_ppm + 1)"
            ),
        )
    )
    return (
        cells.rollup("dim", "category")
        .agg(
            F.sum("a_ppm").alias("a_ppm"),
            F.sum("b_ppm").alias("b_ppm"),
            F.sum("drift_cell").alias("drift"),
        )
        .filter(F.col("dim").isNotNull())
        .select(
            "dim",
            F.coalesce("category", F.lit("__TOTAL__")).alias("category"),
            "a_ppm",
            "b_ppm",
            "drift",
        )
        .orderBy("dim", "category")
    )


# --- X50: GPT-style sequence packing (concat-and-chunk) ----------------------
# The last mile of every pretraining data pipeline: documents are
# concatenated in a deterministic order and sliced into fixed
# context windows of C tokens; the packing report (how many windows,
# how many docs straddle a boundary, fill per language) drives the
# choice of C and of boundary handling (mask vs split vs drop).
# Complements x14: x14 packs WITHIN md5 shards (each shard fills
# independently — reshuffle-stable, embarrassingly parallel, the
# right default); x50 packs ONE GLOBAL stream (the shape a prescribed
# sample order — curriculum schedules, x26's shuffled order — forces)
# and reports the boundary-crossing stats shard-local packing has no
# notion of.
# Spelled on the distributed prefix sum (the x23 machinery): each
# doc's global token OFFSET is chunk-local cumsum + a driver-side
# exclusive prefix over the bounded per-chunk totals — NO
# unpartitioned window anywhere (plan-guard-asserted in-query); at
# 100 TB the offsets job is one shuffle on (chunk) plus a
# |chunks|-row collect. Window arithmetic is pure bigint div, so
# DuckDB replays it exactly from one ordered cumsum.

_X50_CTX = 512

_X50_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS ntok FROM documents
),
c AS (
  SELECT doc_id, lang, ntok,
         COALESCE(SUM(ntok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM d
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN (off + ntok - 1) // {_X50_CTX} <> off // {_X50_CTX}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
       CAST(sum((off + ntok - 1) // {_X50_CTX} - off // {_X50_CTX} + 1)
            AS BIGINT) AS windows_touched
FROM c GROUP BY lang ORDER BY lang
"""


@register("x50_sequence_packing", oracle=_X50_ORACLE, tags=("X6", "X4"))
def x50_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language packing report for concat-and-chunk at C=512:
    every doc's global token offset in doc_id order, then bigint-div
    window ids. Offsets come from the chunked two-pass prefix sum —
    chunk-local window cumsum (partitioned by a doc_id-range chunk)
    plus driver-prefixed per-chunk totals broadcast back — so no task
    ever sees more than ~1/n_chunks of the corpus and the plan carries
    no unpartitioned window (guard-asserted below)."""
    n_chunks = 8
    # localCheckpoint, not .cache() (ADVICE r11): the narrow
    # (doc_id, lang, ntok) frame — text never survives the select —
    # feeds the approxQuantile scan, the per-chunk totals job, AND the
    # final offsets aggregate; unmaterialized, the tokenizing split
    # would run three times. A .cache() here pinned executor memory
    # for the rest of the 296-query driver session (CacheManager never
    # auto-drops); checkpoint blocks are GC-cleaned with the RDD
    # reference, and the packing window ABOVE the checkpoint stays
    # visible to the in-query plan guard.
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("ntok")
    ).localCheckpoint()
    from ..operators.skew import chunked_exclusive_prefix

    packed = (
        chunked_exclusive_prefix(
            d, "doc_id", "ntok", n_chunks=n_chunks, out_col="off"
        )
        .withColumn("first_w", F.expr(f"off div {_X50_CTX}"))
        .withColumn(
            "last_w", F.expr(f"(off + ntok - 1) div {_X50_CTX}")
        )
    )
    from ..plans.explain import assert_no_unpartitioned_window

    out = (
        packed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
            F.sum(
                (F.col("last_w") != F.col("first_w")).cast("long")
            ).alias("n_boundary_docs"),
            F.sum(F.col("last_w") - F.col("first_w") + 1).alias(
                "windows_touched"
            ),
        )
        .orderBy("lang")
    )
    assert_no_unpartitioned_window(out, "x50", require_window=True)
    return out
