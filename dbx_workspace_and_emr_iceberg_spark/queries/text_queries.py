"""X4: text-analysis queries over `documents` (SURVEY.md §2.12) —
token counting, quality scoring, language-ID heuristic, fingerprinting.

All JVM-side string/array expressions (split/regexp/higher-order) —
single-scan, shuffle-free plans that keep their shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

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
    n = F.greatest(F.size(words) - 2, F.lit(1))
    d = d.withColumn(
        "__shingles",
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words, i.cast("int")),
                F.coalesce(F.element_at(words, (i + 1).cast("int")), F.lit("")),
                F.coalesce(F.element_at(words, (i + 2).cast("int")), F.lit("")),
            ),
        ),
    )
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
