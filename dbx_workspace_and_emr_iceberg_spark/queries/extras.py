"""Second-wave coverage: exact percentiles (A5), INTERSECT/EXCEPT ALL
(U2/U3), date parse/format (F2), TF-IDF (X4), salted skew join (X6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..registry import register
from ..tables import load_table

# --- A5b: exact percentiles / median ----------------------------------------

_A5B_ORACLE = """
SELECT
  o_orderpriority,
  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
  round(median(o_totalprice), 4)              AS p50,
  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
  round(quantile_disc(o_totalprice, 0.5), 4)  AS p50_disc
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("a5b_percentiles_exact", oracle=_A5B_ORACLE, tags=("A5",))
def a5b_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear
    interpolation on doubles; discrete p50 via sort-based percentile).

    SCALE CAVEAT (review-pass r16): exact percentiles are inherently
    O(group cardinality) aggregation state — F.percentile/F.median
    buffer the group's values, and the INT_MAX-accuracy
    percentile_approx (needed for an exact discrete p50 the oracle can
    replay) retains its full sample. This query is the EXACTNESS
    witness for the A5 row; at 100 TB use the mergeable-sketch pattern
    (a5c) or percentile_approx at a realistic accuracy, where state is
    O(accuracy) per group."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.median("o_totalprice"), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
            F.round(
                F.expr("percentile_approx(o_totalprice, 0.5, 2147483647)"), 4
            ).alias("p50_disc"),
        )
        .orderBy("o_orderpriority")
    )


# --- U2b/U3b: INTERSECT ALL / EXCEPT ALL (multiset semantics) ---------------

_U2B_ORACLE = """
SELECT cast(k AS BIGINT) AS k FROM (
  SELECT l_suppkey % 100003 AS k FROM lineitem WHERE l_linenumber = 1
  INTERSECT ALL
  SELECT l_suppkey % 100003 AS k FROM lineitem WHERE l_linenumber = 2
)
"""


@register("u2b_intersect_all", oracle=_U2B_ORACLE, tags=("U2",))
def u2b_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # % 100003, not a single-digit modulus (review-pass r16): Catalyst
    # rewrites INTERSECT/EXCEPT ALL as groupBy(k) + a ReplicateRows
    # generate, so the output stage has one task per DISTINCT key — a
    # 7-value key funnels the whole multiset through <= 7 tasks at
    # 100 TB; a high-cardinality key exercises identical semantics
    # with healthy fan-out
    a = li.filter(F.col("l_linenumber") == 1).select(
        (F.col("l_suppkey") % 100003).cast("bigint").alias("k")
    )
    b = li.filter(F.col("l_linenumber") == 2).select(
        (F.col("l_suppkey") % 100003).cast("bigint").alias("k")
    )
    return a.intersectAll(b)


_U3B_ORACLE = """
SELECT cast(k AS BIGINT) AS k FROM (
  SELECT l_suppkey % 100003 AS k FROM lineitem WHERE l_linenumber = 1
  EXCEPT ALL
  SELECT l_suppkey % 100003 AS k FROM lineitem WHERE l_linenumber = 2
)
"""


@register("u3b_except_all", oracle=_U3B_ORACLE, tags=("U3",))
def u3b_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # high-cardinality key for the ReplicateRows fan-out — see u2b
    a = li.filter(F.col("l_linenumber") == 1).select(
        (F.col("l_suppkey") % 100003).cast("bigint").alias("k")
    )
    b = li.filter(F.col("l_linenumber") == 2).select(
        (F.col("l_suppkey") % 100003).cast("bigint").alias("k")
    )
    return a.exceptAll(b)


# --- F2b: date construction / parsing / formatting --------------------------

_F2B_ORACLE = """
SELECT
  o_orderkey,
  strftime(o_orderdate, '%Y/%m/%d %H:%M')                        AS formatted,
  make_date(cast(year(o_orderdate) AS INTEGER),
            cast(month(o_orderdate) AS INTEGER),
            cast(day(o_orderdate) AS INTEGER))                   AS reconstructed,
  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M'),
           '%Y-%m-%d %H:%M')                                     AS reparsed
FROM orders
WHERE o_orderkey % 37 = 0
ORDER BY o_orderkey
"""


@register("f2b_date_parse_format", oracle=_F2B_ORACLE, tags=("F2",))
def f2b_date_parse_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.filter(F.col("o_orderkey") % 37 == 0)
        .select(
            "o_orderkey",
            F.date_format(d, "yyyy/MM/dd HH:mm").alias("formatted"),
            F.make_date(F.year(d), F.month(d), F.dayofmonth(d)).alias("reconstructed"),
            # to_timestamp returns ZONED timestamp; NTZ keeps collect()
            # immune to the driver's local zone (r14 host-TZ sweep)
            F.to_timestamp(
                F.date_format(d, "yyyy-MM-dd HH:mm"), "yyyy-MM-dd HH:mm"
            ).cast("timestamp_ntz").alias("reparsed"),
        )
        .orderBy("o_orderkey")
    )


# --- X4f: TF-IDF (pure DataFrame ops; SQL twin in DuckDB) -------------------

_X4F_ORACLE = """
WITH words AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents
),
tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf_counts AS (
  SELECT doc_id, w, count(*) AS tf FROM tf GROUP BY doc_id, w
),
df AS (
  SELECT w, count(*) AS df FROM words GROUP BY w
),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.w,
         round(t.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf_counts t JOIN df ON t.w = df.w CROSS JOIN n
),
ranked AS (
  SELECT doc_id, w, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, w) AS rn
  FROM scored
)
SELECT doc_id, w AS top_term, tfidf AS top_tfidf
FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


@register("x4f_tfidf", oracle=_X4F_ORACLE, tags=("X4",))
def x4f_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF, top term per doc. Two shuffles (doc-term counts,
    document frequencies) + a shuffle join on the term — the DF table
    is VOCABULARY-sized (one row per distinct corpus token), so it must
    never broadcast (review-pass r16: the old hint collected the whole
    vocabulary to the driver at scale, the exact hazard x4h documents);
    nothing here collects to the driver.

    ACCEPTED-FLOAT hazard, documented (review-pass r17, x22's class):
    the ranked tfidf is log-derived — JVM Math.log and DuckDB's libm
    each carry ≤1 ulp independently, and the rank keys on the rounded
    value, so a score within ~1e-12 of a 0.5e-6 grid point could flip
    a cell or swap rn=1 cross-engine. No integer respell exists for
    ln; the 6-decimal grid plus deterministic (tfidf, w) tie-break
    keep the flip probability negligible."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    terms = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = terms.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.distinct().groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "w").select(
        "doc_id",
        "w",
        F.round(
            F.col("tf") * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("w"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("w").alias("top_term"), F.col("tfidf").alias("top_tfidf"))
        .orderBy("doc_id")
    )


# --- X6: salted skew join (oracle: the unsalted join) ------------------------

_X6_ORACLE = """
SELECT n_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


@register("x6_salted_skew_join", oracle=_X6_ORACLE, tags=("X6", "J1"))
def x6_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting must not change join semantics: the salted plan's result
    hash-matches the plain SQL join. (The *reason* to salt — a hot key
    funneling to one reducer — only shows at scale; semantics are what
    the oracle can check.)"""
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "n_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    joined = salted_join(c, n, on="n_nationkey", n_salts=8)
    return (
        joined.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name")
    )


# --- J10: bucketed co-located join (shuffle-free large-large equi) ----------

_J10_ORACLE = """
SELECT o.o_orderkey, cast(count(l.l_linenumber) AS BIGINT) AS n_lines,
       round(sum(l.l_extendedprice), 2) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_totalprice > 450000
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
"""


@register("j10_bucketed_join", oracle=_J10_ORACLE, tags=("J6", "X6"))
def j10_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-bucketed co-located join: both tables bucketed 8 ways on the
    join key via bucketBy+saveAsTable, so the join needs NO exchange on
    either side (verified in-plan). This is the standing answer to
    repeated large-large joins at 100 TB: pay the shuffle once at write
    time, never again at read time.

    The bucketed tables live under a process-lifetime root and stay
    registered (uuid-suffixed names), so the returned frame is a LAZY
    scan over them — dropping them in a finally would force a driver
    collect to materialize the result first.
    """
    import uuid

    from ..plans.explain import simple_plan
    from ..util import process_tmp_root

    # process-exit-bounded root (review-pass r16): a bare mkdtemp had
    # NO cleanup hook, permanently leaking full bucketed copies of the
    # two largest tables per process run
    tmp = process_tmp_root("buckets_")
    suffix = uuid.uuid4().hex[:8]
    o_name, l_name = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{tmp}/{o_name}")
        .saveAsTable(o_name)
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{tmp}/{l_name}")
        .saveAsTable(l_name)
    )
    ob = spark.table(o_name).filter(F.col("o_totalprice") > 450000)
    lb = spark.table(l_name)
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
    # Disable broadcast while asserting: a broadcast join would also
    # show zero shuffle exchanges and make the check vacuous — the
    # claim is specifically a co-located SortMergeJoin. Restored before
    # returning; the returned plan may legally broadcast at execution,
    # the co-location claim is already proven on the -1 plan.
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = simple_plan(joined)
        shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        if shuffles != 0 or "SortMergeJoin" not in plan:
            raise AssertionError(
                f"bucketed join not co-located ({shuffles} exchanges):\n"
                f"{plan[:800]}"
            )
        return (
            joined.groupBy("o_orderkey")
            .agg(
                F.count("l_linenumber").alias("n_lines"),
                F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            )
            .orderBy("o_orderkey")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)


# --- A7c: PIVOT (wide aggregation) ------------------------------------------
# Oracle uses FILTER columns (portable) rather than DuckDB's PIVOT syntax
# so the column names match Spark's pivot output exactly.

_A7C_ORACLE = """
SELECT
  user_id % 10                                             AS cohort,
  count(*) FILTER (WHERE event_type = 'click')             AS click,
  count(*) FILTER (WHERE event_type = 'error')             AS error,
  count(*) FILTER (WHERE event_type = 'purchase')          AS purchase,
  count(*) FILTER (WHERE event_type = 'signup')            AS signup,
  count(*) FILTER (WHERE event_type = 'view')              AS view
FROM events
GROUP BY 1
ORDER BY 1
"""


@register("a7c_pivot", oracle=_A7C_ORACLE, tags=("A7",))
def a7c_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit pivot values — the explicit list
    keeps the plan single-pass (no extra distinct scan to discover
    values), which is the scale discipline for pivots."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
        .orderBy("cohort")
    )


# --- U5: UNPIVOT / stack (wide → long) --------------------------------------

_U5_ORACLE = """
SELECT p_partkey, metric, val FROM (
  SELECT p_partkey, 'size' AS metric, cast(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT p_partkey, 'retail' AS metric, round(p_retailprice, 2) AS val FROM part
)
WHERE p_partkey % 31 = 0
ORDER BY p_partkey, metric
"""


@register("u5_unpivot_stack", oracle=_U5_ORACLE, tags=("U1", "A7"))
def u5_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 31 == 0)
    return (
        p.selectExpr(
            "p_partkey",
            "stack(2, 'size', cast(p_size AS DOUBLE), "
            "'retail', round(p_retailprice, 2)) AS (metric, val)",
        )
        .orderBy("p_partkey", "metric")
    )


# --- F4e: explode_outer null/empty semantics --------------------------------

_F4E_ORACLE = """
WITH src AS (
  SELECT vec_id,
         CASE WHEN vec_id % 3 = 0 THEN []::DOUBLE[]
              WHEN vec_id % 3 = 1 THEN NULL
              ELSE [cast(vec_id AS DOUBLE), cast(vec_id + 0.5 AS DOUBLE)] END AS arr
  FROM embeddings WHERE vec_id % 10 = 0
)
SELECT s.vec_id, u.v AS val
FROM src s LEFT JOIN (SELECT vec_id, unnest(arr) AS v FROM src) u
  ON s.vec_id = u.vec_id
ORDER BY s.vec_id, val
"""


@register("f4e_explode_outer", oracle=_F4E_ORACLE, tags=("F4",))
def f4e_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer keeps rows whose array is NULL or empty (emitting a
    NULL element) — the LEFT-JOIN-unnest equivalence is the oracle."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    src = e.select(
        "vec_id",
        F.when(F.col("vec_id") % 3 == 0, F.array().cast("array<double>"))
        .when(F.col("vec_id") % 3 == 1, F.lit(None).cast("array<double>"))
        .otherwise(
            F.array(
                F.col("vec_id").cast("double"), F.col("vec_id").cast("double") + 0.5
            )
        )
        .alias("arr"),
    )
    return src.select(
        "vec_id", F.explode_outer("arr").alias("val")
    ).orderBy("vec_id", "val")


# --- S11: range source (synthetic numeric relation) -------------------------

_S11_ORACLE = """
SELECT cast(range AS BIGINT) AS id, cast(range * range AS BIGINT) AS sq
FROM range(1000)
WHERE range % 7 = 0
ORDER BY id
"""


@register("s11_range_source", oracle=_S11_ORACLE, tags=("S2",))
def s11_range_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.range — the parallel synthetic source (useful for
    generators/backfills; partitions scale with the cluster)."""
    return (
        spark.range(0, 1000)
        .filter(F.col("id") % 7 == 0)
        .select("id", (F.col("id") * F.col("id")).alias("sq"))
        .orderBy("id")
    )


# --- P5b: ANSI-safe try_* functions -----------------------------------------
# PySpark 4.1 runs ANSI mode ON: bare division-by-zero / bad casts / OOB
# element_at RAISE. try_divide / try_cast / try_element_at are the
# idiomatic null-safe forms — this is the escape hatch every ANSI-mode
# pipeline needs, so it gets first-class coverage.

_P5B_ORACLE = """
SELECT
  event_id,
  round(value / nullif(user_id % 5, 0), 4)                    AS safe_ratio,
  TRY_CAST(CASE WHEN user_id % 3 = 0 THEN 'n/a'
                ELSE json_extract_string(props, '$.k') END AS INTEGER) AS maybe_k,
  string_split(event_type, '')[5]                             AS char5
FROM events
WHERE event_id % 17 = 0
ORDER BY event_id
"""


@register("p5b_try_functions", oracle=_P5B_ORACLE, tags=("P5", "F8"))
def p5b_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide → NULL on zero divisor, try_cast → NULL on bad input,
    try_element_at → NULL past the end — the DuckDB oracle models each
    with its native NULL-on-failure form (nullif-division, TRY_CAST,
    OOB list index).

    The element_at index is 5 (review-pass r17): in-bounds for four of
    the five event_type values and past-the-end for 'view' (4 chars),
    so ONE column exercises both the successful 1-based lookup and the
    NULL-past-end path — the old index 10 was out of bounds for every
    row (max length 8), leaving the in-bounds path never checked."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    return (
        ev.select(
            "event_id",
            F.round(
                F.try_divide(F.col("value"), (F.col("user_id") % 5).cast("double")),
                4,
            ).alias("safe_ratio"),
            F.when(F.col("user_id") % 3 == 0, F.lit("n/a"))
            .otherwise(F.get_json_object("props", "$.k"))
            .try_cast("int")
            .alias("maybe_k"),
            F.try_element_at(F.split("event_type", ""), F.lit(5)).alias("char5"),
        )
        .orderBy("event_id")
    )


# --- X7: seeded stratified sample (corpus subsetting) -----------------------


_X7_ORACLE = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(1 AS BIGINT) AS within_5sd,
       CAST(1 AS BIGINT) AS deterministic
FROM documents
WHERE source IN ('src0', 'src1', 'src2', 'src3')
GROUP BY source ORDER BY source
"""


@register("x7_stratified_sample", oracle=_X7_ORACLE, tags=("X6",))
def x7_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Bernoulli sampling of the document corpus with a
    fixed seed (`sampleBy` — per-partition deterministic, no shuffle).
    The training-data use case: downweight an overrepresented source
    without materializing it.

    CONTRACT value-oracled since r7 (o5 pattern — Spark's RNG stream
    can't be replayed in DuckDB, its statistical contract can): per
    stratum, n_total plus 0/1 flags for (a) identical seed → identical
    sample, (b) realized count within 5 binomial standard deviations
    (a frac-0 stratum must be exactly empty). A violated property
    flips a flag and the driver hash goes red — flags are computed
    with NO preceding raise (review-pass r17: the old raises fired
    BEFORE the flags were built, so the hashed flags were constant 1
    and the documented hash-red path was dead code; a violation
    instead aborted the whole driver sweep)."""
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
    base = docs.filter(F.col("source").isin(*fractions.keys()))
    take1 = base.sampleBy("source", fractions, seed=42)
    take2 = base.sampleBy("source", fractions, seed=42)
    # determinism check stays DISTRIBUTED (review-pass r16): collecting
    # the sampled id sets is corpus-linear on the driver whenever a
    # stratum keeps fraction 1.0 — symmetric exceptAll counts prove set
    # equality with zero driver materialization
    n_diff = (
        take1.select("doc_id").exceptAll(take2.select("doc_id")).count()
        + take2.select("doc_id").exceptAll(take1.select("doc_id")).count()
    )
    totals = {r.source: r.n for r in base.groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {
        r.source: r.n
        for r in take1.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    rows = []
    for src in sorted(fractions):
        frac = fractions[src]
        n = totals.get(src, 0)
        expect = n * frac
        sd = (n * frac * (1 - frac)) ** 0.5
        lo, hi = expect - 5 * sd, expect + 5 * sd
        actual = got.get(src, 0)
        within = int(lo <= actual <= hi and not (frac == 0.0 and actual))
        rows.append((src, int(n), within, int(n_diff == 0)))
    return spark.createDataFrame(
        rows,
        "source string, n_total long, within_5sd long, deterministic long",
    )


# --- X13: deterministic hash split (train/val/test) -------------------------

_X13_ORACLE = """
WITH labeled AS (
  SELECT doc_id, text,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         % 10000 AS b
  FROM documents
),
s AS (
  SELECT CASE WHEN b < 1000 THEN 'test'
              WHEN b < 2000 THEN 'val'
              ELSE 'train' END AS split,
         doc_id,
         len(string_split(text, ' ')) AS ntok
  FROM labeled
)
SELECT split,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(ntok) AS BIGINT) AS n_tokens
FROM s GROUP BY split ORDER BY split
"""


@register("x13_hash_split", oracle=_X13_ORACLE, tags=("X6", "X4"))
def x13_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5(doc_id)
    bucket (operators/sampling.py) — a pure function of the document
    key, so the assignment is reshuffle-, rescale-, and append-stable
    (unlike sample()/sampleBy(), which are seeded per PARTITION and
    reassign rows when the layout changes). Map-side only: no shuffle
    until the verification aggregate. The DuckDB oracle derives the
    identical split from the same md5 arithmetic — proving any engine
    can reproduce the split, which is the property that keeps held-out
    data held out across corpus versions."""
    from ..operators.sampling import hash_split

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    labeled = hash_split(d, "doc_id", val=0.1, test=0.1)
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        )
        .orderBy("split")
    )


# --- X13b: deterministic mixture re-weighting (per-stratum hash sample) -----

_X13B_ORACLE = """
WITH labeled AS (
  SELECT lang, doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         % 10000 AS b
  FROM documents
),
kept AS (
  SELECT lang, doc_id FROM labeled
  WHERE b < CASE lang WHEN 'en' THEN 2000
                      WHEN 'de' THEN 5000
                      WHEN 'fr' THEN 5000
                      WHEN 'es' THEN 5000
                      WHEN 'zh' THEN 8000
                      ELSE 0 END
)
SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM kept GROUP BY lang ORDER BY lang
"""


@register("x13b_mixture_sample", oracle=_X13B_ORACLE, tags=("X6", "X4"))
def x13b_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture re-weighting: downsample over-represented
    languages (en -> 20%) and keep more of the rare ones (zh -> 80%)
    with the deterministic per-stratum hash sampler
    (operators/sampling.py::hash_sample_by) — same reshuffle/append
    stability as x13, per stratum. This is how a 100 TB pretraining mix
    is rebalanced without a shuffle: the mixture is a map-side filter
    whose keep-decision any engine can reproduce (DuckDB oracle derives
    the identical sample)."""
    from ..operators.sampling import hash_sample_by

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = hash_sample_by(
        d,
        "doc_id",
        "lang",
        {"en": 0.2, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.8},
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("lang")
    )


# --- X4h: BM25 ranking ------------------------------------------------------

_X4H_ORACLE = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS len FROM words GROUP BY 1),
q AS (
  SELECT w FROM (
    SELECT w, count(*) AS c FROM words GROUP BY w ORDER BY c DESC, w LIMIT 3
  )
),
dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY w),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT avg(len) FROM dl) AS avglen
),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.len / stats.avglen))
         ) AS score
  FROM tf
  JOIN q USING (w)
  JOIN dfreq USING (w)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS bm25
FROM scored
ORDER BY round(score, 6) DESC, doc_id
LIMIT 10
"""


@register("x4h_bm25", oracle=_X4H_ORACLE, tags=("X4",))
def x4h_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75, Lucene idf) top-10 docs for the corpus's
    3 most frequent terms — the ranking function TF-IDF (x4f) lacks:
    term-frequency saturation and length normalization. ONE corpus
    scan feeds a cached doc-term count from which doc lengths, corpus
    stats, query terms, and document frequencies all derive; only the
    3-row (term, df) table broadcasts. Deterministic: query terms derived (not
    hard-coded), ties broken alphabetically / by doc_id on both
    engines.

    ACCEPTED-FLOAT hazard, documented (review-pass r17, x22's class):
    the score sums 3 ln-derived per-term doubles in engine-specific
    order and the top-10 cut keys on round(score, 6) — a score within
    ~1e-12 of a 0.5e-6 boundary could flip a cell or the returned row
    set cross-engine. ln has no integer respell (tf/df are integers
    but idf is transcendental); the 6-decimal grid plus the doc_id
    tie-break keep the flip probability negligible."""
    d = load_table(spark, sf_dir, "documents")
    # ONE corpus scan: the doc-term count is cached and every other
    # statistic (doc lengths, query terms, document frequencies, corpus
    # stats) derives from it — without the cache the plan re-scans the
    # corpus once per derived aggregate. Pin cleared by the harness
    # (bench.py / driver_sim clearCache).
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .cache()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("nd"), F.avg("len").alias("avglen")
    ).first()
    n_docs, avglen = stats["nd"], stats["avglen"]
    q = (
        tf.groupBy("w")
        .agg(F.sum("tf").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(3)
        .select("w")
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    # restrict DF to the 3 query terms BEFORE broadcasting — the full
    # vocabulary's DF table is corpus-sized, the query's is 3 rows
    qdf = dfreq.join(q, "w")
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (
        F.col("tf")
        * (1.2 + 1)
        / (F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("len") / F.lit(avglen)))
    )
    scored = (
        tf.join(F.broadcast(qdf), "w")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(idf * sat).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


# --- F2c: date-spine gap fill ----------------------------------------------

_F2C_ORACLE = """
WITH bounds AS (
  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events
),
spine AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT t.event_type, s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
FROM spine s
CROSS JOIN types t
LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day
ORDER BY t.event_type, s.day
"""


@register("f2c_date_spine_fill", oracle=_F2C_ORACLE, tags=("F2", "J2"))
def f2c_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap fill: a generated date spine (sequence over the
    observed min..max day) cross-joined with the dimension, left-joined
    to the daily fact counts so missing days surface as explicit zeros
    — the shape every time-series dashboard and training-data freshness
    monitor needs (a groupBy alone silently omits empty days). The
    spine is generated, never materialized from the fact table, and
    the cross join is spine × tiny dimension — both sides broadcast-
    scale even when the fact table is 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    bounds = ev.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        spine.crossJoin(types)
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


# --- A5c: mergeable HLL sketches (incremental distinct) ---------------------


_A5C_ORACLE = """
SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_day_sketches,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       CAST(1 AS BIGINT) AS daily_within_10pct,
       CAST(1 AS BIGINT) AS merged_within_10pct
FROM events
"""


@register("a5c_hll_mergeable", oracle=_A5C_ORACLE, tags=("A5", "X6"))
def a5c_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-distinct pattern for 100 TB: build one HLL
    sketch PER DAY (`hll_sketch_agg` — the sketch is a storable binary
    column), then `hll_union_agg` merges the day sketches into the
    global distinct-user estimate WITHOUT rescanning history. New data
    only ever sketches its own partition; the union is sketch-count ×
    sketch-size work. Self-verifies: the merged estimate and every
    per-day estimate must land within 10% of their exact counts
    (Datasketches HLL, lgK=12 → ~1.6% rse; 10% ≈ 6 sigma — the a5
    rule, review-pass r17: sketch error is deterministic per dataset,
    so a ~3-sigma bound risks a permanently-red fixture).

    Value-ORACLED (r11): the sketch ESTIMATE is Datasketches-internal
    (not DuckDB-replayable), so the contract is pinned as the exact
    fixture-derivable counts plus 0/1 bound flags computed with NO
    preceding raise (review-pass r17: the old raises fired before the
    flags, so the hashed flags were constant 1 and a violation aborted
    the whole driver sweep instead of hash-redding one row).
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("day")
    daily = ev.groupBy(day).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_day"),
    )
    checked = daily.select(
        "day",
        "exact_day",
        F.hll_sketch_estimate("sk").alias("est_day"),
        "sk",
    )
    # one row per day, consumed by BOTH the per-day check and the
    # merge — uncached, the full sketch-building scan ran twice
    # (review-pass r16); pin cleared by the harness
    checked.cache()
    bad = checked.filter(
        F.abs(F.col("est_day") - F.col("exact_day"))
        > 0.10 * F.col("exact_day")
    ).count()

    merged = checked.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total"),
        F.sum(F.lit(1)).alias("n_day_sketches"),
    )
    exact_total = ev.agg(F.countDistinct("user_id").alias("e")).first()["e"]
    row = merged.first()
    return spark.createDataFrame(
        [
            (
                int(row["n_day_sketches"]),
                int(exact_total),
                int(bad == 0),
                int(
                    abs(row["est_total"] - exact_total) <= 0.10 * exact_total
                ),
            )
        ],
        "n_day_sketches long, exact_distinct long, "
        "daily_within_10pct long, merged_within_10pct long",
    )


# --- U6: recursive CTE (Spark 4 WITH RECURSIVE) -----------------------------
# Iterative graph/hierarchy traversal as ONE declarative statement — the
# engine unions each recursion step (a self-union per level, each level
# one small shuffle), no driver loop. Both engines run near-identical
# SQL, so this is direct SQL-surface parity, not a reformulation.
# Binary-ancestor hierarchy over part keys: depth <= log2(200), row
# count bounded by 200*8 at any SF (keys are a fixed prefix).

_U6_ORACLE = """
WITH RECURSIVE anc AS (
  SELECT CAST(p_partkey AS BIGINT) AS node,
         CAST(p_partkey AS BIGINT) AS ancestor,
         0 AS depth
  FROM part WHERE p_partkey <= 200
  UNION ALL
  SELECT node, ancestor // 2, depth + 1 FROM anc WHERE ancestor > 1
)
SELECT node, ancestor, depth FROM anc ORDER BY node, depth
"""


@register("u6_recursive_cte", oracle=_U6_ORACLE, tags=("U6",))
def u6_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_u6")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
          SELECT CAST(p_partkey AS BIGINT) AS node,
                 CAST(p_partkey AS BIGINT) AS ancestor,
                 0 AS depth
          FROM part_u6 WHERE p_partkey <= 200
          UNION ALL
          SELECT node, ancestor DIV 2, depth + 1 FROM anc WHERE ancestor > 1
        )
        SELECT node, ancestor, depth FROM anc ORDER BY node, depth
        """
    )


# --- S12: Observation API — metrics without a second scan -------------------
# df.observe() attaches aggregate metrics to a plan and delivers them as
# a side effect of the ONE action that runs anyway — the production
# pattern for row-count/quality telemetry on a 100 TB pipeline, where a
# separate .count() pass would double the scan cost. Oracled on the
# query result; the observation is additionally self-verified against
# the returned aggregate inside the query (mismatch raises).

_S12_ORACLE = """
SELECT
  l_returnflag,
  CAST(count(*) AS BIGINT)                        AS n,
  round(sum(l_extendedprice), 2)                  AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("s12_observe_metrics", oracle=_S12_ORACLE, tags=("S2", "A1"))
def s12_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("date")
    )
    obs = Observation("s12")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue_seen"),
    )
    out = (
        observed.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )
    rows = out.collect()  # bounded: one row per returnflag
    got = obs.get  # blocks until the action above delivered metrics
    n_total = sum(r.n for r in rows)
    if got["rows_seen"] != n_total:
        raise AssertionError(
            f"observe() saw {got['rows_seen']} rows, result aggregates {n_total}"
        )
    # the observation rode along the SAME job — no second scan happened;
    # return the already-computed rows as a local frame (re-running the
    # plan would start a second observation window on a used Observation)
    return spark.createDataFrame(
        rows, "l_returnflag string, n bigint, revenue double"
    )


# --- U7: SQL pipe syntax (SPARK-49555, Spark 4.0) ---------------------------
# `FROM t |> WHERE … |> AGGREGATE …` — operator-ordered SQL. Pure parser
# surface: Catalyst receives the identical logical plan as the nested-
# SELECT spelling, so the physical plan (partial agg → shuffle → final
# agg) is byte-for-byte the classic one; the oracle is that spelling.

_U7_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT)         AS n,
       round(sum(l_extendedprice), 2)   AS rev
FROM lineitem
WHERE l_quantity > 45
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("u7_pipe_syntax", oracle=_U7_ORACLE, tags=("U7",))
def u7_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_u7"
    )
    return spark.sql(
        """
        FROM lineitem_u7
        |> WHERE l_quantity > 45
        |> AGGREGATE count(*) AS n, round(sum(l_extendedprice), 2) AS rev
           GROUP BY l_returnflag
        |> SELECT l_returnflag, CAST(n AS BIGINT) AS n, rev
        |> ORDER BY l_returnflag
        """
    )


# --- F11: parameterized SQL (named markers, SPARK-41271) --------------------
# spark.sql(query, args=...) binds values server-side — the
# injection-safe templating surface every programmatic caller should
# use instead of f-strings. Binding happens at parse time, so constant
# folding and parquet filter pushdown see the literal exactly as if it
# were inlined.

_F11_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST((2 * sum(CAST(round(o_totalprice * 100) AS HUGEINT)) + count(*))
            // (2 * count(*)) AS BIGINT) AS avg_price_cents
FROM orders
WHERE o_totalprice > 150000.0 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("f11_parameterized_sql", oracle=_F11_ORACLE, tags=("F11",))
def f11_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg emitted as integer CENTS, not round(avg(double), 2)
    # (review-pass r17, f21/f23's lesson): a float avg has no
    # 2-decimal nominal anchor, so a group mean near a half-cent flips
    # between Spark's shortest-repr HALF_UP and DuckDB's binary
    # rounding. (2·S + n) div (2·n) over exact cent sums is the same
    # HALF_UP, order-free in both engines (all-positive here).
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_f11")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST((2 * sum(CAST(round(o_totalprice * 100)
                                  AS DECIMAL(19,0)))
                     + CAST(count(*) AS DECIMAL(19,0)))
                    div (2 * CAST(count(*) AS DECIMAL(19,0)))
                    AS BIGINT) AS avg_price_cents
        FROM orders_f11
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"min_price": 150000.0, "status": "F"},
    )


# --- F12: SQL session variables (SPARK-46908) -------------------------------
# DECLARE / SET VAR / reference-by-name: session-scoped typed state for
# multi-statement SQL workflows (thresholds, as-of dates) without
# client-side templating. The variable folds to a literal at plan time,
# so pushdown sees a constant — the oracle inlines the same values.

_F12_ORACLE = """
SELECT
  o_orderstatus,
  CAST(count(*) AS BIGINT)      AS n_orders,
  round(sum(o_totalprice), 2)   AS total
FROM orders
WHERE o_totalprice > 120000.0 AND o_orderdate >= DATE '1996-01-01'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("f12_sql_variables", oracle=_F12_ORACLE, tags=("F12",))
def f12_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_f12")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE f12_min_price DOUBLE DEFAULT 0.0"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE f12_cutoff DATE")
    spark.sql("SET VAR f12_min_price = 120000.0")
    spark.sql("SET VAR f12_cutoff = DATE '1996-01-01'")
    return spark.sql(
        """
        SELECT
          o_orderstatus,
          count(*)                    AS n_orders,
          round(sum(o_totalprice), 2) AS total
        FROM orders_f12
        WHERE o_totalprice > f12_min_price AND o_orderdate >= f12_cutoff
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


# --- X25: one-pass table profile (data-quality telemetry) -------------------
# The standard pre-training-ingest sanity scan: per column — null rate,
# distinct count, min/max (as strings so one schema fits every type).
# Built programmatically over the schema, but executed as ONE aggregate
# job (every stat is a column expression in a single agg — one scan, no
# per-column jobs), then unpivoted to rows. The oracle spells the same
# profile as a UNION ALL of per-column SELECTs.

_X25_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]

_X25_ORACLE = " UNION ALL ".join(
    f"""
SELECT
  '{c}' AS col_name,
  CAST(count(*) - count({c}) AS BIGINT)  AS n_null,
  CAST(count(DISTINCT {c}) AS BIGINT)    AS n_distinct,
  CAST(min({c}) AS VARCHAR)              AS min_str,
  CAST(max({c}) AS VARCHAR)              AS max_str
FROM orders"""
    for c in _X25_COLS
) + " ORDER BY col_name"


def table_profile(df: DataFrame, cols: list[str], exact: bool = False):
    """One-aggregate-job column profile (x25's engine). ``exact=False``
    (the DEFAULT at scale) uses approx_count_distinct (HLL++, one pass,
    mergeable partials); ``exact=True`` uses countDistinct — N exact
    distincts in one agg make Catalyst EXPAND the scan output ~(N+1)×
    (one replica per distinct column plus the plain-agg replica), the
    measured bulk of x25's bench cost — correct, but an opt-in at
    100 TB, not the default."""
    nd = (
        (lambda c: F.countDistinct(c))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__null"),
            nd(c).cast("bigint").alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    return df.agg(*aggs)  # single scan, single row


@register("x25_table_profile", oracle=_X25_ORACLE, tags=("X25", "X4", "A4"))
def x25_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-mode profile (the oracle re-derives every count); the
    default profile entry point is table_profile(exact=False) — see its
    docstring for the multi-distinct expand cost that makes approx the
    scale default."""
    o = load_table(spark, sf_dir, "orders")
    one = table_profile(o, _X25_COLS, exact=True)
    profile = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"{c}__null").alias("n_null"),
                        F.col(f"{c}__nd").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_str"),
                        F.col(f"{c}__max").alias("max_str"),
                    )
                    for c in _X25_COLS
                ]
            )
        ).alias("p")
    )
    return profile.select("p.*").orderBy("col_name")


# --- X28: temperature-based mixture re-weighting ----------------------------
# x13b rebalances with HAND-PICKED per-stratum rates; multilingual /
# multi-source pretraining instead derives the rates from the data:
# sample source i proportionally to c_i^alpha (alpha<1 flattens the
# head, the standard "temperature" mix of mBERT/XLM-R/mT5 lineage).
# This is the full two-stage op: ONE tiny aggregate for per-source
# counts (|sources| rows — broadcast scale), rates from the
# temperature formula, then the x13 content-addressed hash sampler as
# a map-side filter. No corpus shuffle anywhere; the only wide op is
# the |sources|-row count agg. Rates are rounded to 9 decimals before
# basis-point flooring on BOTH engines so cross-engine double ulps
# can't flip a bucket boundary.

_X28_ORACLE = """
WITH counts AS (
  SELECT lang, count(*) AS c FROM documents GROUP BY lang
),
denom AS (SELECT sum(sqrt(c)) AS z, sum(c) AS total FROM counts),
rates AS (
  SELECT lang, c,
         CAST(floor(round(
           least(1.0, (0.5 * total * (sqrt(c) / z)) / c),
           9) * 10000) AS BIGINT) AS bp
  FROM counts CROSS JOIN denom
),
kept AS (
  SELECT d.lang, d.doc_id, r.c, r.bp
  FROM documents d JOIN rates r USING (lang)
  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 10000 < r.bp
)
SELECT lang,
       CAST(max(c) AS BIGINT)       AS n_orig,
       max(bp)                      AS rate_bp,
       CAST(count(*) AS BIGINT)     AS n_kept,
       CAST(sum(doc_id) AS BIGINT)  AS id_sum
FROM kept GROUP BY lang ORDER BY lang
"""


@register("x28_mixture_temperature", oracle=_X28_ORACLE, tags=("X28", "X13", "X6"))
def x28_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    # stratify on lang — the fixture's SKEWED dimension (en dominates),
    # so the temperature flattening is exercised non-degenerately
    # (uniform `source` strata would all share one rate)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    denom = counts.agg(
        F.sum(F.sqrt("c")).alias("z"), F.sum("c").alias("total")
    )
    rates = counts.crossJoin(F.broadcast(denom)).select(
        "lang",
        "c",
        F.floor(
            F.round(
                F.least(
                    F.lit(1.0),
                    (0.5 * F.col("total") * (F.sqrt("c") / F.col("z")))
                    / F.col("c"),
                ),
                9,
            )
            * 10000
        )
        .cast("long")
        .alias("bp"),
    )
    kept = d.join(F.broadcast(rates), "lang").filter(
        hash_bucket(F.col("doc_id")) < F.col("bp")
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.max("c").cast("long").alias("n_orig"),
            F.max("bp").alias("rate_bp"),
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("lang")
    )


# --- F17: SQL scripting (Spark 4 BEGIN..END procedural blocks) --------------
# Spark 4's SQL scripting (DECLARE local variables, WHILE/IF control
# flow inside one BEGIN..END statement — the spark-sql migration path
# for stored-procedure workloads). Exercised with a data-dependent
# loop: double a price threshold until fewer than 100 orders exceed it.
# The script's iteration is pure control flow over ONE repeated
# aggregate; DuckDB has no scripting, so the oracle derives the same
# fixpoint declaratively (smallest 1000*2^k whose exceed-count drops
# under 100) — the script result INCLUDING the loop's iteration count
# is value-checked, not just accepted (n_iters pins the control-flow
# path, so a loop that over- or under-runs cannot hash green).
# Scale shape: each iteration is one distributed count; the loop runs
# O(log(max_price)) times on the driver — no per-row Python anywhere.

_F17_ORACLE = """
WITH t AS (
  SELECT k, 1000.0 * power(2, k) AS threshold
  FROM (SELECT unnest(generate_series(0, 40)) AS k)
),
c AS (
  SELECT k, threshold,
         (SELECT count(*) FROM orders WHERE o_totalprice > threshold) AS n
  FROM t
)
SELECT CAST(threshold AS DOUBLE) AS threshold,
       CAST(n AS BIGINT)         AS n_above,
       CAST(k AS BIGINT)         AS n_iters
FROM c WHERE n < 100 ORDER BY threshold LIMIT 1
"""


@register("f17_sql_scripting", oracle=_F17_ORACLE, tags=("F17", "F12"))
def f17_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_f17")
    saved = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE th DOUBLE DEFAULT 1000.0;
              DECLARE n BIGINT DEFAULT 0;
              DECLARE iters BIGINT DEFAULT 0;
              SET n = (SELECT count(*) FROM orders_f17
                       WHERE o_totalprice > th);
              WHILE n >= 100 DO
                SET th = th * 2;
                SET iters = iters + 1;
                SET n = (SELECT count(*) FROM orders_f17
                         WHERE o_totalprice > th);
              END WHILE;
              SELECT th AS threshold, n AS n_above, iters AS n_iters;
            END
            """
        )
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", saved)


# --- X30: upsampled mixture (repeat-count sampling, rates > 1) --------------
# x28 flattens an over-represented head by DOWN-sampling (rate <= 1);
# the complementary real-world case is a high-quality source whose
# target share EXCEEDS its size (Wikipedia-style upsampling: each doc
# appears floor(r) times plus one more with probability frac(r)).
# Deterministic spelling: copies = floor(r) + [hash_bucket(doc_id) <
# frac(r)*10000] — content-addressed like every sampler here, so the
# emitted multiset is reproducible across engines and runs, and DuckDB
# re-derives it exactly. Scale shape: per-stratum rates from one tiny
# agg; the emission is a map-side explode(sequence(1, copies)) — the
# output grows by design, but no shuffle and no driver state.

_X30_ORACLE = """
WITH counts AS (
  SELECT lang, count(*) AS c FROM documents GROUP BY lang
),
denom AS (SELECT sum(c) AS total FROM counts),
-- equal-share target: every lang gets total/5 docs; rare langs
-- upsample (r > 1), en downsamples (r < 1)
rates AS (
  SELECT lang, c, round((total / 5.0) / c, 9) AS r
  FROM counts CROSS JOIN denom
),
expanded AS (
  SELECT d.lang, d.doc_id,
         CAST(floor(r) AS BIGINT)
         + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 10000
                < CAST(floor(round(r - floor(r), 9) * 10000) AS BIGINT)
                THEN 1 ELSE 0 END AS copies
  FROM documents d JOIN rates USING (lang)
)
SELECT lang,
       CAST(count(*) AS BIGINT)        AS n_orig,
       CAST(sum(copies) AS BIGINT)     AS n_emitted,
       CAST(sum(doc_id * copies) AS BIGINT) AS weighted_id_sum
FROM expanded GROUP BY lang ORDER BY lang
"""


@register("x30_upsampled_mixture", oracle=_X30_ORACLE, tags=("X30", "X28", "X13"))
def x30_upsampled_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    denom = counts.agg(F.sum("c").alias("total"))
    rates = counts.crossJoin(F.broadcast(denom)).select(
        "lang",
        F.round((F.col("total") / 5.0) / F.col("c"), 9).alias("r"),
    )
    base = F.floor("r").cast("long")
    frac_bp = F.floor(F.round(F.col("r") - F.floor("r"), 9) * 10000).cast(
        "long"
    )
    expanded = d.join(F.broadcast(rates), "lang").select(
        "lang",
        "doc_id",
        (
            base
            + F.when(hash_bucket(F.col("doc_id")) < frac_bp, 1).otherwise(0)
        ).alias("copies"),
    )
    # consumed three ways (emission count, copy accounting, the final
    # mixture summary) — uncached it recomputed the scan+join each time
    # (review-pass r16); pin cleared by the harness
    expanded.cache()
    # the actual emission (map-side, no shuffle): one row per copy —
    # aggregated here to a compare-friendly summary, but the exploded
    # frame IS the training-mix output a pipeline would write
    emitted = expanded.filter(F.col("copies") > 0).withColumn(
        "copy_idx", F.explode(F.sequence(F.lit(1), F.col("copies")))
    )
    # self-check: explode really multiplies the multiset
    if emitted.count() != expanded.agg(F.sum("copies")).first()[0]:
        raise AssertionError("explode emission != copy accounting")
    return (
        expanded.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_orig"),
            F.sum("copies").alias("n_emitted"),
            F.sum(F.col("doc_id") * F.col("copies")).alias("weighted_id_sum"),
        )
        .orderBy("lang")
    )


# --- F19: IDENTIFIER() clause (SPARK-43205) ---------------------------------
# The injection-safe companion to F11's value parameters: IDENTIFIER(
# :name) binds a table/column NAME from a parameter, closing the one
# hole value markers leave (object names can't be value-parameterized).
# Programmatic callers templating table names — per-tenant tables,
# per-snapshot clones — get catalog-checked binding instead of
# f-string splicing. Resolution happens at parse time, so the plan is
# identical to writing the name literally (pushdown sees the real
# relation).

_F19_ORACLE = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(CASE WHEN sum(CAST(round(c_acctbal * 100) AS HUGEINT)) >= 0
                 THEN (2 * sum(CAST(round(c_acctbal * 100) AS HUGEINT))
                       + count(*)) // (2 * count(*))
                 ELSE -((-2 * sum(CAST(round(c_acctbal * 100) AS HUGEINT))
                         + count(*)) // (2 * count(*)))
            END AS BIGINT) AS avg_bal_cents
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("f19_identifier_clause", oracle=_F19_ORACLE, tags=("F19", "F11"))
def f19_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg emitted as integer CENTS with the sign factored out of the
    # floor division (review-pass r17, the x3h rule: div truncation
    # vs flooring diverges on negative operands, and acctbal CAN be
    # negative) — HALF_UP away from zero, order-free in both engines,
    # while the query's real subject (IDENTIFIER binding) is unchanged.
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_f19"
    )
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(CASE
                 WHEN sum(CAST(round(IDENTIFIER(:balcol) * 100)
                               AS DECIMAL(19,0))) >= 0
                 THEN (2 * sum(CAST(round(IDENTIFIER(:balcol) * 100)
                                    AS DECIMAL(19,0)))
                       + CAST(count(*) AS DECIMAL(19,0)))
                      div (2 * CAST(count(*) AS DECIMAL(19,0)))
                 ELSE -((-2 * sum(CAST(round(IDENTIFIER(:balcol) * 100)
                                       AS DECIMAL(19,0)))
                         + CAST(count(*) AS DECIMAL(19,0)))
                        div (2 * CAST(count(*) AS DECIMAL(19,0))))
               END AS BIGINT) AS avg_bal_cents
        FROM IDENTIFIER(:tbl)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """,
        args={"tbl": "customer_f19", "balcol": "c_acctbal"},
    )


# --- F20: VARIANT type (Spark 4 semi-structured values) ---------------------
# Spark 4's VARIANT is the open-format semi-structured type (binary
# encoding + typed path access) that replaces string-JSON hot paths:
# parse once, then variant_get extracts are typed and pushdown-friendly
# instead of per-access JSON re-parses. Exercised end-to-end: build a
# nested JSON document per order (object + array + string-encoded
# number), parse_json into a VARIANT column, extract with variant_get
# casts incl. an array index and a CAST from a JSON string number, and
# prove try_variant_get returns NULL (never raises) on a missing path.
# DuckDB has no VARIANT; the oracle re-derives every extracted value
# from the source columns directly, so any corruption in the
# parse->binary->extract round-trip hash-mismatches. Scale: VARIANT
# stays JVM-side (no UDF, whole-stage codegen), and the parse is one
# map-side pass — the 100 TB shape is parse-once-store-variant, then
# cheap typed extracts.
# (Reference parity: Spark-side capability enabled by the engine
# install, /root/reference/main.tf:761; no VARIANT code in reference.)

_F20_ORACLE = """
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o_orderkey % 10) AS BIGINT) AS tag0_sum,
       round(sum(o_totalprice), 2) AS price_sum,
       CAST(count(*) AS BIGINT) AS n_missing
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("f20_variant_type", oracle=_F20_ORACLE, tags=("F20", "F7"))
def f20_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    js = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.struct(
                F.col("o_orderkey").alias("okey"),
                # string-encoded number: the classic JSON wire shape —
                # variant_get must CAST it back to double losslessly
                F.col("o_totalprice").cast("string").alias("price_s"),
            ).alias("k"),
            F.array(
                (F.col("o_orderkey") % 10).cast("string"),
                F.col("o_orderpriority"),
            ).alias("tags"),
        )
    )
    v = o.select("o_orderkey", F.parse_json(js).alias("v"))
    ex = v.select(
        F.variant_get("v", "$.status", "string").alias("status"),
        F.variant_get("v", "$.k.okey", "bigint").alias("okey"),
        F.variant_get("v", "$.k.price_s", "double").alias("price"),
        F.variant_get("v", "$.tags[0]", "bigint").alias("tag0"),
        # missing path: try_ returns NULL (ANSI mode would raise on a
        # malformed CAST, but absent paths are NULL in both flavors)
        F.try_variant_get("v", "$.nope.deep", "int").alias("missing"),
    )
    return (
        ex.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("tag0").alias("tag0_sum"),
            F.round(F.sum("price"), 2).alias("price_sum"),
            F.sum(
                F.when(F.col("missing").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_missing"),
        )
        .orderBy("status")
    )


# --- F21: SQL session variables (DECLARE / SET VAR) -------------------------
# Spark 4 session variables: DECLARE VARIABLE + SET VAR, including
# assignment FROM a scalar subquery — the spark-sql migration path for
# parameterized production SQL that previously string-spliced
# thresholds. The variable read is constant-folded at plan time, so
# the filter it parameterizes is an ordinary pushable predicate (same
# plan as the literal — no performance tax for the indirection).
# DuckDB has no session variables; the oracle derives the same
# threshold with a scalar-subquery CTE, so the variable VALUE (not
# just the plumbing) is hash-checked. The threshold is computed in
# integer CENTS (per-value round to cents, bigint sum, floor-division
# mean) because it feeds a PREDICATE: a float avg's summation order
# differs between engines, and one ulp across a rounding boundary
# would flip rows in or out of the filter — the review-pass finding
# that float rounding is fine for displayed values but not for
# decision boundaries.

_F21_ORACLE = """
WITH params AS (
  SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) * 3
              // (2 * count(*)) AS BIGINT) AS hi_bar_cents
  FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_high,
       round(min(o_totalprice), 2) AS min_price,
       CAST(max((SELECT hi_bar_cents FROM params)) AS BIGINT) AS hi_bar_cents
FROM orders
WHERE CAST(round(o_totalprice * 100) AS BIGINT)
        > (SELECT hi_bar_cents FROM params)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("f21_session_variables", oracle=_F21_ORACLE, tags=("F21", "F11"))
def f21_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_f21")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE hi_bar_cents BIGINT DEFAULT 0"
    )
    # assignment from a scalar subquery — the variable is evaluated
    # ONCE here, then is a literal everywhere it's read (1.5x the mean
    # price, in integer cents: sum*3 div (2*n))
    spark.sql(
        "SET VAR hi_bar_cents = ("
        "SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) * 3L"
        " div (2 * count(*)) FROM orders_f21)"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_high,
               round(min(o_totalprice), 2) AS min_price,
               max(hi_bar_cents) AS hi_bar_cents
        FROM orders_f21
        WHERE CAST(round(o_totalprice * 100) AS BIGINT) > hi_bar_cents
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# --- X40: UniMax budget-waterfilling mixture --------------------------------
# UniMax (Chung et al., 2022, public): allocate a fixed training-token
# budget across strata as UNIFORMLY as possible subject to a per-
# stratum epoch cap — the principled alternative to temperature
# sampling (x28) when repeating small strata more than E times is the
# concern. Greedy waterfill, smallest stratum first:
#
#   alloc_i = min(E * s_i, remaining_budget / remaining_strata)
#
# The sequential greedy is respelled CLOSED-FORM over windows (no
# driver loop): sorted ascending, a stratum is "capped" iff its full
# E*s_i fits under an equal split of what's left — a prefix-closed
# predicate (running-AND window) — and every uncapped stratum gets the
# identical floor-division equal share of the post-prefix budget.
# All arithmetic is bigint (chars, floor division) — exact both
# engines. Scale shape: ONE corpus scan for the strata sizes, then
# every window runs over the |strata|-row frame (thousands at most,
# NEVER the corpus) — the x28/x30 pattern; the resulting rates drive
# the same content-addressed samplers.

_X40_EPOCH_CAP = 2  # max epochs over any stratum
_X40_BUDGET_NUM, _X40_BUDGET_DEN = 2, 5  # budget = 40% of corpus chars

_X40_ORACLE = f"""
WITH strata AS (
  SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS s
  FROM documents GROUP BY lang, source
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(s) * {_X40_BUDGET_NUM} // {_X40_BUDGET_DEN} AS budget
  FROM strata
),
ordered AS (
  SELECT lang, source, s,
         row_number() OVER w AS i,
         coalesce(sum({_X40_EPOCH_CAP} * s) OVER
           (ORDER BY s, lang, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_prev
  FROM strata
  WINDOW w AS (ORDER BY s, lang, source)
),
flagged AS (
  SELECT *,
         min(CASE WHEN {_X40_EPOCH_CAP} * s * (tot.n - i + 1)
                       <= tot.budget - cum_prev
                  THEN 1 ELSE 0 END) OVER
           (ORDER BY i ROWS UNBOUNDED PRECEDING) AS capped
  FROM ordered CROSS JOIN tot
),
split AS (
  SELECT coalesce(CAST(sum(capped) AS BIGINT), 0) AS k,
         coalesce(CAST(sum(CASE WHEN capped = 1
                          THEN {_X40_EPOCH_CAP} * s END) AS BIGINT), 0)
           AS cum_e_k
  FROM flagged
),
alloc AS (
  SELECT lang, source, s,
         CASE WHEN capped = 1 THEN {_X40_EPOCH_CAP} * s
              ELSE least({_X40_EPOCH_CAP} * s,
                         (tot.budget - cum_e_k) // (tot.n - k))
         END AS alloc_chars
  FROM flagged CROSS JOIN split CROSS JOIN tot
)
SELECT lang, source, s AS s_chars,
       CAST(alloc_chars AS BIGINT) AS alloc_chars,
       CAST(alloc_chars * 10000 // s AS BIGINT) AS epochs_bp
FROM alloc ORDER BY lang, source
"""


def unimax_waterfill(
    strata: DataFrame,
    keys: list[str],
    epoch_cap: int,
    budget_num: int,
    budget_den: int,
) -> DataFrame:
    """Closed-form UniMax waterfill over a (keys..., s) strata frame
    (x40's engine; see the x40 block comment for the derivation).
    Budget = sum(s) * budget_num div budget_den. Returns the strata
    keys + s_chars / alloc_chars / epochs_bp."""
    from pyspark.sql import Window

    E = epoch_cap
    tot = strata.agg(
        F.count(F.lit(1)).alias("__wf_n"),
        F.expr(f"sum(s) * {budget_num}L div {budget_den}L").alias("__wf_budget"),
    )
    # |strata|-row frame from here on: the unpartitioned windows are
    # over thousands of rows at most, never the corpus (see docstring)
    wo = Window.orderBy("s", *keys)
    ordered = strata.select(
        *keys,
        "s",
        F.row_number().over(wo).alias("__wf_i"),
        F.coalesce(
            F.sum(F.lit(E) * F.col("s")).over(
                wo.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__wf_cum_prev"),
    ).crossJoin(F.broadcast(tot))
    flagged = ordered.withColumn(
        "__wf_capped",
        F.min(
            F.when(
                F.lit(E) * F.col("s") * (F.col("__wf_n") - F.col("__wf_i") + 1)
                <= F.col("__wf_budget") - F.col("__wf_cum_prev"),
                1,
            ).otherwise(0)
        ).over(Window.orderBy("__wf_i").rowsBetween(Window.unboundedPreceding, 0)),
    )
    split = flagged.agg(
        F.coalesce(F.sum("__wf_capped"), F.lit(0)).alias("__wf_k"),
        F.coalesce(
            F.sum(F.when(F.col("__wf_capped") == 1, F.lit(E) * F.col("s"))),
            F.lit(0),
        ).alias("__wf_cum_e_k"),
    )
    alloc = flagged.crossJoin(F.broadcast(split)).withColumn(
        "alloc_chars",
        F.when(F.col("__wf_capped") == 1, F.lit(E) * F.col("s")).otherwise(
            F.least(
                F.lit(E) * F.col("s"),
                F.expr("(__wf_budget - __wf_cum_e_k) div (__wf_n - __wf_k)"),
            )
        ),
    )
    return alloc.select(
        *keys,
        F.col("s").alias("s_chars"),
        F.col("alloc_chars").cast("long").alias("alloc_chars"),
        F.expr("alloc_chars * 10000L div s").cast("long").alias("epochs_bp"),
    ).orderBy(*keys)


@register("x40_unimax_mixture", oracle=_X40_ORACLE, tags=("X40", "X6"))
def x40_unimax_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    strata = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.sum("n_chars").alias("s"))
    )
    return unimax_waterfill(
        strata,
        ["lang", "source"],
        _X40_EPOCH_CAP,
        _X40_BUDGET_NUM,
        _X40_BUDGET_DEN,
    )


# --- F22: try_* ANSI-safe arithmetic ----------------------------------------
# PySpark 4 runs ANSI mode ON by default: integer overflow and
# division by zero RAISE instead of wrapping/NULLing. The try_* family
# (try_add/try_subtract/try_multiply/try_divide/try_mod, plus
# try_sum/try_avg aggregates) is the sanctioned per-expression opt-out
# — NULL on failure, never a wrap and never a job abort. The pipeline
# reality: one malformed row must not kill a 100 TB pass; try_* keeps
# the lane ANSI-strict while quarantining the poison rows as NULLs you
# can count (audited here as n_null_div). DuckDB divides by zero to
# NULL natively, and its hugeint arithmetic never overflows at these
# magnitudes — the oracle spells the same semantics with NULLIF +
# explicit CASTs.

_F22_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                     ELSE o_orderkey * 1000000 END) AS BIGINT) AS scaled_sum,
       CAST((2 * sum(CASE WHEN o_orderkey % 5 = 0 THEN 0
                          ELSE CAST(round(o_totalprice * 100) AS BIGINT)
                               * (12 // (o_orderkey % 5)) END) + 12)
            // 24 AS DOUBLE) / 100 AS ratio_sum,
       CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_div
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("f22_try_arithmetic", oracle=_F22_ORACLE, tags=("F22", "F3"))
def f22_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    e = o.select(
        "o_orderpriority",
        "o_totalprice",
        # poison lane: every 7th key pretends to overflow — modeled
        # with an explicit NULL injection so the try_multiply NULL
        # propagation (not the overflow threshold itself, which needs
        # values near 2^63) is what's value-checked
        F.try_multiply(
            F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(
                F.col("o_orderkey")
            ),
            F.lit(1000000),
        ).alias("scaled"),
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 5)
        ).alias("ratio"),
        # integer twelfth-cents of the same ratio (review-pass r17):
        # the displayed ratio_sum used to be a float sum of thousands
        # of /1../4 quotients rounded to cents — /3 never terminates,
        # so the true sum can sit arbitrarily close to a half-cent at
        # ANY scale and cross-engine summation order alone could flip
        # the cent. cents·(12 div d) is exact bigint per row (divisors
        # 1..4 all divide 12), the sum is order-free, and the cent
        # rounding is (2·S12 + 12) div 24 — HALF_UP, all-positive.
        F.when(
            F.col("o_orderkey") % 5 != 0,
            F.round(F.col("o_totalprice") * 100).cast("long")
            * F.expr("12 div (o_orderkey % 5)"),
        ).otherwise(F.lit(0)).alias("twelfth_cents"),
    )
    return (
        e.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.try_sum("scaled").alias("scaled_sum"),
            F.expr(
                "CAST((2 * sum(twelfth_cents) + 12) div 24 AS DOUBLE) / 100"
            ).alias("ratio_sum"),
            F.sum(F.col("ratio").isNull().cast("long")).alias("n_null_div"),
        )
        .orderBy("o_orderpriority")
    )


# --- F23: SQL sugar — SELECT * EXCEPT, ORDER BY ALL, lateral aliases --------
# Three Spark-4 conveniences that migrating warehouse SQL leans on
# daily: `SELECT * EXCEPT (cols)` (wide-table projection without
# enumerating survivors — still full column PRUNING, the except-list
# never reaches the scan), `ORDER BY ALL` (deterministic total order
# without restating the select list), and lateral column aliases
# (referencing `net` in the very select list that defines it — no
# subquery nesting). DuckDB shares EXCLUDE/ORDER BY ALL semantics but
# the oracle spells everything explicitly so the sugar itself is what
# the hash proves.

# net is integer cents (x*0.9 == cents*9 div 10): per-row
# round(double, 2) lands on half-cent ulp boundaries differently per
# engine and the per-row differences accumulate into the sum —
# measured here before the integer respell (f21's lesson again)

_F23_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT) * 9 // 10)
            AS BIGINT) AS net_cents
FROM orders
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus, n, net_cents
"""


@register("f23_star_sugar", oracle=_F23_ORACLE, tags=("F23", "P1"))
def f23_star_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_f23")
    return spark.sql(
        """
        SELECT * EXCEPT (cents_total)
        FROM (
          SELECT o_orderpriority, o_orderstatus,
                 count(*) AS n,
                 sum(cents) AS cents_total,
                 sum(net) AS net_cents
          FROM (
            SELECT o_orderpriority, o_orderstatus,
                   -- lateral column alias: cents is defined here and
                   -- referenced by net in the SAME select list
                   -- (GROUP BY ALL + lateral alias in one list is
                   -- unsupported, so the chain lives in this inner
                   -- projection)
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   cents * 9L div 10 AS net
            FROM orders_f23
          )
          GROUP BY ALL
        )
        ORDER BY ALL
        """
    )


# --- X47: count-min sketch heavy hitters ------------------------------------
# The mergeable frequency sketch (Cormode & Muthukrishnan, public)
# that telemetry and governance pipelines use when exact per-token
# counts are too wide to keep: D=4 hash rows x W=64 cells, every cell
# a SUM — so partial sketches from any partitioning merge by
# addition, the same mergeability contract as a5c's HLL union, and
# the whole sketch is a (D*W)-row DataFrame, never a driver-side
# array. Estimate(token) = min over rows of its cell — an
# OVERestimate by construction (never under), which the output
# carries as an `overcount` column so the guarantee is part of the
# hash-checked values. Hashing is the repo-standard md5 bucket on a
# row-salted key, so DuckDB replays the ENTIRE sketch cell-for-cell —
# a fully value-oracled sketch, unlike engine-opaque HLL/CMS blobs.
# Scale shape: corpus-linear token explode, (row, cell) int shuffle
# with map-side combine into <= D*W groups, then probes join the
# 256-row sketch BROADCAST. At 100 TB the probe set comes from
# per-partition candidate top-k, not the full vocabulary.

_X47_D = 4
_X47_W = 64
_X47_TOPK = 10

_X47_ORACLE = f"""
WITH tok AS (
  SELECT t.tok FROM documents,
       LATERAL unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''
),
cells AS (
  SELECT r,
         CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || '#' || tok), 1, 8))
              AS BIGINT) % {_X47_W} AS cell,
         CAST(count(*) AS BIGINT) AS c
  FROM tok, LATERAL (SELECT unnest(generate_series(0, {_X47_D - 1})) AS r) g
  GROUP BY 1, 2
),
exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_n FROM tok GROUP BY tok),
probes AS (
  SELECT tok, exact_n, r,
         CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || '#' || tok), 1, 8))
              AS BIGINT) % {_X47_W} AS cell
  FROM exact, LATERAL (SELECT unnest(generate_series(0, {_X47_D - 1})) AS r) g
),
est AS (
  SELECT tok, exact_n, min(c) AS cms_est
  FROM probes JOIN cells USING (r, cell)
  GROUP BY tok, exact_n
)
SELECT tok, exact_n, CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_n AS BIGINT) AS overcount
FROM est
ORDER BY cms_est DESC, tok
LIMIT {_X47_TOPK}
"""


@register("x47_countmin_heavy_hitters", oracle=_X47_ORACLE, tags=("X47", "A5", "X4"))
def x47_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    D, W = _X47_D, _X47_W
    tok = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    rows = F.explode(F.sequence(F.lit(0), F.lit(D - 1))).alias("r")
    salted = lambda: hash_bucket(  # noqa: E731 — shared cell spelling
        F.concat(F.col("r").cast("string"), F.lit("#"), F.col("tok")), W
    )
    # ONE corpus pass total (review-pass r16): the old spelling cached
    # the corpus-linear exploded-occurrence frame and counted cells
    # from it; cell counts are exactly the per-cell SUM of the
    # vocabulary-sized exact counts (count of occurrences per cell ==
    # sum over its tokens' counts), so everything downstream derives
    # from `exact` — the cache pin and the second corpus explode are
    # gone. `probes` is cached instead: vocabulary x D rows, consumed
    # by both the cell aggregation and the probe join; pin cleared by
    # the harness (bench.py / driver_sim clearCache).
    exact = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.select("tok", "exact_n", rows).withColumn(
        "cell", salted()
    )
    probes.cache()
    cells = probes.groupBy("r", "cell").agg(F.sum("exact_n").alias("c"))
    est = (
        probes.join(F.broadcast(cells), ["r", "cell"])
        .groupBy("tok", "exact_n")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        est.select(
            "tok",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.col("cms_est").desc(), "tok")
        .limit(_X47_TOPK)
    )
