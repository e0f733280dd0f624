"""Suite 3 — TPC-DS-flavored analytic shapes (rounds 7-8).

The 22-shape TPC-H suite covers the reference's Spark-SQL relational
surface; these add the DS-style compositions real warehouse workloads
lean on — share-of-parent over a rollup, year-over-year growth,
moving-window trend smoothing, mix-shift analysis, cohort retention,
basket-pair affinity, purchase-cadence histograms, exact discrete
percentile reports, ordered funnels (qd9), RFM segmentation via
chunked ranks (qd10), and as-of last-touch attribution (qd11) — each
a pure declarative plan (rollup/window/join over one fact scan, dims
broadcast) and each value-oracled in DuckDB.

Scale shapes: every query is one fact-table scan + one keyed shuffle;
windows partition on the analysis key (year / segment / priority), so
no global sorts; the only driver-side data are the final small result
frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

# --- qd1: share-of-parent over ROLLUP ---------------------------------------
# The classic DS report: revenue at (region, nation) with each nation's
# share of its region — a window OVER the rollup output (grouping-id
# aware), so subtotal rows carry share 1.0 of themselves and leaf rows
# divide by their parent subtotal.

_QD1_ORACLE = """
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation,
       round(revenue, 2) AS revenue,
       round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
         AS region_share
FROM rev
ORDER BY region, nation
"""


@register("qd1_share_of_parent", oracle=_QD1_ORACLE, tags=("A7", "W3", "J9"))
def qd1_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re_ = load_table(spark, sf_dir, "region")
    rev = (
        li.join(F.broadcast(su), li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(re_), na["n_regionkey"] == re_["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev_raw"
            )
        )
    )
    w = Window.partitionBy("region")
    return (
        rev.select(
            "region",
            "nation",
            F.round("rev_raw", 2).alias("revenue"),
            F.round(F.col("rev_raw") / F.sum("rev_raw").over(w), 6).alias(
                "region_share"
            ),
        )
        .orderBy("region", "nation")
    )


# --- qd2: year-over-year growth per market segment --------------------------

_QD2_ORACLE = """
WITH yearly AS (
  SELECT c.c_mktsegment AS segment,
         CAST(year(o.o_orderdate) AS INTEGER) AS yr,
         sum(o.o_totalprice) AS total
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT segment, yr,
       round(total, 2) AS total,
       round(total / lag(total) OVER (PARTITION BY segment ORDER BY yr) - 1,
             6) AS yoy_growth
FROM yearly
ORDER BY segment, yr
"""


@register("qd2_yoy_growth", oracle=_QD2_ORACLE, tags=("W2", "A1", "J1"))
def qd2_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    yearly = (
        # no broadcast hint on customer (review-pass r18): it is
        # user-cardinality — ~TBs at 100 TB, past Spark's broadcast cap;
        # the hint would hard-abort where a shuffle join just works.
        # At fixture scale AQE still broadcasts it on its own.
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.sum("o_totalprice").alias("tot_raw"))
    )
    w = Window.partitionBy("segment").orderBy("yr")
    return (
        yearly.select(
            "segment",
            "yr",
            F.round("tot_raw", 2).alias("total"),
            F.round(F.col("tot_raw") / F.lag("tot_raw").over(w) - 1, 6).alias(
                "yoy_growth"
            ),
        )
        .orderBy("segment", "yr")
    )


# --- qd3: 3-month moving average per order priority -------------------------

_QD3_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS ym,
         count(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT priority, ym,
       CAST(n AS BIGINT) AS n_orders,
       round(avg(n) OVER (PARTITION BY priority ORDER BY ym
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS ma3
FROM monthly
ORDER BY priority, ym
"""


@register("qd3_moving_average", oracle=_QD3_ORACLE, tags=("W3", "A1"))
def qd3_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("ym"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = (
        Window.partitionBy("priority")
        .orderBy("ym")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        monthly.select(
            "priority",
            "ym",
            "n_orders",
            F.round(F.avg("n_orders").over(w), 4).alias("ma3"),
        )
        .orderBy("priority", "ym")
    )


# --- qd4: return-flag mix shift by ship year (share-of-year) ----------------
# (fixture lineitem carries no l_shipmode; l_returnflag is the mix
# dimension with the same analytic shape)

_QD4_ORACLE = """
WITH base AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, l_returnflag, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
tot AS (SELECT yr, sum(n) AS t FROM base GROUP BY yr)
SELECT b.yr, b.l_returnflag AS return_flag,
       CAST(b.n AS BIGINT) AS n_lines,
       CAST((2 * b.n * 1000000 + t.t) // (2 * t.t) AS BIGINT) / 1000000.0
         AS year_share
FROM base b JOIN tot t USING (yr)
ORDER BY yr, return_flag
"""


@register("qd4_mix_shift", oracle=_QD4_ORACLE, tags=("A1", "W3"))
def qd4_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-year mix: n/t is an exact RATIONAL of two counts, so a
    per-group round(n/t, 6) is the d2 tie class (r14: Spark's
    exact-binary HALF_UP and DuckDB's scaled rint split on exact
    decimal ties) — respelled as half-up INTEGER arithmetic,
    floor((2*n*10^6 + t) / (2*t)), which both engines compute
    identically on bigints; the displayed double is then the IEEE
    division of identical integers (bit-identical cross-engine).
    Overflow bound: 2*n*10^6 needs n <= ~4.6e12 rows per (yr, flag) —
    comfortable at 100 TB (~4e11 lineitem rows total)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy(
        F.year("l_shipdate").cast("int").alias("yr"),
        F.col("l_returnflag").alias("return_flag"),
    ).agg(F.count(F.lit(1)).alias("n_lines"))
    w = Window.partitionBy("yr")
    return (
        base.withColumn("__t", F.sum("n_lines").over(w))
        .select(
            "yr",
            "return_flag",
            "n_lines",
            (
                F.expr("(2 * n_lines * 1000000 + __t) div (2 * __t)")
                / F.lit(1000000.0)
            ).alias("year_share"),
        )
        .orderBy("yr", "return_flag")
    )


# --- qd5: cohort retention matrix -------------------------------------------
# First-order-year cohorts × years-since-cohort activity: the classic
# retention triangle. Two hash aggregates (distinct customer-years,
# per-customer min) + one broadcast-sized cohort-size dim — the fact
# scan shuffles once on custkey; cohort_size joins back on the ≤#years
# cohort key, broadcast.

_QD5_ORACLE = """
WITH cust_year AS (
  SELECT DISTINCT o_custkey, EXTRACT(year FROM o_orderdate) AS yr FROM orders
),
cohort AS (SELECT o_custkey, min(yr) AS cohort_yr FROM cust_year GROUP BY 1)
SELECT c.cohort_yr AS cohort_year,
       cy.yr - c.cohort_yr AS years_since,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST((2 * count(*) * 1000000 + max(sz.cohort_size))
            // (2 * max(sz.cohort_size)) AS BIGINT) / 1000000.0
         AS retention
FROM cust_year cy
JOIN cohort c USING (o_custkey)
JOIN (SELECT cohort_yr, count(*) AS cohort_size FROM cohort GROUP BY 1) sz
  ON sz.cohort_yr = c.cohort_yr
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("qd5_cohort_retention", oracle=_QD5_ORACLE, tags=("A1", "A4", "J1"))
def qd5_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention = n_active/cohort_size, an exact rational of two
    counts — the same d2 tie class as qd4's year_share, respelled the
    same way: half-up integer ppm via bigint div, displayed as the
    IEEE division of identical integers (see qd4_mix_shift)."""
    o = load_table(spark, sf_dir, "orders")
    cust_year = o.select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).distinct()
    cohort = cust_year.groupBy("o_custkey").agg(
        F.min("yr").alias("cohort_yr")
    )
    size = cohort.groupBy("cohort_yr").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        cust_year.join(cohort, "o_custkey")
        .join(F.broadcast(size), "cohort_yr")
        .groupBy(
            F.col("cohort_yr").alias("cohort_year"),
            (F.col("yr") - F.col("cohort_yr")).alias("years_since"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.max("cohort_size").alias("__sz"),
        )
        .select(
            "cohort_year",
            "years_since",
            "n_active",
            (
                F.expr("(2 * n_active * 1000000 + __sz) div (2 * __sz)")
                / F.lit(1000000.0)
            ).alias("retention"),
        )
        .orderBy("cohort_year", "years_since")
    )


# --- qd6: basket-pair affinity (market-basket co-occurrence) ----------------
# Cross-sell staple: part pairs co-ordered in one order. The self-join
# is keyed on orderkey, so pair explosion is bounded by basket size
# squared PER ORDER (TPC-H baskets are ≤7 lines) — never a corpus
# cross join; the pair aggregate shuffles (part_a, part_b) ints. The
# top-20 cut is a total order (count desc, part_a, part_b), so the
# boundary is deterministic on both engines. Against UNBOUNDED baskets
# (the pastebin-order problem: one 10⁵-line basket is 10¹⁰ pairs) a
# deterministic per-basket cap bounds the quadratic: only the
# _QD6_MAX_BASKET lowest part keys per order contribute pairs — the
# cap is IN THE ORACLE TOO (rn <= N over the same total order), so the
# contract stays hash-exact, and a no-op at TPC-H shapes.

_QD6_MAX_BASKET = 50

_QD6_ORACLE = f"""
WITH items AS (
  SELECT l_orderkey, l_partkey FROM (
    SELECT l_orderkey, l_partkey,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY l_partkey) AS rn
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
  WHERE rn <= {_QD6_MAX_BASKET}
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_baskets
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= 2
ORDER BY n_baskets DESC, part_a, part_b
LIMIT 20
"""


def qd6_basket_pair_counts(items: DataFrame, max_basket: int) -> DataFrame:
    """(part_a, part_b, n_baskets) over distinct (l_orderkey,
    l_partkey) items, quadratic bounded by ``max_basket`` (lowest part
    keys win — deterministic, engine-replayable). ``items`` need NOT
    be pre-deduplicated: collect_set dedups per basket (so callers
    must not pay a distinct exchange of their own — ADVICE r19)."""
    # ONE basket aggregate + map-side pair generation (r19, guide
    # §2.3/§2.4): the old spelling paid a distinct exchange, a
    # row_number window exchange+sort, and a self-join to enumerate
    # pairs.  collect_set folds the distinct INTO the basket groupBy
    # (one combiner-friendly shuffle); the capped sorted basket and its
    # i<j pairs are then pure array expressions — sort_array + slice is
    # exactly the "lowest max_basket part keys" rule, and enumerating
    # j>i positions reproduces the part_a < part_b self-join pair set
    # element for element.  The pair aggregate is unchanged.
    baskets = items.groupBy("l_orderkey").agg(
        F.slice(
            F.sort_array(F.collect_set("l_partkey")), 1, max_basket
        ).alias("__parts")
    )
    arr = F.col("__parts")
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.greatest(F.size(arr), F.lit(1))),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("__p"))
        .select("__p.part_a", "__p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )


@register("qd6_basket_pairs", oracle=_QD6_ORACLE, tags=("J1", "O2", "A8"))
def qd6_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # no .distinct() (ADVICE r19): collect_set inside
    # qd6_basket_pair_counts already dedups per basket, so the
    # caller-side distinct was a second full exchange for nothing
    items = li.select("l_orderkey", "l_partkey")
    return (
        qd6_basket_pair_counts(items, _QD6_MAX_BASKET)
        .filter(F.col("n_baskets") >= 2)
        .orderBy(F.col("n_baskets").desc(), "part_a", "part_b")
        .limit(20)
    )


# --- qd7: inter-order gap histogram -----------------------------------------
# Purchase-cadence distribution: days between a customer's consecutive
# orders, bucketed to 30-day bins capped at 360+. One window shuffle on
# custkey (natural key), then a ≤13-group aggregate — the DS "recency
# distribution" report with no global sort anywhere.

_QD7_ORACLE = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
           lag(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap_days
  FROM orders
)
SELECT least(CAST(floor(gap_days / 30) AS BIGINT), 12) AS gap_bucket,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_days) AS BIGINT) AS min_days,
       CAST(max(gap_days) AS BIGINT) AS max_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


@register("qd7_order_gap_histogram", oracle=_QD7_ORACLE, tags=("W2", "A1", "F2"))
def qd7_order_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy(
            F.least(
                F.floor(F.col("gap_days") / 30), F.lit(12)
            ).alias("gap_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").cast("long").alias("min_days"),
            F.max("gap_days").cast("long").alias("max_days"),
        )
        .orderBy("gap_bucket")
    )


# --- qd8: exact percentile report per segment -------------------------------
# p50/p90/p99 of order value per market segment with EXACT DISCRETE
# percentiles (DuckDB `quantile_disc`; Spark spelled as the same
# inverse-CDF rule — the element at rank ceil(p·n) of the sorted
# group). Discrete, not interpolated, on purpose: cent-valued data
# makes interpolated midpoints land on half-cent boundaries where the
# two engines' rounding direction can differ by one ulp (measured:
# p50 251483.295 → .29 vs .30); discrete quantiles return actual data
# values, so no rounding is involved at all. Ranks come from the
# chunked distinct-value machinery (operators/skew.py) — no window on
# the 5-value segment key alone; the approx sketch tier for 100 TB
# group explosions is a5's approx_percentile.

_QD8_ORACLE = """
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_orders,
       quantile_disc(o.o_totalprice, 0.5)  AS p50,
       quantile_disc(o.o_totalprice, 0.9)  AS p90,
       quantile_disc(o.o_totalprice, 0.99) AS p99
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


@register("qd8_percentile_report", oracle=_QD8_ORACLE, tags=("A3", "J5", "W1"))
def qd8_percentile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # no customer broadcast hint (r18) — same rationale as qd2
    seg = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"), "o_totalprice"
    )
    return (
        discrete_percentiles(
            seg, "segment", "o_totalprice", {"p50": 0.5, "p90": 0.9, "p99": 0.99}
        )
        .withColumnRenamed("n_rows", "n_orders")
        .select("segment", "n_orders", "p50", "p90", "p99")
        .orderBy("segment")
    )


def discrete_percentiles(
    df: DataFrame, key_col: str, value_col: str, ps: dict[str, float]
) -> DataFrame:
    """Exact DISCRETE per-key quantiles: for each (alias, p) in ``ps``
    the element at 1-indexed rank ceil(p*n) of the key's sorted values
    — DuckDB quantile_disc's inverse-CDF rule (probed empirically;
    property-pinned against it in tests/test_properties.py). Output:
    (key_col, n_rows, *aliases); ties in ``value_col`` are harmless
    (any tied row yields the same value).

    Spelled on chunked_discrete_percentiles (operators/skew.py), NOT
    a ``Window.partitionBy(key_col)`` over the raw frame: qd8's key
    is the 5-value market segment, so a key-partitioned window would
    funnel ~1/5 of all orders through one task at 100 TB (r10 verdict
    #2 — the repo-wide rule against full-granularity windows on
    low-cardinality keys). Every window here is (key, chunk)-
    partitioned and key-alone shuffles carry only the distinct-value
    frame."""
    from ..operators.skew import chunked_discrete_percentiles

    return chunked_discrete_percentiles(df, key_col, value_col, ps)


# --- QD9: ordered funnel analysis over the events stream --------------------
# The product-analytics staple: how many users progressed
# signup -> view -> click -> purchase IN TIME ORDER (each stage's
# event strictly after the user's previous-stage arrival, first
# qualifying arrival wins). Sequential semantics respelled as a chain
# of per-user conditional MIN aggregates — each stage is one
# events-scan filter + one groupBy(user_id) + a co-partitioned join
# with the previous stage's (user_id, t) frame, so every shuffle is on
# user_id and AQE coalesces the four stages onto one exchange
# lineage; nothing is ever globally sorted and no per-user event
# arrays are collected (contrast the sessionize-then-scan-per-user
# spelling, which shuffles whole event lists). The conversion window
# runs over the 4-row stage frame. Counts and basis points only —
# integer-exact both engines.

_QD9_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'view' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
stages AS (
  SELECT 1 AS stage, 'signup' AS stage_name, CAST(count(*) AS BIGINT) AS n_users FROM s1
  UNION ALL SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM s2
  UNION ALL SELECT 3, 'click', CAST(count(*) AS BIGINT) FROM s3
  UNION ALL SELECT 4, 'purchase', CAST(count(*) AS BIGINT) FROM s4
)
SELECT stage, stage_name, n_users,
       n_users * 10000
         // nullif(lag(n_users, 1, n_users) OVER (ORDER BY stage), 0)
         AS conv_bp
FROM stages ORDER BY stage
"""


def funnel_stages(ev: DataFrame, funnel: list[str]) -> DataFrame:
    """(stage, stage_name, n_users, conv_bp) for an ordered funnel over
    an (user_id, event_type, ts) frame — qd9's engine; each stage's
    arrival must be strictly after the user's previous-stage arrival
    (first qualifying arrival wins)."""
    ev = ev.select("user_id", "event_type", "ts")
    # one projection feeds every stage scan; pin cleared by the
    # harness (bench.py / driver_sim clearCache)
    ev.cache()

    prev = None
    stages = None
    for i, name in enumerate(funnel, 1):
        e = ev.filter(F.col("event_type") == name)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col("t"))
        # localCheckpoint per stage (r19, the x46/x31 lineage rule):
        # stage i's frame feeds BOTH stage i+1's join and its own count
        # row, and the count rows union into one action — uncheckpointed,
        # stage 1 re-ran once per later stage (1+2+3+4 = 10 stage
        # evaluations instead of 4; exchange reuse only recovered part
        # of it).  The checkpointed frame is the bounded per-user
        # (user_id, t) aggregate, never raw events.
        prev = (
            e.groupBy("user_id").agg(F.min("ts").alias("t")).localCheckpoint()
        )
        row = prev.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("stage"),
            F.lit(name).alias("stage_name"),
            F.col("n_users"),
        )
        stages = row if stages is None else stages.unionByName(row)
    # conversion vs the previous stage — a window over the |funnel|-row
    # frame. nullif: a dead stage (0 users) makes the NEXT stage's
    # conversion undefined (NULL), not an ANSI DIVIDE_BY_ZERO abort.
    return stages.withColumn(
        "conv_bp",
        F.expr(
            "n_users * 10000L div nullif(lag(n_users, 1, n_users) "
            "OVER (ORDER BY stage), 0)"
        ),
    ).orderBy("stage")


@register("qd9_funnel_analysis", oracle=_QD9_ORACLE, tags=("A1", "J1", "W2"))
def qd9_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return funnel_stages(ev, ["signup", "view", "click", "purchase"])


# --- QD10: RFM customer segmentation ----------------------------------------
# The classic lifecycle-marketing cut: score every customer on Recency
# (days since last order, lower is better), Frequency (order count)
# and Monetary (lifetime cents), quintile each score, and report the
# 3-digit segments. The quintile assignment uses percent_rank — but
# through chunked_percent_ranks (the x37/x43 machinery, fourth use):
# a naive row_number/ntile over all customers is a single-task global
# sort at 100 TB, exactly the funnel the respell removes. Monetary is
# integer cents; quintiles come from floor(pr*5) on the identical
# double pr both engines derive (constant partition column — the
# machinery's windows key on (part, sig, chunk), never one task).
# Recency is inverted (most recent = 5) per RFM convention.

_QD10_ORACLE = """
WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', max(o_orderdate), (SELECT mx FROM anchor))
              AS BIGINT) AS r_days,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS mon_cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT *,
         percent_rank() OVER (ORDER BY r_days)    AS pr_r,
         percent_rank() OVER (ORDER BY freq)      AS pr_f,
         percent_rank() OVER (ORDER BY mon_cents) AS pr_m
  FROM cust
),
scored AS (
  SELECT o_custkey, mon_cents,
         5 - least(CAST(floor(pr_r * 5) AS BIGINT), 4) AS r_q,
         least(CAST(floor(pr_f * 5) AS BIGINT), 4) + 1 AS f_q,
         least(CAST(floor(pr_m * 5) AS BIGINT), 4) + 1 AS m_q
  FROM ranked
)
SELECT CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(mon_cents) AS BIGINT) AS seg_cents
FROM scored
GROUP BY r_q, f_q, m_q
ORDER BY segment
"""


@register("qd10_rfm_segmentation", oracle=_QD10_ORACLE, tags=("A1", "W1", "F2"))
def qd10_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import chunked_percent_ranks

    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("mon_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("mx", "last_order").cast("long").alias("r_days"),
            "freq",
            "mon_cents",
        )
        .withColumn("__all", F.lit("all"))
    )
    # cached: the rank machinery consumes cust three ways (its eager
    # approxQuantile pass, the explode/groupBy pipeline, the offsets
    # collect) — uncached, the orders aggregation re-runs each time.
    # mon_cents rides through id_cols (unique per o_custkey) so no
    # re-join against a fourth derivation is needed (review finding).
    # Pin cleared by the harness (bench.py / driver_sim clearCache).
    cust = cust.cache()
    ranked = chunked_percent_ranks(
        cust,
        part_col="__all",
        value_cols=["r_days", "freq", "mon_cents"],
        id_cols=["o_custkey", "mon_cents"],
    )
    scored = ranked.select(
        "o_custkey",
        "mon_cents",
        (5 - F.least(F.floor(F.col("pr_r_days") * 5), F.lit(4))).alias("r_q"),
        (F.least(F.floor(F.col("pr_freq") * 5), F.lit(4)) + 1).alias("f_q"),
        (F.least(F.floor(F.col("pr_mon_cents") * 5), F.lit(4)) + 1).alias(
            "m_q"
        ),
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("mon_cents").alias("seg_cents"),
        )
        .select(
            (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
            .cast("long")
            .alias("segment"),
            "n_customers",
            "seg_cents",
        )
        .orderBy("segment")
    )


# --- QD11: last-touch attribution via as-of join ----------------------------
# Marketing attribution's core primitive: credit each purchase to the
# user's most recent preceding 'view', then roll revenue up by the
# view's channel. The temporal join is the repo's own as-of operator
# (operators/asof.py — one shuffle on user_id + a partition-local
# carry window, never a range crossJoin), composed with F7 JSON
# extraction for the channel and oracled against DuckDB's NATIVE
# ASOF LEFT JOIN — two independent as-of implementations agreeing on
# every credited (purchase, view) pair. Unattributed purchases (no
# prior view) keep channel -1 — the honest "direct" bucket. The
# right side is deduped to one row per (user_id, ts) with max()
# (as-of tie rule must be deterministic on both engines); attribution
# lag is integer seconds.

_QD11_ORACLE = """
WITH views AS (
  SELECT user_id, ts,
         max(CAST(json_extract(props, '$.k') AS BIGINT) % 5) AS channel
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
),
purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
attributed AS (
  SELECT p.user_id, p.value,
         coalesce(v.channel, -1) AS channel,
         CASE WHEN v.ts IS NULL THEN NULL
              ELSE CAST(date_diff('second', v.ts, p.ts) AS BIGINT)
         END AS lag_s
  FROM purchases p
  ASOF LEFT JOIN views v
    ON p.user_id = v.user_id AND v.ts <= p.ts
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST((2 * sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                          AS BIGINT)) + 100)
            // 200 AS DOUBLE) / 10000.0 AS revenue,
       CAST(sum(lag_s) AS BIGINT) AS total_lag_s
FROM attributed
GROUP BY channel ORDER BY channel
"""


@register("qd11_lasttouch_attribution", oracle=_QD11_ORACLE, tags=("J8", "F7", "A1"))
def qd11_lasttouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max(
                F.get_json_object("props", "$.k").cast("bigint") % 5
            ).alias("channel")
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["channel"],
    )
    attributed = joined.select(
        F.coalesce("channel_right", F.lit(-1)).alias("channel"),
        "value",
        F.when(
            F.col("ts_right").isNotNull(),
            (
                F.unix_timestamp("ts") - F.unix_timestamp("ts_right")
            ).cast("long"),
        ).alias("lag_s"),
    )
    # integer-micro revenue (review-pass r18, the qd4 ppm rule): the
    # old round(cast(decimal-sum as double), 4) rounded an EXACT
    # 6-decimal rational — tie-capable at digits 5-6 = '50', where the
    # engines' rounding modes split.  The decimal(18,6) cast is the
    # (consistent) quantizer; micros sum exactly (values positive,
    # min 0.01 — probed r18, so no sign branch); round4(S/1e6) =
    # (2S + 100) div 200, one identical IEEE divide at the end.
    return (
        attributed.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1000000).cast("long")
            ).alias("s6"),
            F.sum("lag_s").alias("total_lag_s"),
        )
        .select(
            "channel",
            "n_purchases",
            F.expr(
                "CAST((2 * s6 + 100) div 200 AS DOUBLE) / 10000.0"
            ).alias("revenue"),
            "total_lag_s",
        )
        .orderBy("channel")
    )
