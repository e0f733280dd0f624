"""D1-D7: the Python UDF/UDAF/UDTF surface (SURVEY.md §2.10).

Ordering of preference at scale (documented per query):
  built-in JVM expression  >  Arrow-batched pandas UDF  >  row Python UDF.
Every UDF here computes something a built-in could also express, so the
DuckDB oracle states the same arithmetic in SQL — the *transport* (Arrow
batches, grouped maps, table functions) is what's under test.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import register
from ..tables import load_table

# --- D2: scalar pandas UDF (Arrow-vectorized Series→Series) ----------------

_D2_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  ((CAST(round(l_extendedprice * 100) AS BIGINT)
    * (100 - CAST(round(l_discount * 100) AS BIGINT))
    * (100 + CAST(round(l_tax * 100) AS BIGINT))
    + 5000) // 10000) / 100.0 AS charged
FROM lineitem
WHERE l_orderkey % 29 = 0
ORDER BY l_orderkey, l_linenumber
"""


@register("d2_scalar_pandas_udf", oracle=_D2_ORACLE, tags=("D2",))
def d2_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series→Series pandas UDF: whole Arrow batches cross the Python
    boundary once; numpy does the arithmetic vectorized. (A built-in
    expression is still faster — this query exists to prove the D2
    transport; see SURVEY.md §2.10.)

    r14 integer-cents respell: the r14 sf0.1 oracle sweep found 22
    rows whose exact charge is a TRUE half-cent tie (e.g.
    8835560.5 c) — the double product sits one ulp BELOW .xx5, so
    Spark's round (exact binary value, HALF_UP) rounds down while
    DuckDB rounds up: round(double, 2) of a per-row PRODUCT is a
    per-row tie lottery that sf0.01 happened to win. price/disc/tax
    are cent- and percent-valued, so the product in cents*1e-4 is an
    exact int64 (= 1.1e11 max); half-up in integer arithmetic
    ((x + 5000) div 10000) and a final exact /100.0 make both engines
    bit-identical at EVERY scale — verified 296/296 at sf0.1. The UDF
    still carries the D2 Arrow transport, now returning the integer
    product."""

    @pandas_udf("long")
    def charge_e4(
        price: pd.Series, disc: pd.Series, tax: pd.Series
    ) -> pd.Series:
        # cents * 1e-4 units, exact: inputs are 2-decimal fixtures, so
        # rint(x*100) recovers the integer numerator exactly
        import numpy as np

        pc = np.rint(price.to_numpy() * 100).astype("int64")
        dc = np.rint(disc.to_numpy() * 100).astype("int64")
        tc = np.rint(tax.to_numpy() * 100).astype("int64")
        return pd.Series(pc * (100 - dc) * (100 + tc))

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 29 == 0)
        .withColumn(
            "__e4",
            charge_e4("l_extendedprice", "l_discount", "l_tax"),
        )
        # integer half-up to cents (bigint `div`, never floor-a-double),
        # then exact display division — identical IEEE op both engines
        .selectExpr(
            "l_orderkey",
            "l_linenumber",
            # 100.0D: Spark parses a bare 100.0 as DECIMAL(4,1) and the
            # division would come back decimal(26,6), not double
            "((__e4 + 5000) div 10000) / 100.0D AS charged",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- D3: grouped-aggregate pandas UDF (UDAF) -------------------------------

_D3_ORACLE = """
SELECT
  l_returnflag,
  CAST((200 * sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                  * CAST(l_quantity AS HUGEINT))
        + sum(CAST(l_quantity AS HUGEINT)))
       // (2 * sum(CAST(l_quantity AS HUGEINT))) AS DOUBLE) / 10000
    AS wavg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("d3_grouped_agg_udaf", oracle=_D3_ORACLE, tags=("D3",))
def d3_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price as a grouped-agg pandas UDF —
    the custom-UDAF shape (Arrow per group).

    Integer-exact inside the UDF (review-pass r17, the d2 rule): the
    old float64 (qty*price).sum() accumulated in shuffle-arrival order
    and Python round() is half-even on the binary value where DuckDB
    rounds its own differently-ordered sum — the flag-'R' group sits
    6.9e-6 from a 4th-decimal boundary at sf0.01, a regen lottery.
    Prices recover their exact integer cents via rint(x*100),
    quantities are integral, so N = Σ q·pc and D = Σ q are exact and
    order-free; round-half-up = (200·N + D) div (2·D), and the display
    /10000 is one identical IEEE divide in both engines."""

    @pandas_udf("double")
    def wavg(qty: pd.Series, price: pd.Series) -> float:
        import numpy as np

        q = np.rint(qty.to_numpy()).astype("int64")
        pc = np.rint(price.to_numpy() * 100).astype("int64")
        num = int((q * pc).sum())
        den = int(q.sum())
        return float(((200 * num + den) // (2 * den)) / 10000.0)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(wavg("l_quantity", "l_extendedprice").alias("wavg_price"))
        .orderBy("l_returnflag")
    )


# --- D4: grouped-map applyInPandas -----------------------------------------

_D4_ORACLE = """
SELECT c_mktsegment, c_custkey,
       CAST(CASE WHEN m >= 0 THEN (2*m + n) // (2*n)
                 ELSE -((-2*m + n) // (2*n)) END AS DOUBLE) / 100
         AS bal_delta
FROM (
  SELECT c_mktsegment, c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) * n - s AS m, n
  FROM (
    SELECT c_mktsegment, c_custkey, c_acctbal,
           sum(CAST(round(c_acctbal * 100) AS BIGINT))
             OVER (PARTITION BY c_mktsegment) AS s,
           count(*) OVER (PARTITION BY c_mktsegment) AS n
    FROM customer
  )
)
WHERE c_custkey % 13 = 0
ORDER BY c_mktsegment, c_custkey
"""


@register("d4_grouped_map", oracle=_D4_ORACLE, tags=("D4",))
def d4_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment mean-centering via applyInPandas: each group arrives
    as one pandas frame (the grouped-map contract). Groups must fit in
    executor memory — at 100 TB, key on something bounded (here: 5
    segments is wrong for real data; fine as the D4 mechanics demo —
    the window-function formulation in the oracle is the scale path).

    Integer-exact centering (review-pass r17, the d2 rule): the old
    round(bal - mean, 2) had a GROUP-level tie hazard — when a
    segment's 2·sum_cents is divisible by n with a half-integer
    quotient, EVERY cell of the segment lands on an exact half-cent
    simultaneously, and pandas' half-even rint splits against DuckDB's
    half-away round (~1-2% of fixture regens). The delta is the exact
    rational (bal_cents·n − S)/n; round-half-away in integers is
    sign-factored (2m + n) div (2n), and the /100 display is one
    identical IEEE divide."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cents = np.rint(pdf["c_acctbal"].to_numpy() * 100).astype("int64")
        n = len(cents)
        s = int(cents.sum())
        m = cents * n - s
        mag = (2 * np.abs(m) + n) // (2 * n)
        out = pdf[["c_mktsegment", "c_custkey"]].copy()
        out["bal_delta"] = np.where(m >= 0, mag, -mag) / 100.0
        return out

    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .applyInPandas(center, "c_mktsegment string, c_custkey bigint, bal_delta double")
        .filter(F.col("c_custkey") % 13 == 0)
        .orderBy("c_mktsegment", "c_custkey")
    )


# --- D5: mapInPandas (partition-stream transform) --------------------------

_D5_ORACLE = """
SELECT p_partkey, p_brand, cast(length(p_name) AS INTEGER) AS name_len
FROM part
WHERE p_size >= 40
ORDER BY p_partkey
"""


@register("d5_map_in_pandas", oracle=_D5_ORACLE, tags=("D5",))
def d5_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: iterator of Arrow batches in, iterator out — the
    shape for per-partition Python transforms (model inference, codec
    work). Filter is applied inside Python to prove rows can be
    added/removed, not just mapped 1:1."""

    def project(batches):
        for pdf in batches:
            keep = pdf[pdf["p_size"] >= 40]
            yield pd.DataFrame(
                {
                    "p_partkey": keep["p_partkey"],
                    "p_brand": keep["p_brand"],
                    "name_len": keep["p_name"].str.len().astype("int32"),
                }
            )

    p = load_table(spark, sf_dir, "part")
    return p.mapInPandas(
        project, "p_partkey bigint, p_brand string, name_len int"
    ).orderBy("p_partkey")


# --- D6: Python UDTF (Spark 3.5+) ------------------------------------------

_D6_ORACLE = """
SELECT r_regionkey, unnest(generate_series(0, r_regionkey)) AS i
FROM region
ORDER BY r_regionkey, i
"""


@register("d6_python_udtf", oracle=_D6_ORACLE, tags=("D6",))
def d6_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A table function expanding each region key k into rows 0..k."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="i int")
    class Expand:
        def eval(self, k: int):
            for i in range(k + 1):
                yield (i,)

    spark.udtf.register("expand_range", Expand)
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_v")
    return spark.sql(
        """
        SELECT r.r_regionkey, t.i
        FROM region_v r, LATERAL expand_range(r.r_regionkey) t
        ORDER BY r.r_regionkey, t.i
        """
    )


# --- D1/D7: row Python UDF + SQL registration ------------------------------

_D7_ORACLE = """
SELECT s_suppkey, concat('S', lpad(cast(s_suppkey AS VARCHAR), 6, '0')) AS supp_code
FROM supplier
ORDER BY s_suppkey
"""


@register("d7_sql_registered_udf", oracle=_D7_ORACLE, tags=("D1", "D7"))
def d7_sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF registered for SQL use (D1+D7). The slow
    path by design — documented last resort; everything it does here is
    one built-in expression."""

    def supp_code(k: int) -> str:
        return f"S{k:06d}"

    spark.udf.register("supp_code", supp_code, "string")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_v")
    return spark.sql(
        "SELECT s_suppkey, supp_code(s_suppkey) AS supp_code "
        "FROM supplier_v ORDER BY s_suppkey"
    )


# --- D1: standalone row Python UDF (DataFrame API) --------------------------

_D1_ORACLE = """
SELECT
  s_suppkey,
  CASE
    WHEN s_acctbal < 0 THEN 'debt'
    WHEN s_acctbal < 5000 THEN 'low'
    ELSE 'high'
  END AS bal_band
FROM supplier
ORDER BY s_suppkey
"""


@register("d1_python_udf", oracle=_D1_ORACLE, tags=("D1",))
def d1_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone row-at-a-time ``F.udf`` via the DataFrame API (SURVEY
    §2.10 D1) — distinct from d7's ``spark.udf.register`` SQL route.
    This is the measured last resort: each row crosses the Python
    boundary individually (pickled, no Arrow batching); the oracle's
    CASE expression is what production code should use. Exists to prove
    the D1 transport end-to-end, nothing more."""

    # No type hints on purpose: annotations make F.udf attempt pandas
    # eval-type inference and warn; this is explicitly the row-wise path.
    @F.udf("string")
    def bal_band(bal):
        if bal < 0:
            return "debt"
        return "low" if bal < 5000 else "high"

    s = load_table(spark, sf_dir, "supplier")
    return s.select("s_suppkey", bal_band("s_acctbal").alias("bal_band")).orderBy(
        "s_suppkey"
    )


# --- D5b: mapInArrow (raw Arrow RecordBatch surface) ------------------------

_D5B_ORACLE = """
SELECT l_orderkey, cast(l_quantity * 2 AS DOUBLE) AS qty2
FROM lineitem
WHERE l_orderkey % 53 = 0
ORDER BY l_orderkey, qty2
"""


@register("d5b_map_in_arrow", oracle=_D5B_ORACLE, tags=("D5",))
def d5b_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy-est Python surface — RecordBatch in,
    RecordBatch out, no pandas materialization. The shape for codec/
    tokenizer libraries that speak Arrow natively."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def double_qty(batches):
        for batch in batches:
            t = pa.table(
                {
                    "l_orderkey": batch.column("l_orderkey"),
                    "qty2": pc.multiply(
                        pc.cast(batch.column("l_quantity"), pa.float64()), 2.0
                    ),
                }
            )
            for out in t.to_batches():
                yield out

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 53 == 0)
    return (
        li.select("l_orderkey", "l_quantity")
        .mapInArrow(double_qty, "l_orderkey bigint, qty2 double")
        .orderBy("l_orderkey", "qty2")
    )


# --- D8: SQL scalar UDF (CREATE FUNCTION ... RETURN expr, SPARK-46246) ------
# A function DEFINED in SQL: the body is an expression Catalyst inlines
# into the calling plan, so unlike every Python UDF surface (d1/d2)
# there is no serialization boundary at all — it codegens with the
# query. The scale-preferred way to share business formulas.

_D8_ORACLE = """
SELECT
  l_returnflag,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS disc_revenue
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("d8_sql_scalar_function", oracle=_D8_ORACLE, tags=("D8", "D7"))
def d8_sql_scalar_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_d8"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION d8_disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(d8_disc_price(l_extendedprice, l_discount)), 2)
                 AS disc_revenue
        FROM lineitem_d8
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


# --- D9: SQL table function (RETURNS TABLE) ---------------------------------
# The SQL twin of d6's Python UDTF: a parameterized view whose body is
# planned, inlined, and optimized with the outer query (predicate
# pushdown crosses the function boundary — it is not a materialization).

_D9_ORACLE = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_big
FROM lineitem
WHERE l_quantity >= 48
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("d9_sql_table_function", oracle=_D9_ORACLE, tags=("D9", "D6"))
def d9_sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_d9"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION d9_big_lines(minq DOUBLE) "
        "RETURNS TABLE(l_returnflag STRING) "
        "RETURN SELECT l_returnflag FROM lineitem_d9 WHERE l_quantity >= minq"
    )
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n_big
        FROM d9_big_lines(48)
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


# --- D10: Arrow-optimized Python scalar UDF (SPARK-40307) -------------------
# Third UDF transport: row-at-a-time SEMANTICS (like d1) over Arrow
# BATCH serialization (like d2) — `useArrow=True` keeps per-row Python
# functions but drops pickle's per-row cost. Still the measured-last-
# resort vs built-ins; the right choice when logic is genuinely
# per-row Python and pandas vectorization doesn't apply. Rounding done
# Spark-side (d2's lesson: Python-side rounding is half-even).

_D10_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(round(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)), 2)
       AS DOUBLE)                                AS net_price
FROM lineitem
WHERE l_orderkey % 97 = 0
ORDER BY l_orderkey, l_linenumber
"""


@register("d10_arrow_python_udf", oracle=_D10_ORACLE, tags=("D10", "D1"))
def d10_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("double", useArrow=True)
    def net(price: float, disc: float) -> float:
        return price * (1.0 - disc)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 97 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            # p1's lesson: rounding the raw double is not cross-engine
            # stable on .xx5 ties — hop through DECIMAL (exact, ties
            # round half-away in both engines), end at DOUBLE
            F.round(
                net("l_extendedprice", "l_discount").cast("decimal(18,6)"), 2
            )
            .cast("double")
            .alias("net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- D11: polymorphic Python UDTF (Spark 4 analyze()) -----------------------
# Spark 4 UDTFs can compute their OUTPUT SCHEMA at plan time from the
# call's arguments (static analyze(), SPARK-44503) — the table-function
# analog of a macro: one registration serves every arity. Exercised as
# split_first_words(text, n): the n literal becomes n output columns
# w0..w{n-1} at analysis, the generator fills them per row. Value-
# oracled via split_part — schema shape AND cell values both checked.
# Scale shape: per-row generator over Arrow batches like any UDTF; the
# schema work happens ONCE on the driver at plan time, not per row.

_D11_ORACLE = """
SELECT doc_id,
       split_part(text, ' ', 1) AS w0,
       split_part(text, ' ', 2) AS w1,
       split_part(text, ' ', 3) AS w2
FROM documents
WHERE doc_id % 29 = 0
ORDER BY doc_id
"""


@register("d11_polymorphic_udtf", oracle=_D11_ORACLE, tags=("D11", "D6"))
def d11_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitFirstWords:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            if not n.isConstantExpression:
                raise ValueError("n must be a constant literal")
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"w{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            toks = (text or "").split(" ")
            yield tuple(
                toks[i] if i < len(toks) else "" for i in range(n)
            )

    spark.udtf.register("split_first_words", SplitFirstWords)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 29 == 0
    ).createOrReplaceTempView("docs_d11")
    out = spark.sql(
        """
        SELECT d.doc_id, t.w0, t.w1, t.w2
        FROM docs_d11 d, LATERAL split_first_words(d.text, 3) t
        ORDER BY d.doc_id
        """
    )
    if out.columns != ["doc_id", "w0", "w1", "w2"]:
        raise AssertionError(f"analyze-derived schema wrong: {out.columns}")
    return out


# --- D12: UDTF over a TABLE argument with PARTITION BY / ORDER BY -----------
# The Spark 4 table-function shape for CUSTOM PER-GROUP algorithms:
# `f(TABLE(q) PARTITION BY k ORDER BY ts)` streams each partition's
# rows (in order) through one UDTF instance — eval() accumulates,
# terminate() emits — i.e. a user-defined aggregate over whole rows
# with ordering, which neither a UDAF (unordered) nor a window
# (per-row output) expresses directly. Exercised as a session-gap
# profiler per user; value-oracled against the lag-window SQL twin.
# Scale shape: partitions distribute across executors like any
# hash-partitioned exchange; state is one accumulator per group.

_D12_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch(ts) - epoch(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts)) AS gap
  FROM events WHERE user_id % 11 = 0
)
SELECT user_id,
       CAST(count(*) AS INTEGER)          AS n,
       round(coalesce(max(gap), 0.0), 1)  AS max_gap_s
FROM g GROUP BY user_id ORDER BY user_id
"""


@register("d12_table_arg_udtf", oracle=_D12_ORACLE, tags=("D12", "D6", "D3"))
def d12_table_arg_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Row
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n int, max_gap_s double")
    class GapStats:
        def __init__(self):
            self.prev = None
            self.uid = None
            self.n = 0
            self.max_gap = 0.0

        def eval(self, row: Row):
            self.uid = row["user_id"]
            self.n += 1
            # pin the naive datetime to UTC before .timestamp()
            # (review-pass r17): bare .timestamp() interprets a naive
            # value in the HOST timezone — constant offsets cancel in
            # gaps, but a pair straddling a DST transition (or landing
            # in a nonexistent local hour) under TZ=America/New_York
            # would shift the gap ±3600s vs the oracle's epoch diff
            import datetime as _dt

            t = row["ts"].replace(tzinfo=_dt.timezone.utc).timestamp()
            if self.prev is not None:
                self.max_gap = max(self.max_gap, t - self.prev)
            self.prev = t

        def terminate(self):
            if self.uid is not None:
                yield (self.uid, self.n, round(self.max_gap, 1))

    spark.udtf.register("gap_stats_d12", GapStats)
    load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 11 == 0
    ).createOrReplaceTempView("events_d12")
    return spark.sql(
        """
        SELECT * FROM gap_stats_d12(
          TABLE(SELECT user_id, ts FROM events_d12)
          PARTITION BY user_id ORDER BY ts)
        ORDER BY user_id
        """
    )
