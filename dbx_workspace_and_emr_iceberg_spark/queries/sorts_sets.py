"""O1-O4 sorts/limits and U1-U4 set operations (SURVEY.md §2.6-2.7).

Scale notes: a global sort (O1) is a range-partitioned shuffle — Spark
samples key ranges so output partitions are balanced; sort+limit (O2)
becomes TakeOrderedAndProject, which keeps only k rows per partition and
never materializes the full sort — the right top-k at any scale. Set ops
with DISTINCT semantics (U1b/U2/U3) each cost a shuffle on the full row;
at 100 TB prefer keyed dropDuplicates (U4) over row-level DISTINCT.

Determinism discipline: every ORDER BY ends in a unique key so ties
cannot reorder across engines, and LIMIT/OFFSET windows are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# --- O1: global multi-key sort with null placement -------------------------

_O1_ORACLE = """
SELECT
  c_custkey,
  c_mktsegment,
  CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal_or_null
FROM customer
ORDER BY bal_or_null DESC NULLS LAST, c_mktsegment ASC, c_custkey ASC
"""


@register("o1_global_sort", oracle=_O1_ORACLE, tags=("O1",))
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.round("c_acctbal", 2))
        .alias("bal_or_null"),
    ).orderBy(
        F.col("bal_or_null").desc_nulls_last(),
        F.col("c_mktsegment").asc(),
        F.col("c_custkey").asc(),
    )


# --- O2: top-k (sort + limit → TakeOrderedAndProject) ----------------------

_O2_ORACLE = """
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@register("o2_topk", oracle=_O2_ORACLE, tags=("O2",))
def o2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# --- O3: OFFSET ------------------------------------------------------------

_O3_ORACLE = """
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 15
"""


@register("o3_offset", oracle=_O3_ORACLE, tags=("O3",))
def o3_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(15)
        .limit(10)
    )


# --- O4: partition-local sort (write-ordering primitive; self-verifying) ---


_O4_ORACLE = """
SELECT CAST(8 AS BIGINT) AS n_partitions,
       CAST(8 AS BIGINT) AS n_sorted,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
"""


@register("o4_sort_within_partitions", oracle=_O4_ORACLE, tags=("O4",))
def o4_sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions is the write-ordering tool (cluster data
    files by key for row-group skipping without a global shuffle).
    Per-partition sortedness is checked ACROSS Arrow batch boundaries
    (the mapInPandas iterator spans one whole partition; a per-batch
    monotonic check alone would miss a break between batches — r11
    hardening) and emits exactly one row per partition, so with a
    pinned repartition(8) the summary is fully value-ORACLED: 8
    partitions, 8 sorted, fixture row count."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    local = li.repartition(8, "l_orderkey").sortWithinPartitions("l_shipdate")

    def check(it):
        import pandas as pd

        ok, n, last = True, 0, None
        for pdf in it:
            if not len(pdf):
                continue
            s = pdf["l_shipdate"]
            if not s.is_monotonic_increasing:
                ok = False
            if last is not None and s.iloc[0] < last:
                ok = False  # breakage hidden between Arrow batches
            last = s.iloc[-1]
            n += len(pdf)
        yield pd.DataFrame({"partition_sorted": [bool(ok)], "rows": [n]})

    per_part = local.mapInPandas(
        check, "partition_sorted boolean, rows long"
    )
    out = per_part.agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum(F.col("partition_sorted").cast("long")).alias("n_sorted"),
        F.sum("rows").alias("n_rows"),
    ).first()
    if out.n_sorted != out.n_partitions:
        raise AssertionError(
            f"{out.n_partitions - out.n_sorted} partitions not locally sorted"
        )
    return spark.createDataFrame(
        [(out.n_partitions, out.n_sorted, out.n_rows)],
        "n_partitions long, n_sorted long, n_rows long",
    )


# --- U1: UNION ALL + UNION DISTINCT ----------------------------------------

_U1_ORACLE = """
SELECT cast(x AS BIGINT) AS custkey, src FROM (
  SELECT o_custkey AS x, 'orders' AS src FROM orders WHERE o_totalprice > 350000
  UNION ALL
  SELECT c_custkey AS x, 'topbal' AS src FROM customer WHERE c_acctbal > 9000
)
"""


@register("u1_union_all", oracle=_U1_ORACLE, tags=("U1",))
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    left = o.filter(F.col("o_totalprice") > 350000).select(
        F.col("o_custkey").cast("bigint").alias("custkey"), F.lit("orders").alias("src")
    )
    right = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").cast("bigint").alias("custkey"), F.lit("topbal").alias("src")
    )
    return left.unionByName(right)


_U1B_ORACLE = """
SELECT cast(x AS BIGINT) AS custkey FROM (
  SELECT o_custkey AS x FROM orders WHERE o_totalprice > 350000
  UNION
  SELECT c_custkey AS x FROM customer WHERE c_acctbal > 9000
)
"""


@register("u1b_union_distinct", oracle=_U1B_ORACLE, tags=("U1",))
def u1b_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    left = o.filter(F.col("o_totalprice") > 350000).select(
        F.col("o_custkey").cast("bigint").alias("custkey")
    )
    right = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").cast("bigint").alias("custkey")
    )
    return left.unionByName(right).distinct()


# --- U2: INTERSECT [ALL] ----------------------------------------------------

_U2_ORACLE = """
SELECT cast(k AS BIGINT) AS suppkey FROM (
  SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.09
  INTERSECT
  SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 0
)
"""


@register("u2_intersect", oracle=_U2_ORACLE, tags=("U2",))
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    a = li.filter(F.col("l_discount") > 0.09).select(
        F.col("l_suppkey").cast("bigint").alias("suppkey")
    )
    b = s.filter(F.col("s_acctbal") > 0).select(
        F.col("s_suppkey").cast("bigint").alias("suppkey")
    )
    return a.intersect(b)


# --- U3: EXCEPT [ALL] -------------------------------------------------------

_U3_ORACLE = """
SELECT cast(k AS BIGINT) AS partkey FROM (
  SELECT p_partkey AS k FROM part
  EXCEPT
  SELECT l_partkey AS k FROM lineitem
)
"""


@register("u3_except", oracle=_U3_ORACLE, tags=("U3",))
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts never ordered (anti-semantics via EXCEPT)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return p.select(F.col("p_partkey").cast("bigint").alias("partkey")).subtract(
        li.select(F.col("l_partkey").cast("bigint").alias("partkey"))
    )


# --- U4: DISTINCT / dropDuplicates -----------------------------------------

_U4_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


@register("u4_distinct", oracle=_U4_ORACLE, tags=("U4",))
def u4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


# --- O5: TABLESAMPLE / df.sample -------------------------------------------
# Bernoulli sampling is seed-deterministic WITHIN an engine but the RNG
# streams differ across engines, so the SAMPLED ROWS can't be value-
# oracled. The CONTRACT can (r7, was rows-only): the oracle computes
# the expected row count and the binomial acceptance bounds in SQL;
# the Spark side reports the same n_total plus one boolean per
# property (reproducible / seed-independent / within 6σ), each
# computed from real sample runs. A violated property flips a boolean
# and the driver's value hash goes red — the former raise-only checks
# are now hash-verified evidence.
# Scale shape: sampling is a narrow map — no shuffle, pushdown-friendly,
# and the canonical first stage of any corpus-quality eyeball pipeline.

_O5_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(1 AS BIGINT) AS same_seed_reproduces,
       CAST(1 AS BIGINT) AS diff_seed_differs,
       CAST(1 AS BIGINT) AS frac_within_6_sigma
FROM customer
"""


@register("o5_tablesample", oracle=_O5_ORACLE, tags=("O5", "X7"))
def o5_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n_total = c.count()
    frac = 0.3
    s1 = c.sample(fraction=frac, seed=42).select("c_custkey")
    s2 = c.sample(fraction=frac, seed=42).select("c_custkey")
    s3 = c.sample(fraction=frac, seed=7).select("c_custkey")
    n1 = s1.count()
    # determinism: same seed => identical row set (exceptAll both ways)
    reproducible = (
        s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    )
    # different seed => (overwhelmingly) different set at this n
    differs = n_total < 100 or (
        s1.exceptAll(s3).count() != 0 or s3.exceptAll(s1).count() != 0
    )
    # fraction within 6 sigma of binomial expectation
    import math

    sigma = math.sqrt(n_total * frac * (1 - frac))
    within = abs(n1 - n_total * frac) <= 6 * sigma + 1
    # bigint 0/1 flags, not booleans: every oracled column type in the
    # suite is numeric/string, keeping the driver's cross-engine value
    # hashing on well-trodden ground
    return spark.createDataFrame(
        [(n_total, int(reproducible), int(differs), int(within))],
        "n_total long, same_seed_reproduces long, "
        "diff_seed_differs long, frac_within_6_sigma long",
    )


# --- U8: UNION implicit type coercion ---------------------------------------
# Set ops across branches with different-but-compatible column types
# must widen per ANSI rules (int ∪ double → double; the int branch's
# values arrive exactly representable). Both engines implement the
# same lattice, so this is value-oracled, proving coercion — not just
# acceptance.

_U8_ORACLE = """
SELECT kind, round(v, 2) AS v FROM (
  SELECT 'qty' AS kind, CAST(l_quantity AS DOUBLE) AS v
  FROM lineitem WHERE l_orderkey % 503 = 0
  UNION ALL
  SELECT 'price' AS kind, l_extendedprice AS v
  FROM lineitem WHERE l_orderkey % 503 = 0
)
ORDER BY kind, v
"""


@register("u8_union_coercion", oracle=_U8_ORACLE, tags=("U1", "U8", "P5"))
def u8_union_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 503 == 0
    )
    # deliberately UN-cast int-typed quantity: the union must widen it
    ints = li.select(
        F.lit("qty").alias("kind"), F.col("l_quantity").cast("int").alias("v")
    )
    dbls = li.select(F.lit("price").alias("kind"), F.col("l_extendedprice").alias("v"))
    out = ints.unionByName(dbls)
    # no schema self-check here (review-pass r17): int UNION double ->
    # double is decided unconditionally by Spark's coercion lattice, so
    # asserting it could never fire under any data or config — the
    # falsifiable proof is the value oracle, which hashes the widened
    # qty VALUES (an int that didn't survive the widening exactly would
    # mismatch DuckDB's CAST(... AS DOUBLE) replay).
    return out.select("kind", F.round("v", 2).alias("v")).orderBy("kind", "v")
