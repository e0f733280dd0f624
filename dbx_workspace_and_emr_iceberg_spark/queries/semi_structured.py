"""F4-F7: arrays (incl. higher-order), maps, structs, JSON
(SURVEY.md §2.8), over the `embeddings` and `events` fixtures.

Arrays stay JVM-side via higher-order functions (transform/filter/
aggregate/zip_with compile to Catalyst lambda expressions — no Python).
At 100 TB the embedding column is the bulk of the bytes; every query
prunes to exactly the columns it touches so the Parquet reader skips
the rest.

Oracle mapping: Spark F.transform/F.filter/F.aggregate ↔ DuckDB
list_transform/list_filter/list_aggregate; posexplode ↔
generate_subscripts+unnest; maps are compared as sorted key/value
strings (DuckDB map subscript returns a LIST, so direct element
comparison is representation-fragile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# --- F4: array basics -------------------------------------------------------

_F4_ORACLE = """
SELECT
  vec_id,
  cast(len(embedding) AS INTEGER)                          AS dim,
  round(CAST(embedding[1] AS DOUBLE), 6)                   AS first_val,
  round(CAST(embedding[64] AS DOUBLE), 6)                  AS last_val,
  round(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS vec_min,
  round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS vec_max,
  array_to_string(list_transform(list_sort(list_slice(embedding, 1, 4)),
                                 x -> cast(cast(round(x, 4) AS DECIMAL(10,4)) AS VARCHAR)), ',') AS head_sorted
FROM embeddings
WHERE vec_id % 5 = 0
ORDER BY vec_id
"""


@register("f4_array_basics", oracle=_F4_ORACLE, tags=("F4",))
def f4_array_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return (
        e.filter(F.col("vec_id") % 5 == 0)
        .select(
            "vec_id",
            F.size(emb).alias("dim"),
            F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_val"),
            F.round(F.element_at(emb, 64).cast("double"), 6).alias("last_val"),
            F.round(F.array_min(emb).cast("double"), 6).alias("vec_min"),
            F.round(F.array_max(emb).cast("double"), 6).alias("vec_max"),
            F.array_join(
                F.transform(
                    F.array_sort(F.slice(emb, 1, 4)),
                    lambda x: F.round(x.cast("double"), 4)
                    .cast("decimal(10,4)")
                    .cast("string"),
                ),
                ",",
            ).alias("head_sorted"),
        )
        .orderBy("vec_id")
    )


# --- F4b: explode / posexplode ---------------------------------------------

_F4B_ORACLE = """
SELECT
  vec_id,
  cast(generate_subscripts(embedding, 1) - 1 AS INTEGER)   AS pos,
  round(CAST(unnest(embedding) AS DOUBLE), 6)              AS val
FROM embeddings
WHERE vec_id % 25 = 0
ORDER BY vec_id, pos
"""


@register("f4b_posexplode", oracle=_F4B_ORACLE, tags=("F4",))
def f4b_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") % 25 == 0)
        .select("vec_id", F.posexplode("embedding").alias("pos", "raw"))
        .select("vec_id", "pos", F.round(F.col("raw").cast("double"), 6).alias("val"))
        .orderBy("vec_id", "pos")
    )


# --- F4c: higher-order functions -------------------------------------------

_F4C_ORACLE = """
SELECT
  vec_id,
  cast(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
  round(list_aggregate(list_transform(embedding, x -> x * x), 'sum'), 4) AS sq_norm,
  (len(list_filter(embedding, x -> abs(x) > 0.3)) > 0)     AS has_large,
  round(list_aggregate(list_transform(embedding, x -> x * 0.5), 'sum'), 4) AS half_sum
FROM embeddings
WHERE vec_id % 10 = 0
ORDER BY vec_id
"""


@register("f4c_higher_order", oracle=_F4C_ORACLE, tags=("F4",))
def f4c_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column.

    has_large probes |x| > 0.3 (review-pass r17): the old threshold 2
    was structurally FALSE for every row — embeddings are unit
    vectors, no component can exceed 1 — so an F.exists regression
    that always returned false was invisible. At 0.3 both branches
    appear in the hashed output (31 true / 19 false at sf0.01). The
    comparison is a single strict > of identical float32-promoted
    doubles in both engines — no arithmetic, no tie hazard."""
    e = load_table(spark, sf_dir, "embeddings")
    embd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        e.filter(F.col("vec_id") % 10 == 0)
        .select(
            "vec_id",
            F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
            F.round(
                F.aggregate(
                    F.transform(embd, lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                4,
            ).alias("sq_norm"),
            F.exists(F.col("embedding"), lambda x: F.abs(x) > 0.3).alias(
                "has_large"
            ),
            F.round(
                F.aggregate(
                    F.transform(embd, lambda x: x * 0.5),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                4,
            ).alias("half_sum"),
        )
        .orderBy("vec_id")
    )


# --- F4d: zip_with / arrays_zip --------------------------------------------

_F4D_ORACLE = """
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_transform(a.embedding, x -> CAST(x AS DOUBLE)) AS ea,
         list_transform(b.embedding, x -> CAST(x AS DOUBLE)) AS eb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 20 = 0
)
SELECT
  id_a,
  id_b,
  round(list_dot_product(ea, eb), 4)                       AS dot,
  round(list_aggregate(list_transform(list_zip(ea, eb),
        p -> (p[1] + p[2])), 'sum'), 4)                    AS sum_of_sums
FROM pairs
ORDER BY id_a
"""


@register("f4d_zip_with", oracle=_F4D_ORACLE, tags=("F4",))
def f4d_zip_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")).filter(
        F.col("id_a") % 20 == 0
    )
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    dbl = lambda c: c.cast("double")  # noqa: E731
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: dbl(x) * dbl(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sums = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: dbl(x) + dbl(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(dot, 4).alias("dot"),
        F.round(sums, 4).alias("sum_of_sums"),
    ).orderBy("id_a")


# --- F5: maps ---------------------------------------------------------------

_F5_ORACLE = """
SELECT
  event_id,
  array_to_string(list_sort(map_keys(map(['type', 'uid'],
    [event_type, cast(user_id AS VARCHAR)]))), ',')        AS mkeys,
  map(['type', 'uid'], [event_type, cast(user_id AS VARCHAR)])['type'][1] AS mtype,
  cast(cardinality(map(['type', 'uid'],
    [event_type, cast(user_id AS VARCHAR)])) AS INTEGER)   AS msize
FROM events
WHERE event_id % 19 = 0
ORDER BY event_id
"""


@register("f5_map_funcs", oracle=_F5_ORACLE, tags=("F5",))
def f5_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("uid")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return (
        ev.filter(F.col("event_id") % 19 == 0)
        .select(
            "event_id",
            F.array_join(F.array_sort(F.map_keys(m)), ",").alias("mkeys"),
            F.element_at(m, "type").alias("mtype"),
            F.size(m).alias("msize"),
        )
        .orderBy("event_id")
    )


# --- F6: structs ------------------------------------------------------------

_F6_ORACLE = """
SELECT
  o_orderkey,
  struct_pack(k := o_orderkey, p := round(o_totalprice, 2)).k      AS sk,
  struct_pack(k := o_orderkey, p := round(o_totalprice, 2)).p      AS sp,
  cast(to_json(struct_pack(k := o_orderkey,
                           s := o_orderstatus)) AS VARCHAR)        AS sjson
FROM orders
WHERE o_orderkey % 23 = 0
ORDER BY o_orderkey
"""


@register("f6_struct_funcs", oracle=_F6_ORACLE, tags=("F6",))
def f6_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    st = F.struct(
        F.col("o_orderkey").alias("k"), F.round("o_totalprice", 2).alias("p")
    )
    sj = F.struct(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("s"))
    return (
        o.filter(F.col("o_orderkey") % 23 == 0)
        .select(
            "o_orderkey",
            st.getField("k").alias("sk"),
            st.getField("p").alias("sp"),
            F.to_json(sj).alias("sjson"),
        )
        .orderBy("o_orderkey")
    )


# --- F7: JSON (events.props is a JSON string) ------------------------------

_F7_ORACLE = """
SELECT
  event_id,
  json_extract_string(props, '$.k')                        AS k_str,
  cast(json_extract_string(props, '$.k') AS INTEGER)       AS k_int,
  json_extract_string(props, '$.missing')                  AS k_missing,
  (cast(json_extract_string(props, '$.k') AS INTEGER) > 50) AS k_large
FROM events
WHERE event_id % 7 = 0
ORDER BY event_id
"""


@register("f7_json_funcs", oracle=_F7_ORACLE, tags=("F7",))
def f7_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        ev.filter(F.col("event_id") % 7 == 0)
        .select(
            "event_id",
            k.alias("k_str"),
            k.cast("int").alias("k_int"),
            F.get_json_object("props", "$.missing").alias("k_missing"),
            (k.cast("int") > 50).alias("k_large"),
        )
        .orderBy("event_id")
    )


_F7B_ORACLE = """
SELECT
  event_id,
  cast(json_extract(props, '$.k') AS INTEGER)              AS k_parsed,
  cast(to_json(struct_pack(k := cast(json_extract_string(props, '$.k') AS INTEGER),
                           t := event_type)) AS VARCHAR)   AS roundtrip
FROM events
WHERE event_id % 31 = 0
ORDER BY event_id
"""


@register("f7b_json_roundtrip", oracle=_F7B_ORACLE, tags=("F7",))
def f7b_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema (the scale path: schema-on-read
    once, not per-access string probing), then to_json re-serialization."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return (
        ev.filter(F.col("event_id") % 31 == 0)
        .select(
            "event_id",
            parsed.getField("k").alias("k_parsed"),
            F.to_json(
                F.struct(
                    parsed.getField("k").alias("k"), F.col("event_type").alias("t")
                )
            ).alias("roundtrip"),
        )
        .orderBy("event_id")
    )


# --- F7c: VARIANT type (Spark 4 semi-structured fast path) -------------------
# parse_json gives an open-schema binary VARIANT (the Spark 4 / Iceberg v3
# answer to JSON columns: parsed once, typed access without a declared
# schema, ~order-of-magnitude over per-access string probing). The output
# schema extracts to concrete types — VARIANT itself never reaches the
# result (no stable cross-engine serialization to hash); the oracle
# states the same values relationally, so field extraction, the
# missing-path NULL contract, and try_parse_json's malformed-input NULL
# are all hash-gated.

_F7C_ORACLE = """
SELECT
  o_orderkey,
  o_totalprice                                   AS price,
  o_orderstatus                                  AS status,
  o_orderpriority                                AS prio,
  CAST(NULL AS INTEGER)                          AS missing_field,
  1                                              AS bad_is_null
FROM orders
WHERE o_orderkey % 37 = 0
ORDER BY o_orderkey
"""


@register("f7c_variant", oracle=_F7C_ORACLE, tags=("F7",))
def f7c_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
            F.struct(F.col("o_orderpriority").alias("prio")).alias("nested"),
        )
    )
    v = F.parse_json(doc)
    return (
        o.filter(F.col("o_orderkey") % 37 == 0)
        .select(
            "o_orderkey",
            F.variant_get(v, "$.price", "double").alias("price"),
            F.variant_get(v, "$.status", "string").alias("status"),
            F.variant_get(v, "$.nested.prio", "string").alias("prio"),
            # missing path -> NULL (not an error) under try_variant_get
            F.try_variant_get(v, "$.no_such_field", "int").alias("missing_field"),
            # malformed input -> NULL variant under try_parse_json
            F.when(
                F.try_parse_json(F.lit("{not json")).isNull(), F.lit(1)
            ).otherwise(F.lit(0)).alias("bad_is_null"),
        )
        .orderBy("o_orderkey")
    )


# --- F5c: map higher-order functions ----------------------------------------
# transform_keys / transform_values / map_filter / map_zip_with — the
# lambda surface over MapType (SPARK-23899 family). The oracle computes
# every end value directly from the base columns (DuckDB's map lambdas
# differ), so the query proves Spark's map HOFs produce the
# ground-truth values, not merely that they run.

_F5C_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  round(l_quantity / 10, 2)                           AS qty_scaled,
  round(l_extendedprice * 2, 2)                       AS price_doubled,
  CASE WHEN l_quantity >= 30 THEN 'price,qty' ELSE 'price' END AS kept_keys,
  'PRICE,QTY'                                         AS upper_keys
FROM lineitem
WHERE l_orderkey % 61 = 0
ORDER BY l_orderkey, l_linenumber
"""


@register("f5c_map_higher_order", oracle=_F5C_ORACLE, tags=("F5",))
def f5c_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m1 = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price")),
        F.array(F.col("l_quantity"), F.col("l_extendedprice")),
    )
    m2 = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price")),
        F.array(F.lit(1.0), F.lit(2.0)),
    )
    return (
        li.filter(F.col("l_orderkey") % 61 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.element_at(
                    F.transform_values(m1, lambda _k, v: v / 10), "qty"
                ),
                2,
            ).alias("qty_scaled"),
            F.round(
                F.element_at(
                    F.map_zip_with(m1, m2, lambda _k, a, b: a * b), "price"
                ),
                2,
            ).alias("price_doubled"),
            F.array_join(
                F.array_sort(
                    F.map_keys(F.map_filter(m1, lambda _k, v: v >= 30))
                ),
                ",",
            ).alias("kept_keys"),
            F.array_join(
                F.array_sort(
                    F.map_keys(F.transform_keys(m1, lambda k, _v: F.upper(k)))
                ),
                ",",
            ).alias("upper_keys"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
