"""S2/S3 format round-trip queries: CSV, JSON, ORC written and re-read
by this engine must reproduce the Parquet-sourced oracle exactly —
proving the text-format schema-on-read path (timestamps included)
doesn't corrupt values.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.formats import roundtrip
from ..tables import load_table
from ..util import process_tmp_root

# Round-trip files live under one process-lifetime root (NOT deleted in
# the query body): the returned DataFrame stays a lazy scan over the
# written files — no .collect() re-materialization on the driver — and
# mode("overwrite") keeps repeat runs idempotent.
_TMP_ROOT = process_tmp_root("spark_graft_fmt_")

_NATION_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
"""


def _roundtrip_query(fmt: str, options: dict[str, str] | None = None):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        n = load_table(spark, sf_dir, "nation")
        back = roundtrip(
            n, os.path.join(_TMP_ROOT, f"nation_{fmt}"), fmt, options
        )
        return back.select("n_nationkey", "n_name", "n_regionkey").orderBy(
            "n_nationkey"
        )

    return q


register("s2_csv_roundtrip", oracle=_NATION_ORACLE, tags=("S2",))(
    _roundtrip_query("csv", {"header": "true"})
)
register("s2b_json_roundtrip", oracle=_NATION_ORACLE, tags=("S2",))(
    _roundtrip_query("json")
)
register("s2c_orc_roundtrip", oracle=_NATION_ORACLE, tags=("S2",))(
    _roundtrip_query("orc")
)


_EVENTS_TS_ORACLE = """
SELECT event_id, ts, round(value, 6) AS value
FROM events
WHERE event_id % 101 = 0
ORDER BY event_id
"""


@register("s2d_json_timestamp_roundtrip", oracle=_EVENTS_TS_ORACLE, tags=("S2", "F2"))
def s2d_json_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamps through the JSON text format (ISO-8601 serialization)
    must survive to the microsecond."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 101 == 0)
        .select("event_id", "ts", "value")
    )
    # default JSON timestamp formats truncate to millis; request µs.
    # ts is TIMESTAMP_NTZ (tables.py canonical form), which JSON
    # serializes via timestampNTZFormat — timestampFormat alone only
    # covers zoned TIMESTAMP columns and would silently drop micros.
    back = roundtrip(
        ev,
        os.path.join(_TMP_ROOT, "events_json_ts"),
        "json",
        {
            "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
            "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
        },
    )
    return back.select(
        "event_id", "ts", F.round("value", 6).alias("value")
    ).orderBy("event_id")


# --- S2e: CSV malformed-row handling (PERMISSIVE / DROPMALFORMED / ---------
# FAILFAST) — the parse-mode contract every CSV ingestion pipeline
# depends on. DuckDB's CSV error handling differs by design, so the
# modes are asserted against the known-planted corruption — but the
# resulting ACCOUNTING is fixture-derivable (3 planted bad lines over
# the nation row count), so it is value-ORACLED (r11): a mode that
# leaks or drops the wrong rows changes a count and hash-reds.

_S2E_ORACLE = """
SELECT 'dropmalformed_kept' AS label, CAST(count(*) AS BIGINT) AS n
FROM nation
UNION ALL SELECT 'failfast_raised', 1
UNION ALL SELECT 'permissive_corrupt', 3
UNION ALL SELECT 'permissive_total', CAST(count(*) + 3 AS BIGINT) FROM nation
ORDER BY label
"""


@register("s2e_csv_malformed_modes", oracle=_S2E_ORACLE, tags=("S2",))
def s2e_csv_malformed_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a CSV with a known number of planted malformed rows, then
    read it under all three parse modes and assert the contract:
      * PERMISSIVE: every physical row surfaces; exactly the planted
        rows carry a non-null _corrupt_record;
      * DROPMALFORMED: exactly the clean rows survive;
      * FAILFAST: raises on the first malformed row.
    Returns the per-mode row accounting (self-verified)."""
    n = load_table(spark, sf_dir, "nation")
    clean = n.selectExpr(
        "cast(n_nationkey as string) AS k", "n_name AS name", "cast(n_regionkey as string) AS r"
    )
    n_clean = clean.count()
    path = os.path.join(_TMP_ROOT, "nation_malformed")
    clean.coalesce(1).write.mode("overwrite").option("header", "false").csv(path)
    # plant malformed lines: wrong arity + unparseable int (schema k INT)
    bad_lines = ["only_one_field", "x,y,z,extra_field", "not_an_int,BAD,9"]
    with open(os.path.join(path, "malformed.csv"), "w") as f:
        f.write("\n".join(bad_lines) + "\n")

    # int-typed k turns 'not_an_int,BAD,9' malformed; string arity
    # breaks the other two
    typed = "k int, name string, r string, _corrupt_record string"
    permissive = (
        spark.read.schema(typed)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    # _corrupt_record-referencing queries need the cached/materialized
    # frame (Spark disallows filtering the internal column off the raw
    # scan directly)
    perm = permissive.cache()
    try:
        n_all = perm.count()
        n_corrupt = perm.filter(F.col("_corrupt_record").isNotNull()).count()
    finally:
        # don't leak executor storage memory for the rest of a long
        # driver run — the counts are materialized, the cache is done
        perm.unpersist()
    # no pre-asserts on n_all/n_corrupt (review-pass r17, the a5c
    # rule): the returned counts are the hashed carriers of the
    # PERMISSIVE contract — raising on the same conditions here made
    # every returned cell constant and the oracle compare unreachable

    dropped = (
        spark.read.schema("k int, name string, r string")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    # Deliberately NOT dropped.count(): count() pushes an empty
    # projection into the CSV scan, so no column is parsed and
    # malformed rows are never detected (and a count over a never-null
    # expression constant-folds back to count(*) — verified). collect()
    # forces the full-row parse; nation is 25 rows, bounded at any SF.
    n_dropped = len(dropped.collect())
    # likewise no pre-assert on n_dropped — the hashed
    # dropmalformed_kept cell carries it

    failfast_raised = False
    try:
        spark.read.schema("k int, name string, r string").option(
            "mode", "FAILFAST"
        ).csv(path).collect()
    except Exception as e:
        # only a PARSE failure verifies the mode contract — an
        # unrelated read error (missing path, analysis bug) must not
        # count as 'FAILFAST worked'
        msg = str(e)
        if not ("MALFORMED" in msg.upper() or "FAILFAST" in msg.upper()):
            raise
        failfast_raised = True

    return spark.createDataFrame(
        [
            ("permissive_total", n_all),
            ("permissive_corrupt", n_corrupt),
            ("dropmalformed_kept", n_dropped),
            # the MEASURED flag, not a literal 1 behind a raise
            # (review-pass r17): a FAILFAST regression now hash-reds
            ("failfast_raised", int(failfast_raised)),
        ],
        "label string, n long",
    ).orderBy("label")


# --- S2f: parquet schema merge on read (mergeSchema=true) -------------------
# Reading a directory whose files were written with EVOLVED schemas —
# the capability behind "old files + new files, one DataFrame" that
# every long-lived dataset needs. The oracle reproduces the merged
# result with an explicit UNION ALL that nulls the added column for
# old rows (plain positional SQL — simpler to audit than DuckDB's
# union_by_name reader option), so this is fully hash-verified.

_S2F_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey, extra_score
FROM (
  SELECT n_nationkey, n_name, n_regionkey, NULL AS extra_score
  FROM nation WHERE n_regionkey < 2
  UNION ALL
  SELECT n_nationkey, n_name, n_regionkey,
         CAST(n_nationkey * 10 AS BIGINT) AS extra_score
  FROM nation WHERE n_regionkey >= 2
)
ORDER BY n_nationkey
"""


@register("s2f_parquet_schema_merge", oracle=_S2F_ORACLE, tags=("S2", "M6"))
def s2f_parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two parquet batches under one directory — the second written
    after an additive schema change (new BIGINT column) — read back as
    ONE DataFrame with mergeSchema=true: old rows surface NULL for the
    new column, exactly Iceberg/Parquet schema-evolution-on-read
    semantics (SURVEY §2.11 M6 at the file-format layer)."""
    n = load_table(spark, sf_dir, "nation")
    path = os.path.join(_TMP_ROOT, "nation_evolved")
    old = n.filter(F.col("n_regionkey") < 2).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    new = n.filter(F.col("n_regionkey") >= 2).select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        (F.col("n_nationkey") * 10).cast("bigint").alias("extra_score"),
    )
    old.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "v1"))
    new.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "v2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "v1"), os.path.join(path, "v2")
    )
    return merged.select(
        "n_nationkey", "n_name", "n_regionkey", "extra_score"
    ).orderBy("n_nationkey")


# --- S2g: XML round-trip (Spark 4 built-in XML data source) ----------------
# Spark 4 folded spark-xml into core (SPARK-44265): format("xml") with a
# rowTag is a first-class batch source/sink, no external jar. Scale
# shape matches CSV/JSON: line-oriented-ish text scan, schema applied on
# read, predicate pushdown NOT available (text formats) — which is why
# the engine's canonical storage stays Parquet and XML is an
# ingest/export edge only.


@register("s2g_xml_roundtrip", oracle=_NATION_ORACLE, tags=("S2",))
def s2g_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    back = roundtrip(
        n,
        os.path.join(_TMP_ROOT, "nation_xml"),
        "xml",
        {"rowTag": "nation"},
    )
    return back.select("n_nationkey", "n_name", "n_regionkey").orderBy(
        "n_nationkey"
    )


# --- S14: binaryFile source (multimodal ingestion front door) ---------------
# `format("binaryFile")` turns a directory of opaque files into
# (path, modificationTime, length, content) rows — the ingestion edge
# for the multimodal pipeline (x5): blobs land as files, this scan
# makes them a BinaryType column, then mapInPandas decodes.
# VALUE-ORACLED since r7 (was rows-only): the planted payloads are
# deterministic printable-ASCII byte sequences, so DuckDB can
# re-derive every (file_name, length, md5) triple from generate_series
# + chr + md5 with no filesystem access at all — the oracle predicts
# the full scan output, byte-for-byte. Self-checks retained: every
# planted blob surfaces exactly once, and pathGlobFilter prunes the
# planted decoy.

_S14_ORACLE = """
SELECT 'blob_' || i || '.bin' AS file_name,
       CAST(100 + i*13 AS BIGINT) AS length,
       md5(string_agg(chr(CAST((i*7+j)%64 + 32 AS INTEGER)), '' ORDER BY j))
         AS content_md5
FROM generate_series(0,5) t(i),
     LATERAL (SELECT unnest(generate_series(0, 100+i*13-1)) AS j)
GROUP BY i
ORDER BY file_name
"""


@register("s14_binaryfile_source", oracle=_S14_ORACLE, tags=("S14", "S2", "X5"))
def s14_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    root = os.path.join(_TMP_ROOT, "blobs")
    os.makedirs(root, exist_ok=True)
    want: dict[str, tuple[int, str]] = {}
    for i in range(6):
        # printable-ASCII bytes (32..95): the DuckDB oracle rebuilds
        # the same sequence as a VARCHAR, where md5(varchar) ==
        # md5(bytes) — a raw 0..255 payload would hex-mangle through
        # DuckDB's BLOB->VARCHAR cast and break the value oracle
        payload = bytes([(i * 7 + j) % 64 + 32 for j in range(100 + i * 13)])
        name = f"blob_{i}.bin"
        with open(os.path.join(root, name), "wb") as f:
            f.write(payload)
        want[name] = (len(payload), hashlib.md5(payload).hexdigest())
    # decoy that the glob filter must exclude
    with open(os.path.join(root, "notes.txt"), "w") as f:
        f.write("not a blob")

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(root)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            "length",
            F.md5("content").alias("content_md5"),
        )
    )
    got = {r.file_name: (r.length, r.content_md5) for r in df.collect()}
    if got != want:
        diff = {
            k: (got.get(k), want.get(k))
            for k in set(got) | set(want)
            if got.get(k) != want.get(k)
        }
        raise AssertionError(f"binaryFile roundtrip mismatch: {diff}")
    return df.orderBy("file_name")


# --- S15: Hive-style partitioned write + partition discovery/pruning --------
# `write.partitionBy(col)` lays data out as col=value/ directories;
# reading the root discovers the partition column from the paths and a
# filter on it prunes whole directories BEFORE any file IO (visible as
# PartitionFilters in the scan node). This is the classic warehouse
# layout the lakehouse layer's hidden partitioning (p3/m7) improves on
# — both belong in the engine. Values hash-oracled; pruning asserted on
# the file count actually scanned.

_S15_ORACLE = """
SELECT
  o_orderpriority,
  CAST(count(*) AS BIGINT)     AS n,
  round(sum(o_totalprice), 2)  AS total
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("s15_hive_partitioned_write", oracle=_S15_ORACLE, tags=("S15", "S2", "P3"))
def s15_hive_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    path = os.path.join(_TMP_ROOT, "orders_by_status")
    (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    pruned = back.filter(F.col("o_orderstatus") == "F")
    # Pruning proof from the PLAN, not from surviving rows: counting
    # input_file_name() over filtered rows only reflects the write
    # layout (rows matching 'F' live in the F directory regardless of
    # whether pruning happened). The scan node's PartitionFilters entry
    # is the actual contract: the predicate reached the directory level
    # and never became a post-scan row filter.
    from ..plans.explain import formatted_plan

    plan = formatted_plan(pruned)
    if "PartitionFilters" not in plan or "o_orderstatus" not in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]:
        raise AssertionError(
            f"o_orderstatus filter did not reach PartitionFilters:\n{plan}"
        )
    return (
        pruned.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


# --- S16: nested schema pruning -------------------------------------------
# Column pruning must reach INSIDE structs (SPARK-25363, on by
# default): selecting one field of a struct column reads only that
# subfield's parquet pages. On wide nested telemetry/feature schemas at
# 100 TB this is the difference between scanning 2% and 100% of a
# column's bytes. Values hash-oracled; the pruned ReadSchema asserted
# from the executed plan.

_S16_ORACLE = """
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
WHERE o_orderkey % 31 = 0
ORDER BY o_orderkey
"""


@register("s16_nested_schema_pruning", oracle=_S16_ORACLE, tags=("S16", "P1", "S2"))
def s16_nested_schema_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.explain import read_schema_raw

    o = load_table(spark, sf_dir, "orders")
    path = os.path.join(_TMP_ROOT, "orders_nested")
    o.select(
        "o_orderkey",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("odate"),
        ).alias("info"),
    ).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    res = (
        back.filter(F.col("o_orderkey") % 31 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("info.price"), 2).alias("price"),
        )
        .orderBy("o_orderkey")
    )
    read_schema = read_schema_raw(res)
    if not read_schema:
        raise AssertionError("plan has no file-scan ReadSchema to audit")
    if "price" not in read_schema:
        raise AssertionError(f"nested field missing from scan: {read_schema}")
    for unwanted in ("status", "priority", "odate"):
        if unwanted in read_schema:
            raise AssertionError(
                f"nested pruning failed — scan reads info.{unwanted}: "
                f"{read_schema}"
            )
    return res


# --- S17: line-oriented text source (spark.read.text) -----------------------
# Raw-corpus ingestion's first step: a directory of text files becomes
# a one-column DataFrame of lines. Round-trip: documents written one
# line per doc, read back via the text source, hash-oracled against
# the parquet originals (fixture text is single-line by construction —
# the md5 column would expose any line splitting/merging/mangling).

_S17_ORACLE = """
SELECT md5(text) AS line_md5, CAST(length(text) AS INTEGER) AS n_chars
FROM documents
WHERE doc_id % 7 = 0
ORDER BY line_md5
"""


@register("s17_text_source", oracle=_S17_ORACLE, tags=("S17", "S2", "X4"))
def s17_text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    path = os.path.join(_TMP_ROOT, "corpus_text")
    d.select("text").write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    return lines.select(
        F.md5("value").alias("line_md5"),
        F.length("value").alias("n_chars"),
    ).orderBy("line_md5")


# --- S18: incremental file-ingestion options --------------------------------
# The batch-ingest knobs a 100 TB landing zone depends on:
# recursiveFileLookup (nested drop-directories), pathGlobFilter
# (format mixing), modifiedAfter (poor-man's incremental pickup before
# a real streaming source exists). Self-verified with planted files
# whose mtimes this query controls: each option must select exactly
# the intended file set.


# s18: recursiveFileLookup + pathGlobFilter + modifiedAfter — the
# incremental file-ingest trio. The glob/mtime mechanics are
# filesystem-side, but every returned count is fixture-derivable
# (day=1 holds keys < 10, day=2 the rest), so the contract is
# value-ORACLED (r11): a glob that leaks the decoy json or a
# modifiedAfter that re-reads old files changes a count and hash-reds.

_S18_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN n_nationkey >= 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_incremental,
       CAST(sum(CASE WHEN n_nationkey < 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_skipped
FROM nation
"""


@register("s18_file_ingest_options", oracle=_S18_ORACLE, tags=("S18", "S2"))
def s18_file_ingest_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time as _time

    root = tempfile.mkdtemp(prefix="s18_ingest_")
    try:
        nat = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
        old = nat.filter(F.col("n_nationkey") < 10)
        new = nat.filter(F.col("n_nationkey") >= 10)
        n_old, n_new = old.count(), new.count()
        old.coalesce(1).write.parquet(os.path.join(root, "day=1", "batchA"))
        new.coalesce(1).write.parquet(os.path.join(root, "day=2", "batchB"))
        # decoy a glob must exclude — NOT underscore-prefixed: Spark's
        # hidden-file filter would skip _manifest.json with or without
        # the glob, proving nothing
        with open(os.path.join(root, "day=1", "manifest.json"), "w") as f:
            f.write("{}")

        # pin mtimes: batchA old, batchB new, split by a known instant
        cutoff = _time.time() - 3600
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                p = os.path.join(dirpath, fn)
                ts = cutoff - 7200 if "day=1" in dirpath else cutoff + 3600
                os.utime(p, (ts, ts))

        base = (
            spark.read.schema("n_nationkey bigint, n_name string")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
        )
        n_all = base.parquet(root).count()
        if n_all != n_old + n_new:
            raise AssertionError(
                f"recursive lookup read {n_all}, want {n_old + n_new}"
            )
        from datetime import datetime, timezone

        iso = datetime.fromtimestamp(cutoff, tz=timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S"
        )
        inc = (
            spark.read.schema("n_nationkey bigint, n_name string")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .option("modifiedAfter", iso)
            .parquet(root)
        )
        n_inc = inc.count()
        keys = {r.n_nationkey for r in inc.collect()}
        if n_inc != n_new or min(keys) < 10:
            raise AssertionError(
                f"modifiedAfter picked {n_inc} rows (want {n_new}): {sorted(keys)[:5]}"
            )
        return spark.createDataFrame(
            [(n_all, n_inc, n_old)],
            "n_total long, n_incremental long, n_skipped long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
