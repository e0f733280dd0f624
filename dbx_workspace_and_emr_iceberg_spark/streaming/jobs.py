"""Structured Streaming building blocks (SURVEY.md §2.9 T1-T9).

The reference enables streaming only by installing Spark on EMR
(/root/reference/main.tf:761); Iceberg is a valid streaming sink
**[pkg]** (README.md:36). Locally we drive file-source streams over the
`events` fixture with trigger(availableNow=True) — deterministic,
bounded, and exactly the pattern a backfill-style streaming job uses in
production.

Scale notes: watermarks bound state (T5); windowed aggregates shuffle
once per trigger on (window, key); session windows (T4) and stateful
ops (T7) keep per-key state in the state store — at 100 TB/day the
state store is RocksDB-backed and the same code runs unchanged.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: file stream over the events fixture.

    ts is normalized to plain TIMESTAMP, whatever the parquet physical
    type (int64-nanos in older fixture generations, timestamp[us] now).
    NOT the batch side's TIMESTAMP_NTZ: Spark 4.1.2 rejects NTZ event
    time (`withWatermark` raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE),
    so the streaming canonical form must be zoned. The session is
    pinned to UTC (ensure_session_defaults), so the NTZ→TIMESTAMP cast
    preserves the stored civil value and collect() round-trips it.
    """
    from ..tables import ensure_session_defaults

    ensure_session_defaults(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = static.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        # nanos-as-long generation
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = StructType(
            [f if f.name != "ts" else type(f)("ts", LongType()) for f in static.schema]
        )
        fix = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        schema = static.schema
        fix = F.col("ts").cast("timestamp")
    table = f"{sf_dir}/events.parquet"
    # Dispatch on the TABLE path's actual filesystem (Hadoop FS, so
    # s3a://, hdfs:// and file:// all answer correctly — review-pass
    # r14: a driver-local os.path.isdir returns False for any remote
    # prefix and would silently recreate the zero-rows bug below).
    # Spark Connect sessions expose no _jvm (review-pass r14 #2);
    # there the probe falls back to the local check, correct for the
    # scheme-less local paths this repo's fixtures use.
    jvm = getattr(spark, "_jvm", None)
    if jvm is None:
        # Spark Connect exposes no _jvm (review-pass r14 #2): fall back
        # to the local check, correct for the scheme-less local paths
        # this repo's fixtures use
        import os

        is_dir = os.path.isdir(table)
    else:
        # NO blanket except here (review-pass r15): a transient FS
        # error (s3a credential refresh, throttling) swallowed by a
        # broad fallback would flip is_dir False and re-open the
        # silent zero-rows bug this probe exists to prevent — a real
        # FS failure must raise, not degrade
        hpath = jvm.org.apache.hadoop.fs.Path(table)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        is_dir = bool(
            fs.exists(hpath) and fs.getFileStatus(hpath).isDirectory()
        )
    if is_dir:
        # directory-shaped table (multi-file split layout — the 100 TB
        # shape, exercised by the r14 multi-file fixture sweep): the
        # file-stream source lists the directory itself; the
        # pathGlobFilter spelling below would match NO files because
        # it filters on leaf FILE names
        stream = spark.readStream.schema(schema).parquet(table)
    else:
        # single-file fixture: the file-stream source needs a
        # directory to list, so read the parent filtered to this file
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return stream.withColumn("ts", fix)


def await_bounded(q, timeout_s: int = 300) -> None:
    """Wait for an availableNow run to finish; a stream still active at
    the deadline is stopped and raised — a silent partial result must
    never masquerade as a completed bounded run."""
    q.awaitTermination(timeout_s)
    if q.isActive:  # pragma: no cover - hang guard
        q.stop()
        raise AssertionError(
            f"bounded stream did not finish within {timeout_s}s"
        )


def run_to_memory(
    stream: DataFrame, output_mode: str = "complete", timeout_s: int = 300
) -> DataFrame:
    """Execute a bounded stream (availableNow) into a memory sink and
    return the materialized result as a DataFrame.

    The sink's temp view is DROPPED before returning (review-pass r18):
    a memory sink pins its full output on the driver for the session
    lifetime, and nothing else cleans it up — the harness's
    clearCache() does not free memory-sink views, so ~15 streaming
    queries per driver pass leaked their complete results and driver
    RSS grew monotonically across bench/sweep iterations.  The
    localCheckpoint hop moves the rows into block-manager storage
    (spillable, freed by the ContextCleaner when the returned frame is
    garbage-collected) so the caller keeps a live DataFrame.
    """
    name = "s" + uuid.uuid4().hex[:10]
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    await_bounded(q, timeout_s)
    spark = stream.sparkSession
    out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    return out


def _auto_m_bits(n_hist: int) -> int:
    """Bloom bitmap size for ``n_hist`` history digests: the power of
    two >= 16 * n_hist, clamped to [2^16, 2^27]. m/n >= 16 at k=5
    keeps the false-positive rate ~1e-3; the clamps stop fixture-scale
    builds from collecting 512 KB partial bitmaps per partition (the
    r10 bench regression) and unbounded histories from growing the
    broadcast past 16 MB. Named so tests pin THIS implementation, not
    a restated copy of the formula (ADVICE r11)."""
    return 1 << min(27, max(16, (16 * max(n_hist, 1) - 1).bit_length()))


def stream_anti_history(
    stream_df,
    hist_df,
    key: str,
    broadcast_max: int = 100_000,
    m_bits: int | None = None,
    k: int = 5,
    force_bloom: bool = False,
):
    """Rows of ``stream_df`` whose ``key`` is NOT in ``hist_df[key]`` —
    the continuous-ingest "is this content new?" primitive (t18).

    Two physical paths, same answer:

      * small history (``count <= broadcast_max``): broadcast LEFT ANTI
        join — one map-side probe, the right call while the digest
        frame fits comfortably in executor memory;
      * DEFAULT at scale (and under ``force_bloom``): an x24-style
        bloom over the history digests probes IN-STREAM (map-side,
        closure-shipped bitmap). Not-in-bloom rows are DEFINITELY new
        (no false negatives by construction) and skip the join
        entirely; only the flagged slice — true dups plus the tunable
        false positives — exact-joins the history to be resolved. The
        join input shrinks from the whole stream to ~|dups| + fp_rate
        × |stream|, and the history side is only ever joined against
        that slice, so a billions-of-digests history never has to fit
        in a broadcast (r8/r9 verdict: make this the default path).

    Batch-equivalent: both paths return exactly the anti-join rows, so
    t18's DuckDB oracle is path-independent.

    ``m_bits=None`` (default) sizes the bloom from the history count:
    the power of two >= 16 * n_hist, clamped to [2^16, 2^27] — m/n >=
    16 at k=5 keeps the false-positive rate ~1e-3 (false positives
    only cost extra slice-join rows, never correctness). Sizing needs
    one cheap count of the digest frame; a caller that knows its scale
    passes m_bits explicitly and (under force_bloom) skips that scan
    entirely. The fixed 2^22 default this replaces made fixture-scale
    builds collect 512 KB partial bitmaps per partition — the r10
    bench's one real regression (t18 +4 s).
    """
    from pyspark.sql import functions as F

    from ..operators.bloom import build_bloom, probe_bloom_scalar

    # count only when the decision or the sizing needs it: a
    # forced-bloom caller with an explicit m_bits pays no history scan
    n_hist = None
    if not force_bloom or m_bits is None:
        n_hist = hist_df.count()
    if not force_bloom and n_hist <= broadcast_max:
        return stream_df.join(F.broadcast(hist_df), key, "left_anti")
    if m_bits is None:
        m_bits = _auto_m_bits(n_hist)
    # n_items sizes the BUILD's task count (r20, scale-adaptive: a
    # fixture-sized history stops paying ~50 near-empty Python tasks;
    # a real one keeps its parallelism) — None when the caller skipped
    # the count, in which case the build keeps every input partition
    bitmap = build_bloom(hist_df, key, m_bits=m_bits, k=k, n_items=n_hist)
    probed = probe_bloom_scalar(
        stream_df, key, bitmap, m_bits=m_bits, k=k, out_col="__maybe_dup"
    )
    definitely_new = probed.filter(~F.col("__maybe_dup")).drop("__maybe_dup")
    resolved = (
        probed.filter(F.col("__maybe_dup"))
        .drop("__maybe_dup")
        .join(hist_df, key, "left_anti")
    )
    return definitely_new.unionByName(resolved)
