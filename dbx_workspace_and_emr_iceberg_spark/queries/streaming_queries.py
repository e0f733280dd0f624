"""T1-T9 streaming queries (SURVEY.md §2.9) over file-source streams of
the `events` fixture, trigger(availableNow=True).

Windowed aggregations run in complete mode so every window is emitted
and the DuckDB oracle can reproduce the result with batch SQL (the
driver's oracle is batch-only — SURVEY.md §2.9 oracle note). Stateful /
multi-batch behaviors that have no batch-SQL equivalent are rows-only
and self-verify against their own batch twin.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..streaming.jobs import await_bounded, events_stream, run_to_memory
from ..tables import load_table

# --- T2: tumbling window aggregate (oracle: time_bucket) -------------------

_T2_ORACLE = """
SELECT
  cast(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP)   AS window_start,
  event_type,
  count(*)                                                AS n,
  round(cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("t2_tumbling_window", oracle=_T2_ORACLE, tags=("T1", "T2"))
def t2_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir)
    agg = (
        s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("total_value"),
        )
    )
    out = run_to_memory(agg, "complete")
    # NTZ for the returned window bound (r14 host-TZ sweep): zoned
    # collect() renders through the driver's local zone; the session
    # is pinned UTC so the cast preserves the civil value
    return out.select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    ).orderBy("window_start", "event_type")


# --- T3: sliding window aggregate ------------------------------------------

_T3_ORACLE = """
WITH contrib AS (
  SELECT cast(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS ws, value FROM events
  UNION ALL
  SELECT cast(time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' AS TIMESTAMP) AS ws, value
  FROM events
)
SELECT ws AS window_start, count(*) AS n
FROM contrib
GROUP BY ws
ORDER BY ws
"""


@register("t3_sliding_window", oracle=_T3_ORACLE, tags=("T3",))
def t3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2h windows sliding by 1h: every event lands in exactly 2 windows
    (oracle reproduces via two shifted tumbling buckets)."""
    s = events_stream(spark, sf_dir)
    agg = s.groupBy(F.window("ts", "2 hours", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    out = run_to_memory(agg, "complete")
    # NTZ: see t2 (r14 host-TZ sweep)
    return out.select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n"
    ).orderBy("window_start")


# --- T4: session windows (oracle: gaps-and-islands SQL) --------------------

_T4_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, count(*) AS n_sessions,
       cast(sum(n_events) AS BIGINT) AS n_events
FROM (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
GROUP BY user_id
ORDER BY user_id
"""


@register("t4_session_window", oracle=_T4_ORACLE, tags=("T4",))
def t4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user, rolled up to per-user totals
    (per-session rows can't be ordered deterministically cross-engine;
    per-user rollup is)."""
    s = events_stream(spark, sf_dir)
    sess = s.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = run_to_memory(sess, "complete")
    return (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


# --- T5: watermark + late-data drop (self-verifying, 2-batch input) --------


_T5_ORACLE = """
WITH on_time AS (
  SELECT ts FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
),
wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM on_time)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(count(*) AS BIGINT) AS n
FROM on_time, wm
GROUP BY 1, wm.w
HAVING CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY <= wm.w
ORDER BY 1
"""


@register("t5_watermark_append_finalize", oracle=_T5_ORACLE, tags=("T5",))
def t5_watermark_append_finalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics under append mode, 2-batch controlled stream
    (batch 1 = on-time data, batch 2 = 5 very-late rows).

    Asserts what the engine *guarantees* (late data "may be dropped" is
    explicitly non-guaranteed in Spark, and 4.x processes stragglers
    whose state is still addressable):
      * the source really split into ≥2 batches (maxFilesPerTrigger),
      * the watermark advanced past batch 1's max event time - delay,
      * every on-time window was emitted exactly once with counts
        matching the batch-mode equivalent (append-mode finalization).

    Value-ORACLED (r11) on the deterministic slice: the finalized
    on-time windows — window end <= final watermark, which Spark pins
    at max(on-time event time) - 1h (late rows never advance it) — so
    DuckDB replays exactly the windows append mode must have emitted.
    Straggler late-window emissions (permitted, not guaranteed) are
    excluded from BOTH the returned frame and the self-check's window
    slice — they are engine-discretionary, so neither side may pin
    them (docstring aligned r17; the self-check applies the same
    >= 2024-01-05 filter). The self-check does verify no window in the
    checked slice is emitted twice (multiplicity-counted, not
    set-collapsed — review-pass r17)."""
    import datetime
    import os
    import time as _t
    import uuid as _uuid

    src = tempfile.mkdtemp(prefix="stream_src_")
    try:
        # withWatermark requires zoned TIMESTAMP (rejects the batch
        # side's TIMESTAMP_NTZ); session pinned UTC keeps civil values.
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id"
        )
        on_time = ev.filter(F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
        late = ev.filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp")).limit(5)
        on_time.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
        _t.sleep(1.1)  # file-source batches order by modification time
        late.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))

        stream = (
            spark.readStream.schema(on_time.schema)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(src + "/*/")
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        name = "s" + _uuid.uuid4().hex[:10]
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_bounded(q, 300)
        progress = q.recentProgress
        if len([p for p in progress if p["numInputRows"] > 0]) < 2:
            raise AssertionError("expected >=2 non-empty micro-batches")
        final_wm = max(
            p["eventTime"].get("watermark", "1970-01-01T00:00:00.000Z")
            for p in progress
        )
        if not final_wm.startswith("2024-01"):
            raise AssertionError(f"watermark did not advance: {final_wm}")

        out = spark.table(name).select(
            F.col("w.start").alias("window_start"), "n"
        )
        # Self-check boundary math runs in SPARK (session tz pinned
        # UTC) and compares canonical strings — collect() of a ZONED
        # timestamp renders through the PYTHON process's local zone
        # (datetime.fromtimestamp), so the old naive-datetime
        # comparisons broke under TZ=America/New_York (r14 host-TZ
        # sweep: two boundary windows mis-bucketed by the -05:00
        # rendering).
        fmt = "yyyy-MM-dd HH:mm:ss"
        emitted_rows = [
            (r.ws, r.n)
            for r in out.filter(
                F.col("window_start")
                >= F.lit("2024-01-05 00:00:00").cast("timestamp")
            )
            .select(F.date_format("window_start", fmt).alias("ws"), "n")
            .collect()
        ]
        # duplicate-emission check on the LIST, not the set (review-
        # pass r17): a window finalized and emitted twice collapses to
        # one set element, so the set comparison below would pass a
        # broken exactly-once — count multiplicities explicitly
        ws_counts: dict = {}
        for ws, _n in emitted_rows:
            ws_counts[ws] = ws_counts.get(ws, 0) + 1
        dup_ws = sorted(ws for ws, c in ws_counts.items() if c > 1)
        if dup_ws:
            raise AssertionError(
                f"append mode emitted windows more than once: {dup_ws[:3]}"
            )
        emitted = set(emitted_rows)
        # Append mode finalizes only windows whose END the watermark has
        # passed — the trailing window is legitimately withheld.
        wm = datetime.datetime.fromisoformat(final_wm.replace("Z", ""))
        expected = {
            (r.ws, r.n)
            for r in on_time.groupBy(
                F.window("ts", "1 day").alias("w")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "n")
            .filter(
                F.col("window_start") + F.expr("INTERVAL 1 DAY")
                <= F.lit(wm.isoformat(sep=" ")).cast("timestamp")
            )
            .select(F.date_format("window_start", fmt).alias("ws"), "n")
            .collect()
        }
        if emitted != expected:
            raise AssertionError(
                f"append-mode windows diverge from batch equivalent: "
                f"missing={sorted(expected - emitted)[:3]} "
                f"extra={sorted(emitted - expected)[:3]}"
            )
        # the oracle-able slice: finalized on-time windows only (see
        # docstring); n cast long for the cross-engine hash
        ret = (
            out.filter(
                (
                    F.col("window_start")
                    >= F.lit("2024-01-05 00:00:00").cast("timestamp")
                )
                & (
                    F.col("window_start") + F.expr("INTERVAL 1 DAY")
                    <= F.lit(wm.isoformat(sep=" ")).cast("timestamp")
                )
            )
            # NTZ for the RETURNED column (r14 host-TZ sweep): the
            # session is pinned UTC so the cast preserves the civil
            # value, and NTZ collect() is immune to the driver
            # process's system timezone — the zoned original rendered
            # -05:00-shifted under TZ=America/New_York and would
            # hash-mismatch the oracle's naive timestamps
            .select(
                F.col("window_start").cast("timestamp_ntz").alias(
                    "window_start"
                ),
                F.col("n").cast("long").alias("n"),
            )
            .orderBy("window_start")
        )
        # localCheckpoint is eager: materialized before the finally
        # rmtree (no separate collect needed — review-pass r11)
        return ret.localCheckpoint()
    finally:
        shutil.rmtree(src, ignore_errors=True)


# --- T6: streaming dedup (oracle: distinct over the doubled input) ---------

_T6_ORACLE = """
SELECT event_type, count(DISTINCT event_id) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("t6_stream_dedup", oracle=_T6_ORACLE, tags=("T6",))
def t6_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events file TWICE (two copies in the source dir) and
    dropDuplicates on event_id — output equals single-copy distinct."""
    import os

    src = tempfile.mkdtemp(prefix="stream_dup_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
        ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "c1"))
        ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "c2"))
        stream = spark.readStream.schema(ev.schema).parquet(src + "/*/")
        deduped = stream.dropDuplicates(["event_id"])
        agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        out = run_to_memory(agg, "complete")
        return out.orderBy("event_type")
    finally:
        shutil.rmtree(src, ignore_errors=True)


# --- T7: arbitrary stateful op (applyInPandasWithState) --------------------

_T7_ORACLE = """
SELECT user_id,
       count(*)                                   AS n_events,
       cast(count(DISTINCT event_type) AS INTEGER) AS n_types
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("t7_stateful_per_key", oracle=_T7_ORACLE, tags=("T7",))
def t7_stateful_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-user state machine via applyInPandasWithState: counts
    events and distinct types per user. Single availableNow batch →
    final state equals the batch aggregate, which is the oracle."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def track(key, pdfs, state):
        import pandas as pd

        n, types = (state.get if state.exists else (0, ""))[:2] if state.exists else (0, "")
        seen = set(types.split(",")) - {""}
        for pdf in pdfs:
            n += len(pdf)
            seen.update(pdf["event_type"].unique().tolist())
        state.update((n, ",".join(sorted(seen))))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "n_types": [len(seen)]}
        )

    s = events_stream(spark, sf_dir).select("user_id", "event_type")
    result = s.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType="user_id bigint, n_events bigint, n_types int",
        stateStructType="n bigint, types string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_memory(result, "update")
    # update mode may emit once per (key, batch); keep the final row per key
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy("user_id")
    )


# --- T8: stream-static join -------------------------------------------------

_T8_ORACLE = """
WITH dim AS (
  SELECT DISTINCT user_id, CASE WHEN user_id % 3 = 0 THEN 'core' ELSE 'casual' END AS cohort
  FROM events
)
SELECT d.cohort, count(*) AS n, round(cast(sum(cast(e.value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY d.cohort
ORDER BY d.cohort
"""


@register("t8_stream_static_join", oracle=_T8_ORACLE, tags=("T8",))
def t8_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn(
            "cohort",
            F.when(F.col("user_id") % 3 == 0, "core").otherwise("casual"),
        )
    )
    s = events_stream(spark, sf_dir).select("user_id", "value")
    # NO broadcast hint (review-pass r16): `dim` is distinct user_id
    # over the whole fact table — unbounded cardinality, so a forced
    # broadcast collects every distinct user to the driver per
    # micro-batch at scale; the planner picks the strategy from its
    # size estimate instead (a REAL bounded dimension could keep the
    # hint)
    joined = s.join(dim, "user_id")
    agg = joined.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias(
            "total_value"
        ),
    )
    out = run_to_memory(agg, "complete")
    return out.orderBy("cohort")


# --- T9: streaming sink into the lakehouse (foreachBatch) ------------------


_T9_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_sink_rows,
       CAST(1 AS BIGINT) AS rows_match_source,
       CAST(1 AS BIGINT) AS snapshots_recorded
FROM events
"""


@register("t9_stream_to_lakehouse", oracle=_T9_ORACLE, tags=("T9",))
def t9_stream_to_lakehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """writeStream.foreachBatch appending into a snapshot table — the
    exactly-once-per-batch pattern used for Iceberg sinks. Verifies the
    sink row count equals the source and snapshots recorded the batch.
    Value-ORACLED (r11): the sink count is fixture-derivable; the
    batch/snapshot COUNT is trigger planning (engine-internal), so it
    is pinned as a 0/1 "snapshots recorded" flag."""
    from ..sources.lakehouse import LakehouseTable

    wh = tempfile.mkdtemp(prefix="stream_lake_")
    try:
        s = events_stream(spark, sf_dir).select("event_id", "event_type", "value")
        table = LakehouseTable(spark, wh, "events_sink")

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            if table.current_version() == 0:
                table.create(batch_df)
            else:
                table.append(batch_df)

        q = (
            s.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", wh + "/_ckpt")
            .start()
        )
        await_bounded(q, 300)
        n_sink = table.read().count()
        n_src = load_table(spark, sf_dir, "events").count()
        # no pre-assert on n_sink == n_src (review-pass r17, the a5c
        # rule): the rows_match_source flag below is the hashed
        # carrier of exactly this contract — a raise here made it a
        # constant 1
        n_snaps = table.snapshots().count()
        return spark.createDataFrame(
            [(n_sink, int(n_sink == n_src), int(n_snaps >= 1))],
            "n_sink_rows long, rows_match_source long, "
            "snapshots_recorded long",
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)


# --- T1b: rate source smoke (the non-file stream source) -------------------


_T1B_ORACLE = """
SELECT CAST(1 AS BIGINT) AS produced_rows,
       CAST(1 AS BIGINT) AS contiguous_no_gaps,
       CAST(1 AS BIGINT) AS span_matches_count
"""


@register("t1b_rate_source", oracle=_T1B_ORACLE, tags=("T1",))
def t1b_rate_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rate source (timestamp, value) — the canonical synthetic
    stream. No availableNow support, so run one processingTime trigger
    and stop; self-verifies monotonically increasing `value` with no
    gaps, i.e. exactly-once delivery within the run. The row VOLUME is
    wall-clock-dependent, so the contract is oracled as 0/1 flags
    (r11): produced rows, gap-free ids, and span == count."""
    import uuid as _uuid

    name = "s" + _uuid.uuid4().hex[:10]
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .option("numPartitions", "2")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    import time as _t

    deadline = _t.time() + 20
    while _t.time() < deadline and spark.table(name).count() == 0:
        _t.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    out = spark.table(name)
    vals = sorted(r.value for r in out.select("value").collect())
    # flags computed with NO preceding raise (review-pass r17, the a5c
    # rule): the old raises fired on the same conditions BEFORE the
    # flags were built, so the hashed flags were constant 1 and a
    # rate-source gap/dup could never hash-red — it aborted the whole
    # driver sweep instead
    return spark.createDataFrame(
        [
            (
                int(len(vals) > 0),
                int(
                    bool(vals)
                    and vals == list(range(vals[0], vals[0] + len(vals)))
                ),
                int(bool(vals) and vals[-1] - vals[0] + 1 == len(vals)),
            )
        ],
        "produced_rows long, contiguous_no_gaps long, "
        "span_matches_count long",
    )


# --- T8b: stream-stream join (watermarked, time-bounded) --------------------

_T8B_ORACLE = """
SELECT
  c.user_id,
  count(*) AS n_pairs
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 2 HOUR
GROUP BY c.user_id
ORDER BY c.user_id
"""


@register("t8b_stream_stream_join", oracle=_T8B_ORACLE, tags=("T8",))
def t8b_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: purchases within 2h after a
    click by the same user. The time-bound condition is what lets Spark
    expire join state (both sides watermarked); the batch oracle is the
    same interval join in SQL. Output rolled up per user (pair-level
    output order isn't comparable)."""
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 2 HOUR")),
        "inner",
    )
    out = run_to_memory(joined.select(F.col("c_user").alias("user_id")), "append")
    return (
        out.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


# --- T6b: dropDuplicatesWithinWatermark -------------------------------------

_T6B_ORACLE = """
SELECT event_type, count(DISTINCT event_id) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("t6b_dedup_within_watermark", oracle=_T6B_ORACLE, tags=("T6", "T5"))
def t6b_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: like streaming dedup (t6) but state
    for a key is held only within the watermark delay — the bounded-state
    variant for unbounded key spaces. Input duplicated 2x; with one
    availableNow batch every duplicate falls inside the watermark window,
    so the result equals single-copy distinct (the oracle)."""
    import os

    src = tempfile.mkdtemp(prefix="stream_dwm_")
    try:
        # zoned TIMESTAMP for withWatermark (NTZ rejected; UTC session)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
        )
        ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "c1"))
        ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "c2"))
        stream = spark.readStream.schema(ev.schema).parquet(src + "/*/")
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        out = run_to_memory(agg, "complete")
        return out.orderBy("event_type")
    finally:
        shutil.rmtree(src, ignore_errors=True)


# --- T10: streaming MERGE upsert (foreachBatch CDC apply) -------------------


def _run_upsert_stream(spark, sf_dir, wh, table_name):
    """Shared t10/t10b machinery (review-pass finding: two verbatim
    copies would silently drift): stage two overlapping event
    micro-batches (event_id % 60 in {0,20} and {20,40}) as single
    parquet files, then run the foreachBatch MERGE upsert stream to
    completion. Returns (table, b1, b2)."""
    import os

    from ..sources.lakehouse import LakehouseTable

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .withColumn("__r", F.col("event_id") % 60)
    )
    b1 = ev.filter(F.col("__r").isin(0, 20)).drop("__r")
    b2 = ev.filter(F.col("__r").isin(20, 40)).drop("__r")
    src_dir = os.path.join(wh, "incoming")
    os.makedirs(src_dir)
    for name, b in (("b1", b1), ("b2", b2)):
        tmp_out = os.path.join(wh, f"_w_{name}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        part = next(f for f in os.listdir(tmp_out) if f.endswith(".parquet"))
        os.rename(
            os.path.join(tmp_out, part),
            os.path.join(src_dir, f"{name}.parquet"),
        )

    table = LakehouseTable(spark, wh, table_name)
    table.create(b1.limit(0).withColumn("n_seen", F.lit(1).cast("int")))

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        src = batch_df.withColumn("n_seen", F.lit(1).cast("int"))
        table.merge_into(
            src,
            on="event_id",
            update_cols={"n_seen": F.col("n_seen") + F.lit(1)},
            insert=True,
            validate_source_keys=False,  # event_id unique per batch
        )

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")  # force one MERGE per file
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", wh + "/_ckpt")
        .start()
    )
    # a timed-out stream must FAIL HERE, not fall through to a
    # partially-merged sink that reads as a MERGE-semantics bug
    # (review-pass finding); await_bounded stops+raises on timeout
    await_bounded(q, 300)
    return table, b1, b2


_T10_ORACLE = """
SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS n_keys,
       CAST(count(DISTINCT CASE WHEN event_id % 60 = 20
                                THEN event_id END) AS BIGINT) AS n_twice,
       CAST(1 AS BIGINT) AS counts_ok
FROM events WHERE event_id % 60 IN (0, 20, 40)
"""


@register("t10_stream_merge_upsert", oracle=_T10_ORACLE, tags=("T9", "M1"))
def t10_stream_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE INTO the snapshot table — the streaming-CDC
    upsert pattern Iceberg users run (each micro-batch merges on the
    key instead of appending). Two file micro-batches with overlapping
    keys; self-verifies ORDER-INDEPENDENTLY: every key appears once,
    and n_seen == 2 exactly for the keys present in both batches.

    (A production job would also fence on batch_id for replay
    idempotence; availableNow over a static dir gives exactly-once
    here.)
    """
    wh = tempfile.mkdtemp(prefix="stream_merge_")
    try:
        table, b1, b2 = _run_upsert_stream(spark, sf_dir, wh, "events_upsert")
        got = table.read().select("event_id", "n_seen").collect()
        seen = {r.event_id: r.n_seen for r in got}
        # key-dup and overlap-drift stay asserts (no returned cell can
        # carry them); the per-key upsert-count contract rides the
        # hashed counts_ok flag with NO pre-assert (review-pass r17,
        # the a5c rule — the old assert made the flag a constant 1)
        assert len(seen) == len(got), "merge key duplicated in sink"
        expect2 = {r.event_id for r in b1.join(b2, "event_id").collect()}
        assert expect2 and len(seen) > len(expect2), "fixture overlap drift"
        bad = {k for k, n in seen.items() if n != (2 if k in expect2 else 1)}
        # value-ORACLED r11: key/overlap counts are fixture-derivable
        # (%60 buckets); the snapshot COUNT is trigger planning, so
        # the per-key upsert correctness rides the counts_ok flag
        return spark.createDataFrame(
            [(len(seen), len(expect2), int(not bad))],
            "n_keys long, n_twice long, counts_ok long",
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)


# --- T10b: streaming upsert final-state value oracle ------------------------
# t10 self-asserts the foreachBatch MERGE mechanics; this twin
# hash-proves the SINK CONTENT: after two micro-batches (overlap on
# event_id % 60 == 20) upsert via MERGE, the table must hold every
# key once with n_seen = 2 exactly on the overlap — derived from the
# fixture in DuckDB. Batch-equivalent streaming + DML in one
# hash-checked frame (keep-target UPDATE semantics make the
# non-counter columns provably stable across re-merges).

_T10B_ORACLE = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       value,
       CAST(CASE WHEN event_id % 60 = 20 THEN 2 ELSE 1 END AS BIGINT)
         AS n_seen
FROM events WHERE event_id % 60 IN (0, 20, 40)
ORDER BY event_id
"""


@register(
    "t10b_stream_upsert_final_state",
    oracle=_T10B_ORACLE,
    tags=("T9", "T10", "M1"),
)
def t10b_stream_upsert_final_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    wh = tempfile.mkdtemp(prefix="stream_merge_vo_")
    try:
        table, _b1, _b2 = _run_upsert_stream(
            spark, sf_dir, wh, "events_upsert_vo"
        )
        out = table.read().select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            "value",
            F.col("n_seen").cast("long").alias("n_seen"),
        ).orderBy("event_id")
        return out.localCheckpoint()  # temp warehouse removed in finally
    finally:
        shutil.rmtree(wh, ignore_errors=True)


# --- T11: deterministic split under streaming ------------------------------

_T11_ORACLE = """
WITH labeled AS (
  SELECT event_id,
         CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
         % 10000 AS b
  FROM events
)
SELECT CASE WHEN b < 1000 THEN 'test'
            WHEN b < 2000 THEN 'val'
            ELSE 'train' END AS split,
       count(*) AS n_events,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM labeled GROUP BY 1 ORDER BY split
"""


@register("t11_stream_hash_split", oracle=_T11_ORACLE, tags=("T1", "X6"))
def t11_stream_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed train/val/test split under Structured
    Streaming: hash_split (operators/sampling.py) is a pure map-side
    function of the key — no state store, no seed, no partition-layout
    dependence — so the SAME rows get the SAME split whether the corpus
    arrives as a batch or as a stream. One availableNow pass over the
    events file; the complete-mode per-split counts hash-match the
    batch DuckDB oracle, proving batch/stream split equivalence."""
    import os

    from ..operators.sampling import hash_split

    src = tempfile.mkdtemp(prefix="stream_split_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id")
        ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "c1"))
        stream = spark.readStream.schema(ev.schema).parquet(src + "/*/")
        labeled = hash_split(stream, "event_id", val=0.1, test=0.1)
        agg = labeled.groupBy("split").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").alias("id_sum"),
        )
        out = run_to_memory(agg, "complete")
        return out.orderBy("split")
    finally:
        shutil.rmtree(src, ignore_errors=True)


# --- T12: RocksDB state store — the 100 TB state path, proven locally ------

_T12_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT)        AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("t12_rocksdb_state_store", oracle=_T12_ORACLE, tags=("T7", "X6"))
def t12_rocksdb_state_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming aggregation under the RocksDB state store
    provider — the exact configuration that takes streaming state past
    executor-heap limits at 100 TB/day (state spills to local SSD
    instead of living on the JVM heap; rocksdbjni ships with Spark).

    The provider is a pure config swap; results must be IDENTICAL to
    the default HDFS-backed store, and here they are hash-verified
    against the batch DuckDB oracle. The conf is restored afterward so
    other streaming queries keep their provider."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        s = events_stream(spark, sf_dir).select("event_type", "user_id")
        # exact distinct users via complete-mode dedup-then-count: the
        # dedup state (held in RocksDB) stores one entry per
        # (event_type, user_id) pair — the state the provider swap is
        # exercising
        deduped = s.dropDuplicates(["event_type", "user_id"])
        users = deduped.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_users")
        )
        out_events = run_to_memory(
            s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events")),
            "complete",
        )
        out_users = run_to_memory(users, "complete")
        return (
            out_events.join(out_users, "event_type")
            .select("event_type", "n_events", "n_users")
            .orderBy("event_type")
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# --- T13: rate-limited file ingestion (maxFilesPerTrigger) ------------------


_T13_ORACLE = """
SELECT CAST(1 AS BIGINT) AS rate_limited,
       CAST(1 AS BIGINT) AS exactly_once,
       CAST(count(*) AS BIGINT) AS n_rows
FROM nation
"""


@register("t13_max_files_per_trigger", oracle=_T13_ORACLE, tags=("T1",))
def t13_max_files_per_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill-style rate limiting: maxFilesPerTrigger=1 over a 4-file
    directory under trigger(availableNow=True). availableNow drains the
    whole backlog but HONORS the source rate limit, planning one
    micro-batch per file — the knob that keeps a 100 TB backfill from
    materializing as one giant batch (bounded state, bounded shuffle
    per trigger, steady checkpoint cadence).

    Self-verifies exactly-once across the batch sequence: at least one
    micro-batch per file, per-batch counts sum to the source total, and
    the union of per-batch key sets equals the source key set (nothing
    lost, nothing duplicated). Value-ORACLED (r11): which keys land in
    which micro-batch is file-layout bookkeeping, so the contract is
    pinned as flags plus the fixture-derivable total."""
    import os as _os
    import tempfile as _tf

    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    src_keys = {r.n_nationkey for r in nat.collect()}  # 25 rows, bounded
    path = _tf.mkdtemp(prefix="t13_files_")
    try:
        nat.repartition(4).write.mode("overwrite").parquet(path)
        n_files = sum(1 for f in _os.listdir(path) if f.endswith(".parquet"))
        schema = spark.read.parquet(path).schema
        batches: list[tuple[int, int, set]] = []

        def sink(df: DataFrame, bid: int) -> None:
            rows = df.collect()  # bounded: <= 25 rows per batch
            batches.append((bid, len(rows), {r.n_nationkey for r in rows}))

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(path)
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        await_bounded(q, 300)
        nonempty = [b for b in batches if b[1] > 0]
        # flags computed with NO preceding raise (review-pass r17, the
        # a5c rule): the old raises pre-asserted every returned cell,
        # so the oracle hash could never observe a rate-limit or
        # exactly-once violation — it aborted the sweep instead.
        # no_overlap is folded INTO the exactly_once flag: a key seen
        # in two micro-batches is a duplicate delivery even when the
        # union still covers the source.
        got_keys: set = set()
        overlap = False
        total = 0
        for _bid, n, keys in batches:
            if got_keys & keys:
                overlap = True
            got_keys |= keys
            total += n
        return spark.createDataFrame(
            [
                (
                    int(len(nonempty) >= n_files),
                    int(
                        not overlap
                        and total == len(src_keys)
                        and got_keys == src_keys
                    ),
                    total,
                )
            ],
            "rate_limited long, exactly_once long, n_rows long",
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- T8c: stream-stream LEFT OUTER join (watermarked) -----------------------
# The outer variant is the semantically hard one: an unmatched click can
# only emit its NULL row once the watermark proves no purchase can still
# arrive inside its 2h window — i.e. outer results are *state
# expiration* events. A sentinel event far past the fixture's horizon is
# appended to BOTH sides so the watermark sweeps every real row out of
# state before the availableNow run terminates, making the streamed
# result equal the batch LEFT JOIN (the oracle) deterministically.
# Without the sentinel the trailing 3h of clicks would sit in state
# forever — the exact production behavior (outer rows trail the
# watermark), reproduced and then closed out.

_T8C_ORACLE = """
SELECT
  c.user_id,
  CAST(count(*) AS BIGINT)    AS n_rows,
  CAST(count(p.ts) AS BIGINT) AS n_matched
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 2 HOUR
GROUP BY c.user_id
ORDER BY c.user_id
"""


@register("t8c_stream_stream_outer", oracle=_T8C_ORACLE, tags=("T8",))
def t8c_stream_stream_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    src = tempfile.mkdtemp(prefix="stream_sso_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
        )
        flush_ts = ev.agg(
            F.date_add(F.max("ts").cast("date"), 30).cast("timestamp")
        ).collect()[0][0]
        # sentinel on an impossible user so it joins nothing; one per side
        sentinel = spark.createDataFrame(
            [(-1, flush_ts, "click"), (-1, flush_ts, "purchase")],
            "user_id long, ts timestamp, event_type string",
        )
        ev.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "data")
        )
        schema = "user_id long, ts timestamp, event_type string"

        def side(evt: str, ucol: str, tcol: str) -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .parquet(os.path.join(src, "data"))
                .filter(F.col("event_type") == evt)
                .select(F.col("user_id").alias(ucol), F.col("ts").alias(tcol))
                .withWatermark(tcol, "1 hour")
            )

        joined = side("click", "c_user", "c_ts").join(
            side("purchase", "p_user", "p_ts"),
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 2 HOUR")),
            "left_outer",
        )
        out = run_to_memory(
            joined.select("c_user", "p_ts"), "append"
        ).filter(F.col("c_user") >= 0)
        # force materialization BEFORE the temp dir is deleted — the
        # memory sink holds rows, but out is lazy over it plus filters
        res = (
            out.groupBy(F.col("c_user").alias("user_id"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("p_ts").alias("n_matched"),
            )
            .orderBy("user_id")
        )
        res.collect()
        return res
    finally:
        shutil.rmtree(src, ignore_errors=True)


# --- T15: checkpoint recovery across restarts -------------------------------
# The durability half of exactly-once: a streaming query's WAL/offset
# checkpoint must let a RESTARTED query resume where the previous run
# stopped — no reprocessing, no loss — which is what makes a 100 TB
# continuous pipeline safely killable. Two runs against one checkpoint:
# run 1 drains file A; file B lands; run 2 (same checkpoint, fresh
# query object) must emit exactly B. A parquet sink makes duplicates
# visible as row-count inflation. The returned counts are all
# fixture-derivable, so the contract is value-ORACLED (r11): a
# duplicate or a loss changes n_sink_rows/n_sink_keys and hash-reds.


_T15_ORACLE = """
SELECT CAST(sum(CASE WHEN n_nationkey < 12 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_run1,
       CAST(sum(CASE WHEN n_nationkey >= 12 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_run2,
       CAST(count(*) AS BIGINT) AS n_sink_rows,
       CAST(count(*) AS BIGINT) AS n_sink_keys
FROM nation
"""


@register(
    "t15_checkpoint_recovery", oracle=_T15_ORACLE, tags=("T15", "T1", "T9")
)
def t15_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    root = tempfile.mkdtemp(prefix="t15_ckpt_")
    src, sink, ckpt = (
        _os.path.join(root, d) for d in ("src", "sink", "ckpt")
    )
    try:
        nat = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        a = nat.filter(F.col("n_nationkey") < 12)
        b = nat.filter(F.col("n_nationkey") >= 12)
        n_a, n_b = a.count(), b.count()
        _os.makedirs(src)
        a.coalesce(1).write.parquet(_os.path.join(src, "fileA"))

        def run_once() -> None:
            q = (
                spark.readStream.schema(nat.schema)
                .parquet(src + "/*/")
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            await_bounded(q, 180)

        run_once()
        got_a = spark.read.parquet(sink)
        if got_a.count() != n_a:
            raise AssertionError(f"run 1 wrote {got_a.count()} rows, want {n_a}")

        b.coalesce(1).write.parquet(_os.path.join(src, "fileB"))
        run_once()  # fresh query, SAME checkpoint: must process only B

        final = spark.read.parquet(sink).cache()
        try:
            n_rows = final.count()
            n_keys = final.select("n_nationkey").distinct().count()
            if n_rows != n_a + n_b or n_keys != n_a + n_b:
                raise AssertionError(
                    f"checkpoint recovery broken: {n_rows} rows / {n_keys} "
                    f"keys, want {n_a + n_b} each (dup => reprocessed A)"
                )
            return spark.createDataFrame(
                [(n_a, n_b, n_rows, n_keys)],
                "n_run1 long, n_run2 long, n_sink_rows long, n_sink_keys long",
            )
        finally:
            final.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --- T16: lakehouse table as a STREAMING SOURCE -----------------------------
# `spark.readStream.format("iceberg")` parity for the snapshot layer:
# offsets are snapshot versions, each micro-batch is the manifest diff
# (sources/pyds.py::LakehouseStreamDataSource). Self-verified: the
# streamed multiset equals the table content exactly once across three
# append commits, and a RESTARTED run against the same checkpoint after
# one more append emits ONLY the delta (version offsets checkpoint like
# file offsets; parquet sink so recovery is supported and duplicates
# would surface as row-count inflation). The returned counts are
# fixture-derivable (nation spans the three appends exactly once; the
# post-restart delta is the 3 relabeled rows), so the exactly-once
# contract is value-ORACLED (r11).

_T16_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_table,
       CAST(count(*) AS BIGINT) AS n_streamed,
       CAST(3 AS BIGINT) AS n_delta
FROM nation
"""


@register(
    "t16_lakehouse_stream_source", oracle=_T16_ORACLE, tags=("T16", "T1", "S8")
)
def t16_lakehouse_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from ..sources.lakehouse import LakehouseTable
    from ..sources.pyds import register_lakehouse_stream

    register_lakehouse_stream(spark)
    root = tempfile.mkdtemp(prefix="t16_lh_stream_")
    try:
        nat = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        t = LakehouseTable(spark, root, "nation_stream")
        t.create(nat.filter(F.col("n_nationkey") < 10).coalesce(1))
        t.append(
            nat.filter(F.col("n_nationkey").between(10, 17)).coalesce(1)
        )
        t.append(nat.filter(F.col("n_nationkey") > 17).coalesce(1))
        n_total = nat.count()

        ckpt = _os.path.join(root, "_ckpt")
        sink = _os.path.join(root, "_sink")

        def run_stream() -> None:
            q = (
                spark.readStream.format("lakehouse_stream")
                .option("table_root", t.root)
                .load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            await_bounded(q, 180)

        run_stream()
        got = spark.read.parquet(sink)
        n_stream = got.count()
        # no pre-assert on n_stream (review-pass r17, the a5c rule):
        # the returned n_streamed cell must be free to diverge from
        # the oracle on a snapshot-source loss/duplication — the old
        # raise made the hash compare unreachable for exactly the
        # contract the docstring claims is value-oracled
        # incremental restart: only the new append may surface
        t.append(
            nat.filter(F.col("n_nationkey") < 3)
            .select(
                (F.col("n_nationkey") + 500).alias("n_nationkey"),
                "n_name",
                "n_regionkey",
            )
            .coalesce(1)
        )
        run_stream()
        all_keys = {
            r.n_nationkey
            for r in spark.read.parquet(sink).select("n_nationkey").collect()
        }
        n_after = spark.read.parquet(sink).count()
        # key-presence stays an assert (the n_delta COUNT cell cannot
        # see WHICH keys arrived); the row-count contract itself rides
        # the hashed n_streamed/n_delta cells with no pre-assert
        if not {500, 501, 502} <= all_keys:
            raise AssertionError(
                f"incremental run missed the appended keys: {all_keys}"
            )
        return spark.createDataFrame(
            [(n_total, n_stream, n_after - n_stream)],
            "n_table long, n_streamed long, n_delta long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --- T17: StreamingQueryListener (ops telemetry contract) -------------------
# Production streaming is operated through progress events — rows/sec,
# batch durations, state size — not by reading results. The Python
# StreamingQueryListener (SPARK-42941) is that surface; this query
# attaches one, drains a bounded stream, and asserts the listener's
# accounting reconciles with ground truth: queryStarted fired, every
# progress event's numInputRows sums to the source row count, and
# queryTerminated fired without error. The reconciliation is
# value-ORACLED (r11): lifecycle facts as 0/1 flags (the microbatch
# COUNT is engine-internal, so only "progress events exist" is
# pinned) and the rows-seen totals against the fixture count.

_T17_ORACLE = """
SELECT CAST(1 AS BIGINT) AS lifecycle_started,
       CAST(1 AS BIGINT) AS has_progress_events,
       CAST(count(*) AS BIGINT) AS rows_seen,
       CAST(count(*) AS BIGINT) AS rows_src
FROM events
"""


@register("t17_streaming_listener", oracle=_T17_ORACLE, tags=("T17", "T1"))
def t17_streaming_listener(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming import StreamingQueryListener

    events: dict = {"started": 0, "progress_rows": [], "terminated": 0, "errors": []}

    class Audit(StreamingQueryListener):
        def onQueryStarted(self, e):
            events["started"] += 1

        def onQueryProgress(self, e):
            events["progress_rows"].append(e.progress.numInputRows)

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events["terminated"] += 1
            if e.exception is not None:
                events["errors"].append(str(e.exception))

    listener = Audit()
    spark.streams.addListener(listener)
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
        n_src = ev.count()
        src = tempfile.mkdtemp(prefix="t17_listener_")
        try:
            ev.coalesce(2).write.mode("overwrite").parquet(src)
            stream = (
                spark.readStream.schema(ev.schema)
                .parquet(src)
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            out = run_to_memory(stream, "complete")
            n_out = out.agg(F.sum("n")).collect()[0][0]
        finally:
            shutil.rmtree(src, ignore_errors=True)
        # listener callbacks are delivered async on the listener bus —
        # bounded wait for the terminate event before auditing
        import time as _time

        for _ in range(100):
            if events["terminated"] >= 1 and events["progress_rows"]:
                break
            _time.sleep(0.1)
        # errors and the terminated event stay asserts (NO returned
        # cell carries them); the started flag, progress-event flag,
        # and rows_seen reconciliation ride the hashed cells with no
        # pre-assert (review-pass r17, the a5c rule: the old raises
        # made every returned cell constant, so a listener-accounting
        # regression could never hash-red)
        if events["terminated"] < 1:
            raise AssertionError(f"queryTerminated never fired: {events}")
        if events["errors"]:
            raise AssertionError(f"stream reported errors: {events['errors']}")
        if n_out != n_src:
            raise AssertionError(f"sink rows {n_out} != source {n_src}")
        rows_seen = sum(events["progress_rows"])
        return spark.createDataFrame(
            [
                (
                    int(events["started"] >= 1),
                    int(len(events["progress_rows"]) >= 1),
                    rows_seen,
                    n_src,
                )
            ],
            "lifecycle_started long, has_progress_events long, "
            "rows_seen long, rows_src long",
        )
    finally:
        spark.streams.removeListener(listener)


# --- T18: streaming ingest dedup against the historical corpus --------------
# The continuous-crawl ingestion shape: new documents arrive as a
# stream, and a doc is NEW only if its content digest is (a) not
# already in the historical corpus and (b) not already seen earlier in
# the stream itself. (a) goes through stream_anti_history
# (streaming/jobs.py): the DEFAULT scale path probes an x24-style
# bloom over the history digests IN-STREAM — not-in-bloom rows are
# definitely new and skip the join; only the flagged slice (true dups
# + tunable false positives) exact-joins the history — with a
# broadcast LEFT ANTI fast path while the history fits (r9 verdict
# #5: the bloom path is the default at scale, FORCED here so the
# driver row proves it; both paths are batch-equivalent by
# construction, so the oracle is path-independent). (b) is streaming
# dropDuplicates state. Both sides key on md5(text) — 16-byte
# digests, never text; the dedup state store holds digests. Batch-equivalent, so fully ORACLED: history = docs
# with doc_id % 3 != 0; the stream replays the WHOLE corpus plus a
# second copy of every doc_id % 5 == 0 doc (internal stream dups —
# exercises (b) non-vacuously).

_T18_ORACLE = """
WITH hist AS (
  SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 3 <> 0
),
cand AS (SELECT DISTINCT lang, md5(text) AS digest FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_new
FROM cand
WHERE digest NOT IN (SELECT digest FROM hist)
GROUP BY lang ORDER BY lang
"""


@register("t18_stream_dedup_history", oracle=_T18_ORACLE, tags=("T18", "T6", "T8", "X1"))
def t18_stream_dedup_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    d = load_table(spark, sf_dir, "documents").select(
        "lang", F.md5("text").alias("digest")
    )
    # cache: the digest frame (16-byte digests, never text) feeds the
    # bloom's sizing count, the bloom build scan, AND the flagged-slice
    # anti-join — three jobs over one bounded materialization. At real
    # scale the caller passes m_bits explicitly (skipping the count)
    # and lets the two remaining scans hit the lakehouse directly.
    hist = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 != 0)
        .select(F.md5("text").alias("digest"))
        .distinct()
        .cache()
    )
    src = tempfile.mkdtemp(prefix="stream_hist_")
    try:
        # repartition(1), not coalesce(1): coalesce folds the md5 scan
        # itself into ONE task; repartition keeps the hash parallel and
        # only the tiny digest shuffle feeds the single file writer
        d.repartition(1).write.mode("overwrite").parquet(
            os.path.join(src, "c1")
        )
        load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 5 == 0
        ).select("lang", F.md5("text").alias("digest")).repartition(
            1
        ).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, "c2"))
        stream = spark.readStream.schema(d.schema).parquet(src + "/*/")
        # (lang, digest) dedup key, not digest alone: identical text in
        # two languages must not race on arrival order for which lang
        # keeps it — the oracle's DISTINCT (lang, digest) matches
        from ..streaming.jobs import stream_anti_history

        new = stream_anti_history(
            stream.dropDuplicates(["lang", "digest"]),
            hist,
            "digest",
            force_bloom=True,  # fixture history is tiny; force the
            # scale path so the driver row exercises bloom + slice-join
        )
        agg = new.groupBy("lang").agg(F.count(F.lit(1)).alias("n_new"))
        # State-store partition pin (VERDICT r12 #7): two stateful
        # operators (dedup + complete-mode agg) each spawn one
        # state-store task PER shuffle partition PER microbatch — at
        # the session's 32+ partitions that is the measured dominant
        # cost of this query at fixture scale (t18 swung 6.5/4.4/6.9 s
        # across r10-r12 with an unchanged plan; the data itself is
        # ~60k 16-byte digests). Pin 8 partitions for the stream run
        # only (j13-style try/finally conf scope; the memory-sink
        # result is materialized before restore). At 100 TB the
        # session default is right — the pin is fixture-scale tuning
        # of task COUNT, not a plan-shape change (same nodes, same
        # state semantics at any partition count).
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            out = run_to_memory(agg, "complete")
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        return out.orderBy("lang")
    finally:
        hist.unpersist()
        shutil.rmtree(src, ignore_errors=True)
