"""Skew-aware join (SURVEY.md §2.12 X6 mandate).

AQE's skew-join handling splits oversized *partitions* at runtime; for
pathologically hot keys (one key ≫ everything else) explicit salting is
still the reliable tool: replicate the small side N ways, scatter the
big side's hot rows across N sub-keys, join on (key, salt). The join
result is semantically identical to the unsalted join — which is
exactly how the oracle checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_n_salts(n_salts: int) -> None:
    # pmod(x, 0) is NULL in Spark: a zero/negative salt count doesn't
    # raise, it silently empties the join (NULL never equi-matches) or
    # un-salts the window — the same silent-failure class the `how`
    # guard rejects loudly
    if not isinstance(n_salts, int) or n_salts < 1:
        raise ValueError(f"n_salts must be an integer >= 1, got {n_salts!r}")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across n_salts sub-keys.

    big rows get salt = pmod(xxhash64(whole row key + monotonic bits), n)
    — deterministic per row; small rows are replicated once per salt
    (explode over sequence). Shuffle keys become (on, salt): a hot key's
    rows now land on n_salts reducers instead of one.

    ``how`` is restricted to join types that preserve the unsalted
    join's semantics under small-side REPLICATION: inner/left/semi/anti
    key each big row through its single salt, so they are exact. A
    right/full/right_semi join would surface every unmatched SMALL row
    once per salt (n_salts duplicates) — rejected loudly rather than
    silently multiplying rows.
    """
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi",
               "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not replication-safe — the "
            "small side is replicated n_salts times, so right/full "
            "joins would duplicate unmatched small rows; use "
            "inner/left/semi/anti"
        )
    _check_n_salts(n_salts)
    if "__salt" in big.columns or "__salt" in small.columns:
        # withColumn would silently REPLACE the caller's column and the
        # trailing drop would remove it from the output (review-pass
        # r16, reproduced) — the silent-overwrite class
        # chunked_exclusive_prefix already guards
        raise ValueError(
            "salted_join: input already has a __salt column — rename it"
        )
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_big.join(replicated_small, [on, "__salt"], how)
    return out.drop("__salt")


def salted_top_k(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list,
    k: int,
    n_salts: int = 32,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-key top-k rows, skew-proof: the two-phase salted spelling of
    the x33 per-host quota (per-key top-k is SALT-COMPOSABLE — the
    top-k of a union is the top-k of per-salt top-ks).

    Phase 1 ranks within (key, salt) and keeps k rows per sub-key, so a
    pathologically hot key (the mega-host problem) is ranked by
    n_salts tasks instead of one; phase 2 re-ranks the <= n_salts*k
    survivors per key. Salt is a deterministic content hash of the
    whole row, so the result is layout-invariant.

    ``order_cols`` MUST be a total order within every key (add a
    unique-id tie-break, as x33 does with doc_id): with ties at the
    k boundary, *which* tied row survives phase 1 depends on its salt,
    and equivalence with the single-window spelling only holds when
    the order admits no ties.

    ``rank_col``, when given, keeps phase 2's per-key rank (1..k) under
    that name — phase 2 runs on the bounded <= n_salts*k survivors per
    key, so exposing its rank costs nothing extra.
    """
    _check_n_salts(n_salts)
    if "__salt" in df.columns or "__rk1" in df.columns:
        raise ValueError(
            "salted_top_k: input already has a __salt/__rk1 column — "
            "rename it (withColumn would silently replace it and the "
            "phase-1 drop would remove it from the output)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(*order_cols)
    phase1 = (
        df.withColumn("__salt", salt)
        .withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= k)
        .drop("__salt", "__rk1")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    out = phase1.withColumn("__rk", F.row_number().over(w2)).filter(
        F.col("__rk") <= k
    )
    if rank_col is None:
        return out.drop("__rk")
    return out.withColumnRenamed("__rk", rank_col)


def quantile_chunk_expr(df: DataFrame, col: str, n_chunks: int = 8):
    """Monotone chunk id for ``col``: the count of approxQuantile
    boundaries <= the value. Ties always share a chunk and the id is
    monotone in the value, so chunk-local prefix sums compose with a
    driver-side offset into exact global order statistics — the
    load-bearing property of every chunked respell (percent ranks,
    discrete quantiles, x50's packing offsets). Balance is
    approximate; correctness never depends on it."""
    if n_chunks <= 1:
        # degenerate single-chunk config: approxQuantile rejects an
        # empty probability list (property-test finding, r12)
        return F.lit(0)
    probs = [i / n_chunks for i in range(1, n_chunks)]
    (bounds,) = df.stat.approxQuantile([col], probs, 0.01)
    e = F.lit(0)
    for b in sorted(set(bounds)):
        e = e + F.when(F.col(col) >= F.lit(float(b)), 1).otherwise(0)
    return e


def chunked_exclusive_prefix(
    df: DataFrame,
    order_col: str,
    sum_col: str,
    part_cols: tuple[str, ...] = (),
    n_chunks: int = 8,
    out_col: str = "excl",
) -> DataFrame:
    """EXCLUSIVE running sum of ``sum_col`` in global ``order_col``
    order — per ``part_cols`` when given — with NO full-granularity
    window on a low-cardinality (or absent) partition key: chunk the
    order axis monotonically (quantile_chunk_expr), take chunk-LOCAL
    exclusive window cumsums, collect the bounded per-(part, chunk)
    totals, exclusive-prefix them on the driver and broadcast back as
    offsets. The x50/x31 sequence-packing spelling, shared (review-pass
    r12 — the two inline copies had already drifted one variable name
    apart).

    Returns df's columns plus ``chunk`` (int) and ``out_col`` (long).
    ``df`` should be cheap to rescan or already materialized (both
    packing callers localCheckpoint a narrow frame first): the chunk
    boundary scan, the totals job and the consumer each evaluate it.

    ``part_cols``, ``order_col`` and ``sum_col`` must be non-NULL (the
    chunked_percent_ranks contract): the offsets come back through a
    null-unsafe equi-join, so a NULL partition key would silently drop
    its rows instead of forming its own partition the way a native
    window would, and an all-NULL (key, chunk) total breaks the driver
    prefix (review-pass r12). Callers satisfy this by construction —
    x31's lang survives an inner join, x50 passes no part_cols — and
    the contract is ENFORCED on the bounded totals collect (ValueError,
    ADVICE r12): a violation fails fast instead of silently dropping
    rows.
    """
    if {"chunk", "__off", out_col} & set(df.columns):
        # withColumn would overwrite the caller's column and the
        # offsets join would then key on kernel-internal values,
        # silently corrupting results (ADVICE r12; out_col included —
        # review-pass r13: a pre-existing output column is the same
        # silent-overwrite class)
        raise ValueError(
            "chunked_exclusive_prefix: input must not already have "
            f"'chunk', '__off' or '{out_col}' columns"
        )
    spark = df.sparkSession
    chunk_expr = quantile_chunk_expr(df, order_col, n_chunks)
    w_loc = (
        Window.partitionBy(*part_cols, "chunk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = df.withColumn("chunk", chunk_expr.cast("int")).withColumn(
        out_col,
        F.coalesce(F.sum(sum_col).over(w_loc), F.lit(0)).cast("long"),
    )
    totals = (
        loc.groupBy(*part_cols, "chunk")
        .agg(
            F.sum(sum_col).alias("t"),
            # non-NULL contract enforcement, piggybacked on the totals
            # job so it costs no extra pass (ADVICE r12)
            F.sum(
                F.col(order_col).isNull().cast("long")
                + F.col(sum_col).isNull().cast("long")
            ).alias("__nulls"),
        )
        .collect()
    )  # bounded: |parts| * n_chunks rows
    acc: dict[tuple, int] = {}
    rows = []
    for r in sorted(
        totals, key=lambda r: ([str(r[c]) for c in part_cols], r["chunk"])
    ):
        key = tuple(r[c] for c in part_cols)
        if any(k is None for k in key) or (r["__nulls"] or 0) > 0:
            raise ValueError(
                "chunked_exclusive_prefix: part_cols/order_col/sum_col "
                "must be non-NULL (null-unsafe offsets join would "
                "silently drop rows)"
            )
        rows.append((*key, int(r["chunk"]), acc.get(key, 0)))
        acc[key] = acc.get(key, 0) + int(r["t"])

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    offsets = spark.createDataFrame(
        rows,
        StructType(
            [StructField(c, df.schema[c].dataType) for c in part_cols]
            + [
                StructField("chunk", IntegerType()),
                StructField("__off", LongType()),
            ]
        ),
    )
    return (
        loc.join(F.broadcast(offsets), [*part_cols, "chunk"])
        .withColumn(out_col, F.col(out_col) + F.col("__off"))
        .drop("__off")
    )


def chunked_discrete_percentiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ps: dict[str, float],
    n_chunks: int = 8,
) -> DataFrame:
    """Exact per-key DISCRETE quantiles — the element at 1-indexed rank
    ceil(p*n) of the key's sorted values (DuckDB quantile_disc's
    inverse-CDF rule) — with NO window partitioned on ``key_col``
    alone. The skew-proof respelling of qd8's original
    ``Window.partitionBy(segment)`` over the raw frame (r10 verdict
    #2): a 5-value market-segment key funnels ~1/5 of all orders
    through one task at 100 TB; here every window is partitioned on
    (key, chunk) and the only key-alone shuffles carry frames bounded
    by the number of DISTINCT values, never raw rows.

    Same machinery as chunked_percent_ranks, specialized from
    percent_rank to rank-range membership: a distinct value v with
    cnt occurrences and lt strictly-smaller rows occupies ranks
    [lt+1, lt+cnt]; the discrete p-quantile is the unique v whose
    range contains ceil(p*n).

    Pipeline:
      1. distinct-value counts groupBy(key, val) — combiner-friendly;
         the rank frame is bounded by |distinct values|, not rows;
      2. chunk the value axis by approxQuantile boundaries (balance is
         approximate, correctness never depends on it); chunk-LOCAL
         exclusive prefix sums over windows partitioned by
         (key, chunk);
      3. per-(key, chunk) totals collect to the driver — bounded by
         |keys| * n_chunks rows — exclusive prefix there, broadcast
         back as offsets; per-key row count n comes from the same
         totals;
      4. one bounded groupBy(key) picks, for each (alias, p), the
         value whose global rank range contains ceil(p*n).

    ``value_col`` must be non-NULL. Returns
    (key_col, n_rows, *ps-aliases) with the value column's original
    dtype preserved.
    """
    spark = df.sparkSession
    chunk_expr = quantile_chunk_expr(df, value_col, n_chunks)

    # localCheckpoint, not .cache() (ADVICE r11): the distinct-value
    # frame feeds BOTH the bounded totals collect and the caller's
    # final pass, but a CacheManager entry is never auto-dropped — in
    # the long-lived 296-query driver session every call would pin
    # executor memory forever. Checkpoint blocks are GC-cleaned with
    # the RDD reference once the caller's result is materialized and
    # released, and the window/join nodes ABOVE it stay visible to the
    # plan guards. (Caveat at scale: local checkpoints don't survive
    # executor loss — acceptable for a frame this cheap to recompute.)
    vc = (
        df.groupBy(key_col, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("chunk", chunk_expr)
        .localCheckpoint()
    )
    w_loc = (
        Window.partitionBy(key_col, "chunk")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = vc.withColumn(
        "lt_loc", F.coalesce(F.sum("cnt").over(w_loc), F.lit(0))
    )

    totals = (
        vc.groupBy(key_col, "chunk").agg(F.sum("cnt").alias("t")).collect()
    )  # <= |keys| * n_chunks rows — bounded collect
    acc: dict = {}
    off_rows = []
    for r in sorted(totals, key=lambda r: (str(r[0]), r["chunk"])):
        off = acc.get(r[0], 0)
        off_rows.append((r[0], int(r["chunk"]), off))
        acc[r[0]] = off + int(r["t"])

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    key_type = df.schema[key_col].dataType
    offsets = spark.createDataFrame(
        off_rows,
        StructType(
            [
                StructField(key_col, key_type),
                StructField("chunk", IntegerType()),
                StructField("lt_off", LongType()),
            ]
        ),
    )
    nparts = spark.createDataFrame(
        [(k, int(n)) for k, n in acc.items()],
        StructType(
            [
                StructField(key_col, key_type),
                StructField("n_part", LongType()),
            ]
        ),
    )
    ranked = (
        loc.withColumn("chunk", F.col("chunk").cast("int"))
        .join(F.broadcast(offsets), [key_col, "chunk"])
        .join(F.broadcast(nparts), key_col)
        .withColumn("lt", F.col("lt_loc") + F.col("lt_off"))
    )
    aggs = [F.max("n_part").cast("long").alias("n_rows")]
    for alias, p in ps.items():
        # same ceil(p*n) expression as the single-window spelling —
        # property-pinned against quantile_disc in test_properties
        r = F.ceil(F.col("n_part") * F.lit(p))
        aggs.append(
            F.max(
                F.when(
                    (F.col("lt") < r) & (r <= F.col("lt") + F.col("cnt")),
                    F.col(value_col),
                )
            ).alias(alias)
        )
    return ranked.groupBy(key_col).agg(*aggs)


def chunked_percent_ranks(
    df: DataFrame,
    part_col: str,
    value_cols: list[str],
    id_cols: list[str],
    n_chunks: int = 8,
    out_prefix: str = "pr_",
    keep_vals: bool = False,
) -> DataFrame:
    """Exact ``percent_rank() OVER (PARTITION BY part_col ORDER BY v)``
    for every ``v`` in value_cols — with NO window partitioned on
    ``part_col`` alone. The skew-proof respelling for low-cardinality,
    heavily skewed partition keys: a real pretraining corpus is
    English-dominated, so a per-LANGUAGE window funnels one language's
    billions of rows through ONE task (the x23/w5b failure class, one
    partition key better). Same machinery as w5b's distributed ntile,
    generalized from rank to percent_rank and to multiple signals in
    one pass.

    Identity used: percent_rank(row) = cnt_lt / (n_part - 1), where
    cnt_lt is the number of rows in the partition with a STRICTLY
    smaller value — ties share the min rank, which is exactly SQL
    percent_rank's tie rule, and the division is the same double
    arithmetic Spark/DuckDB perform, so values hash-match bit-for-bit.

    Pipeline (all shuffles on keys that include the value or chunk —
    never part_col alone):
      1. explode df to (id_cols, part, sig, val) — map-side, 1 row per
         signal;
      2. distinct-value counts groupBy(part, sig, val) — combiner-
         friendly; ties collapse here, so the rank frame is bounded by
         the number of DISTINCT values, not rows;
      3. chunk each sig's value axis by percentile_approx boundaries
         computed FROM the checkpointed distinct-value frame (balance
         is approximate, correctness never depends on it — r20: the
         old approxQuantile over df itself was a full extra corpus
         derivation) and take a chunk-LOCAL exclusive prefix sum over
         windows partitioned by (part, sig, chunk);
      4. per-(part, sig, chunk) totals collect to the driver — bounded
         by |parts| * |sigs| * n_chunks rows (x23 precedent), exclusive
         prefix there, broadcast back as offsets; per-part row count n
         comes from the same totals;
      5. join the rank frame back on (part, sig, val) and pivot to one
         ``pr_<sig>`` column per signal via groupBy(id_cols).

    Value columns must be non-NULL (Spark defaults NULLS FIRST where
    DuckDB defaults NULLS LAST, so NULL ranks would diverge anyway).
    Returns id_cols + part_col + pr_<sig> columns at df's grain
    (id_cols must be unique per row).

    ``keep_vals=True`` additionally returns each ranked value under
    its ORIGINAL column name (as double — the rank key's cast): the
    machinery already carries the value through its pipeline, so a
    caller that needs (value, rank) pairs saves a per-row join back to
    df (r20 — x43's join back to doc_nll was ~16 exec-s of its stage
    split for a column the rank stream already held).
    """
    spark = df.sparkSession
    if n_chunks < 1:
        # an invalid chunk count must reject, not silently degrade to
        # one chunk (ADVICE r16)
        raise ValueError(f"n_chunks must be >= 1, got {n_chunks}")

    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("sig"), F.col(c).cast("double").alias("val")
            )
            for c in value_cols
        ]
    )
    long = df.select(*id_cols, part_col, F.explode(pairs).alias("sv")).select(
        *id_cols, part_col, "sv.sig", "sv.val"
    )

    # localCheckpoint, not .cache() (ADVICE r11): the distinct-value
    # frame (bounded by #distinct values, not rows) feeds the chunk-
    # boundary job, the totals collect AND the lt_loc/join pipeline —
    # uncheckpointed, the corpus explode + groupBy would run three
    # times; CACHED, the entry would pin executor memory for the rest
    # of the 296-query driver session (CacheManager never auto-drops).
    # Checkpoint blocks are GC-cleaned with the RDD reference, and the
    # chunk-partitioned windows ABOVE the checkpoint stay visible to
    # the plan guards.
    vc0 = (
        long.groupBy(part_col, "sig", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )

    # chunk boundaries from the CHECKPOINTED distinct-value frame, not
    # a separate approxQuantile pass over df (r20, VERDICT r19 #6: the
    # old df.stat.approxQuantile was a full extra derivation of the
    # caller's corpus-shaped input — the single most expensive driver
    # action of the machinery).  Boundaries only steer chunk BALANCE,
    # never correctness (chunk id stays a monotone pure function of
    # (sig, val), so tied values share a chunk and the prefix property
    # holds); quantiles of the distinct-value distribution are a fine
    # balance proxy for quantiles of the row distribution.
    if n_chunks == 1:
        # degenerate single-chunk config: no boundaries — every value
        # lands in chunk 0 (the guard quantile_chunk_expr carries —
        # review-pass r16, reproduced)
        bounds: dict[str, list[float]] = {c: [] for c in value_cols}
    else:
        probs = F.array(
            *[F.lit(i / n_chunks) for i in range(1, n_chunks)]
        )
        brows = (
            vc0.groupBy("sig")
            .agg(F.percentile_approx("val", probs, F.lit(10000)).alias("bs"))
            .collect()
        )
        bounds = {r["sig"]: [float(b) for b in (r["bs"] or [])] for r in brows}

    chunk_expr = F.lit(0)
    for c in value_cols:
        bs = bounds.get(c) or []
        if not bs:  # single-chunk (or empty input): everything chunk 0
            continue
        barr = F.array(*[F.lit(float(b)) for b in sorted(set(bs))])
        e = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc + F.when(F.col("val") >= b, 1).otherwise(0),
        )
        chunk_expr = F.when(F.col("sig") == c, e).otherwise(chunk_expr)

    vc = vc0.withColumn("chunk", chunk_expr)
    w_loc = (
        Window.partitionBy(part_col, "sig", "chunk")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = vc.withColumn(
        "lt_loc", F.coalesce(F.sum("cnt").over(w_loc), F.lit(0))
    )

    totals = (
        vc.groupBy(part_col, "sig", "chunk")
        .agg(F.sum("cnt").alias("t"))
        .collect()
    )  # <= |parts| * |sigs| * n_chunks rows — bounded collect
    acc: dict[tuple, int] = {}
    rows = []
    for r in sorted(totals, key=lambda r: (str(r[0]), r["sig"], r["chunk"])):
        key = (r[0], r["sig"])
        off = acc.get(key, 0)
        rows.append((r[0], r["sig"], int(r["chunk"]), off))
        acc[key] = off + int(r["t"])
    # per-part row count: identical across sigs by construction; read
    # it off the first signal's running total
    n_part_rows = [
        (p, n) for (p, s), n in acc.items() if s == value_cols[0]
    ]

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    part_type = df.schema[part_col].dataType
    offsets = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField(part_col, part_type),
                StructField("sig", StringType()),
                StructField("chunk", IntegerType()),
                StructField("lt_off", LongType()),
            ]
        ),
    )
    nparts = spark.createDataFrame(
        n_part_rows,
        StructType(
            [
                StructField(part_col, part_type),
                StructField("n_part", LongType()),
            ]
        ),
    )
    rank_frame = (
        loc.withColumn("chunk", F.col("chunk").cast("int"))
        .join(F.broadcast(offsets), [part_col, "sig", "chunk"])
        .join(F.broadcast(nparts), part_col)
        .select(
            part_col,
            "sig",
            "val",
            F.when(
                F.col("n_part") > 1,
                (F.col("lt_loc") + F.col("lt_off")).cast("double")
                / (F.col("n_part") - 1).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("pr"),
        )
    )
    joined = long.join(rank_frame, [part_col, "sig", "val"])
    if len(value_cols) == 1:
        # ONE signal (x15/x43's shape): the pivot groupBy below exists
        # only to merge multiple sigs into one row per id — with a
        # single sig the join already has df's grain (rank_frame is
        # unique per (part, sig, val) and id_cols are unique per row),
        # so the corpus-scale pivot exchange is pure waste (r20, guide
        # §2.4: remove shuffles outright).  Same columns, same order,
        # same values as the generic path.
        c = value_cols[0]
        return joined.select(
            *id_cols,
            part_col,
            F.col("pr").alias(out_prefix + c),
            *([F.col("val").alias(c)] if keep_vals else []),
        )
    return joined.groupBy(*id_cols, part_col).agg(
        *[
            F.max(F.when(F.col("sig") == c, F.col("pr"))).alias(
                out_prefix + c
            )
            for c in value_cols
        ],
        *(
            [
                F.max(F.when(F.col("sig") == c, F.col("val"))).alias(c)
                for c in value_cols
            ]
            if keep_vals
            else []
        ),
    )
