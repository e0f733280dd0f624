"""Similarity search over embedding columns (SURVEY.md §2.12 X3).

Two paths:
  * exact top-k cosine — brute force with the query set broadcast; the
    corpus is scanned once, dot products run JVM-side via zip_with/
    aggregate lambda expressions (no Python), and per-query top-k is a
    rank-filter window. At 100 TB corpus × small query batch this is
    the right baseline: one scan, no shuffle of the corpus (only the
    k·|queries| survivors cross the wire).
  * LSH-bucketed ANN — deterministic random-hyperplane signatures
    (planes derived from a hash, not an RNG, so plans are reproducible
    and need no fitted model object). Probing only same-bucket
    candidates turns the all-pairs O(N·Q) into O(Σ bucket×queries-in-
    bucket); multiple tables trade recall for cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def _cosine(qv, cv, q_nrm, c_nrm) -> F.Column:
    """Cosine with zero-norm pairs scored NULL: cosine is undefined for
    a zero vector, NULL sorts LAST under desc (so a degenerate row can
    never outrank a real match), and ANSI mode no longer raises
    DIVIDE_BY_ZERO mid-job (review-pass r16, reproduced)."""
    return _dot(qv, cv) / F.nullif(q_nrm * c_nrm, F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (excluding
    self-matches by id). Output: (query_id, neighbor_id, cosine, rank)."""
    # Norms are per-row, not per-pair: computing them below the join cuts
    # the interpreted-HOF work from 3 dot products per (query, corpus)
    # pair to 1 per pair + 1 per row, with bit-identical doubles (the
    # same dot feeds the same sqrt either way).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("c_nrm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("qv"), F.col("cv"), F.col("q_nrm"), F.col("c_nrm")).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_component(table: int, plane: int, d: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1), derived
    from md5(table:plane:dim) — reproducible across runs and machines
    with no fitted state and no RNG object."""
    import hashlib

    h = int.from_bytes(
        hashlib.md5(f"{table}:{plane}:{d}".encode()).digest()[:8], "big"
    )
    return (h % 2000) / 1000.0 - 1.0


def _planes_lit_2d(table: int, n_planes: int, dim: int) -> F.Column:
    """All of one table's planes as a single 2-D array literal, built
    from ONE SQL string: per-element F.lit()/F.array() construction
    costs a py4j round-trip each (n_planes × dim ≈ thousands of calls,
    multiple seconds of driver time); the parsed expression is one
    call and identical in the plan."""
    rows = ",".join(
        "array("
        + ",".join(
            f"{_plane_component(table, i, d)!r}D" for d in range(dim)
        )
        + ")"
        for i in range(n_planes)
    )
    return F.expr(f"array({rows})")


def hyperplane_signature(
    vec_col: str, n_planes: int, table: int, dim: int = 64
) -> F.Column:
    """Deterministic random-hyperplane LSH signature (bit i = sign of
    dot(v, plane_i)). Plane components are precomputed Python-side and
    embedded as LITERAL arrays: the projection is then one zip_with +
    aggregate per plane over a constant array — a far smaller expression
    tree (and analysis cost) than deriving components inside the plan,
    with identical distributed execution."""
    planes2d = _planes_lit_2d(table, n_planes, dim)
    powers = F.expr(
        "array(" + ",".join(str(1 << i) for i in range(n_planes)) + ")"
    )
    projs = F.transform(
        planes2d,
        lambda p: F.aggregate(
            F.zip_with(F.col(vec_col), p, lambda x, q: x.cast("double") * q),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    # one small expression tree (transform over a 2-D literal) instead
    # of n_planes separate aggregate expressions: same distributed work,
    # far cheaper analysis + codegen per query.
    return F.aggregate(
        F.zip_with(
            projs, powers, lambda pr, pw: F.when(pr >= 0, pw).otherwise(F.lit(0))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def _with_lsh_buckets(
    df: DataFrame,
    id_alias: str,
    vec_alias: str,
    nrm_alias: str,
    id_col: str,
    vec_col: str,
    n_planes: int,
    n_tables: int,
) -> DataFrame:
    """ONE scan → (id, vec, norm, tbl, bucket) with one row per table,
    via an array-of-structs explode. The alternative — one select per
    table unioned together — re-scans the input n_tables times; at
    100 TB that's n_tables full corpus scans instead of one."""
    sig_entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                hyperplane_signature(vec_col, n_planes, t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return (
        df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            _norm(F.col(vec_col)).alias(nrm_alias),
            F.explode(sig_entries).alias("__s"),
        )
        .withColumn("tbl", F.col("__s.tbl"))
        .withColumn("bucket", F.col("__s.bucket"))
        .drop("__s")
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing an LSH bucket with
    the query (in any of n_tables signature tables) are scored."""
    # Norms ride along with the signatures (computed once per row) so
    # candidate scoring needs a single dot per pair.
    c_sig = _with_lsh_buckets(
        corpus, "neighbor_id", "cv", "c_nrm", id_col, vec_col, n_planes, n_tables
    )
    q_sig = _with_lsh_buckets(
        queries, "query_id", "qv", "q_nrm", id_col, vec_col, n_planes, n_tables
    )

    cand = (
        c_sig.join(F.broadcast(q_sig), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "q_nrm", "neighbor_id", "cv", "c_nrm")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        _cosine(F.col("qv"), F.col("cv"), F.col("q_nrm"), F.col("c_nrm")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """The 100 TB scale path for exact top-k: numpy matmul per Arrow
    batch via mapInPandas, partial top-k per partition, then a global
    rank-filter over the tiny survivor set (≤ k·|queries| rows per
    partition cross the wire).

    ~10-50x faster than the interpreted zip_with/aggregate formulation
    on wide batches; float64 matmul sum order may differ from the
    sequential JVM sum in the last ulp, so the correctness twin
    (cosine_topk) remains the oracle-checked variant and this one
    self-verifies neighbor-set recall against it.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    spark = corpus.sparkSession
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()  # bounded: the query batch is small by contract
    q_ids = np.array([r.query_id for r in qrows])
    q_mat = np.array([r.qv for r in qrows], dtype=np.float64)
    # zero-norm guard (review-pass r16): a bare /= norm yields NaN rows
    # and Spark sorts NaN ABOVE every double in desc — a degenerate
    # vector would win top-1 for every query. Masked divide + -inf sims
    # rank zero-norm pairs LAST, matching the JVM path's NULL cosine
    # (NULL also sorts last under desc).
    q_nrm = np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_mat = np.divide(
        q_mat, q_nrm, out=np.zeros_like(q_mat), where=q_nrm != 0
    )
    bq_ids = spark.sparkContext.broadcast(q_ids)
    bq_mat = spark.sparkContext.broadcast(q_mat)
    bq_zero = spark.sparkContext.broadcast((q_nrm == 0).ravel())

    def score(batches):
        ids = bq_ids.value
        qm = bq_mat.value
        qz = bq_zero.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c_nrm = np.linalg.norm(cm, axis=1, keepdims=True)
            cm = np.divide(
                cm, c_nrm, out=np.zeros_like(cm), where=c_nrm != 0
            )
            sims = cm @ qm.T  # (batch, queries)
            sims[(c_nrm == 0).ravel(), :] = -np.inf
            sims[:, qz] = -np.inf
            nid = pdf[id_col].to_numpy()
            take = min(k + 1, len(nid))
            top = np.argpartition(-sims, take - 1, axis=0)[:take]
            out = {
                "query_id": np.repeat(ids, take),
                "neighbor_id": nid[top].T.ravel(),
                "cosine": np.take_along_axis(sims, top, axis=0).T.ravel(),
            }
            yield pd.DataFrame(out)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id bigint, neighbor_id bigint, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        partial.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        # the -inf zero-norm sentinel ranks last like the JVM path's
        # NULL, but if a degenerate pair still lands in the top-k
        # (fewer than k real candidates) the EMITTED value must match
        # the documented-equivalent JVM path: NULL, not -inf (ADVICE
        # r16). Applied after the rank so ordering is unchanged.
        .withColumn(
            "cosine",
            F.when(
                F.col("cosine") == F.lit(float("-inf")), F.lit(None)
            ).otherwise(F.col("cosine")),
        )
    )


def cosine_topk_int_vectorized(
    quant: DataFrame,
    queries_quant: DataFrame,
    k: int = 5,
    scale: int = 1_000,
) -> DataFrame:
    """Integer-exact numpy-matmul top-k — the vectorized twin of the
    x3h ranking, value-replayable by any engine.

    Inputs are QUANTIZED frames from ``quantized_unit_vectors``
    (``vec_id, vq array<long>, n2 long``) — quantization happens
    JVM-side where the norm fold order is pinned, so this operator
    never touches floats whose summation order matters. Per Arrow
    batch the corpus block matmuls against the broadcast query matrix
    in float64: every partial product is an integer ≤ scale² and every
    partial sum ≤ n2 ≈ scale² « 2⁵³, so the float64 result is EXACT
    regardless of numpy's summation order; it converts back to int64
    losslessly. The ranking key is x3h's sign(dd)·((dd²·scale) div n2)
    in pure int64 (dd ≤ ~1.1·scale² ⇒ dd²·scale ≤ ~1.2e15 at the
    default scale), identical to DuckDB's BIGINT replay.

    Scale shape matches cosine_topk_vectorized: broadcast query matrix,
    one corpus scan, per-batch partial top-(k+1) per query (global
    top-k ⊆ union of per-batch top-(k+1) under the same total order),
    then a global rank window over the ≤ (k+1)·|queries| survivors per
    partition.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    spark = quant.sparkSession
    # bounded by the broadcast-query-batch contract (ivf_topk spelling):
    # limit(MAX+1) bounds the check and the transfer in one job
    MAX_QUERY_BATCH = 100_000
    qrows = queries_quant.select("vec_id", "vq").limit(
        MAX_QUERY_BATCH + 1
    ).collect()
    if len(qrows) > MAX_QUERY_BATCH:
        raise ValueError(
            f"cosine_topk_int_vectorized query batch exceeds "
            f"{MAX_QUERY_BATCH} rows; the broadcast query-batch design "
            "caps there. Split the batch or use the bucketed LSH path."
        )
    if not qrows:
        # np.array([]) would be shape (0,) — cm @ qm.T then raises a
        # dimension mismatch inside the executor instead of returning
        # the empty result (ADVICE r17). Zero queries => zero rows.
        return spark.createDataFrame(
            [], "q_id bigint, n_id bigint, sim_key bigint, rank int"
        )
    q_ids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    q_mat = np.array([r.vq for r in qrows], dtype=np.float64)  # exact ints
    bq_ids = spark.sparkContext.broadcast(q_ids)
    bq_mat = spark.sparkContext.broadcast(q_mat)

    def score(batches):
        ids = bq_ids.value
        qm = bq_mat.value
        take_base = k + 1  # survives the self-row removal downstream
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack(pdf["vq"].to_numpy()).astype(np.float64)
            dd = (cm @ qm.T).astype(np.int64)  # exact (see docstring)
            n2 = pdf["n2"].to_numpy(dtype=np.int64)[:, None]
            mag = (dd * dd * scale) // n2
            key = np.where(dd >= 0, mag, -mag)  # (batch, queries)
            nid = pdf["vec_id"].to_numpy(dtype=np.int64)
            take = min(take_base, len(nid))
            cols = []
            for j in range(len(ids)):
                # full (key desc, nid asc) order per query — a bare
                # argpartition on key could drop the nid-tiebreak
                # winner at the cut boundary
                order = np.lexsort((nid, -key[:, j]))[:take]
                cols.append(
                    pd.DataFrame(
                        {
                            "q_id": ids[j],
                            "n_id": nid[order],
                            "sim_key": key[order, j],
                        }
                    )
                )
            yield pd.concat(cols, ignore_index=True)

    partial = quant.select("vec_id", "vq", "n2").mapInPandas(
        score, "q_id bigint, n_id bigint, sim_key bigint"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim_key").desc(), "n_id")
    return (
        partial.filter(F.col("n_id") != F.col("q_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means-partition the corpus, then score
    each query only against the n_probe nearest cells.

    Deterministic throughout: centroids initialize from the n_centroids
    lowest-id vectors and refine with `iters` Lloyd passes. Assignment
    runs as numpy over Arrow batches (mapInPandas); centroid updates
    shuffle (cell, dim) partial sums — centroids are tiny and may sit on
    the driver, the corpus never does. At 100 TB the cell assignment is
    a linear scan and each query reads ~n_probe/n_centroids of the data.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    spark = corpus.sparkSession
    dim = len(corpus.select(vec_col).first()[0])

    cents = np.array(
        [
            r[0]
            for r in corpus.orderBy(id_col).select(vec_col).limit(n_centroids).collect()
        ],
        dtype=np.float64,
    )
    if len(cents) == 0:
        raise ValueError("ivf_topk: empty corpus")
    # a corpus smaller than n_centroids seeds fewer cells than asked —
    # clamp so the (n_centroids, dim)-shaped update buffers match the
    # actual centroid matrix (review-pass r16, reproduced: IndexError
    # 'boolean dimension is 16' on a 3-row corpus)
    n_centroids = len(cents)

    def assigner(cmat):
        bc = spark.sparkContext.broadcast(cmat)

        def assign(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                d = ((x[:, None, :] - bc.value[None, :, :]) ** 2).sum(axis=2)
                cell = d.argmin(axis=1)
                out = pdf[[id_col]].copy()
                out["cell"] = cell.astype("int32")
                yield out

        return assign

    for _ in range(iters):
        assigned = corpus.select(id_col, vec_col).mapInPandas(
            assigner(cents), f"{id_col} bigint, cell int"
        )
        # (cell, dim) partial sums — long-form so the shuffle is tiny.
        # Components are quantized to 1e-6 LONGS before the sum: a
        # distributed double sum's value depends on shuffle merge
        # order (ulp-level), which could flip a near-equidistant
        # vector's cell between otherwise-identical runs and break the
        # bit-identical reproduction contract x3e pins (review-pass
        # r11); integer addition is associative, so the centroids —
        # and everything downstream — are run-order-invariant. The
        # 1e-6 grid is far below any clustering-relevant distance.
        comp = (
            corpus.join(assigned, id_col)
            .select("cell", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(
                    F.round(F.col("v").cast("double") * 1000000.0).cast(
                        "long"
                    )
                ).alias("s"),
                F.count("*").alias("c"),
            )
            .collect()
        )
        new = cents.copy()
        sums = np.zeros((n_centroids, dim))
        cnts = np.zeros((n_centroids, dim))
        for r in comp:
            # overflow bound (ADVICE r11): components are unit-scale
            # embeddings (|v| <= ~1), so |s| <= c * 1e6 and the long
            # partial sums wrap only past ~9.2e12 members in ONE cell;
            # guard at half that. ANSI mode (the session default)
            # already raises on the actual sum overflow — this keeps
            # the contract explicit rather than config-dependent.
            if r.c >= (1 << 62) // 1_000_000:
                raise ArithmeticError(
                    f"ivf_topk: cell {r.cell} holds {r.c} vectors — the "
                    "quantized long centroid sums wrap past ~9.2e12 "
                    "unit-scale members (guarded at half that); raise "
                    "n_centroids or rescale"
                )
            sums[r.cell, r.pos] = r.s / 1e6
            cnts[r.cell, r.pos] = r.c
        nonzero = cnts > 0
        new[nonzero] = sums[nonzero] / cnts[nonzero]
        cents = new

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assigner(cents), f"{id_col} bigint, cell int"
    )
    cell_corpus = corpus.join(assigned, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("c_nrm"),
        "cell",
    )

    # queries probe their n_probe nearest cells. The query batch is
    # driver-collected and broadcast — enforce the "small by contract"
    # bound explicitly so a misuse (corpus passed as queries) fails
    # loudly instead of OOMing the driver at scale. limit(MAX+1) bounds
    # BOTH the check and the driver transfer in one job — a separate
    # count() would execute the query-side plan twice.
    MAX_QUERY_BATCH = 100_000
    qrows = queries.select(id_col, vec_col).limit(MAX_QUERY_BATCH + 1).collect()
    if len(qrows) > MAX_QUERY_BATCH:
        raise ValueError(
            f"ivf_topk query batch exceeds {MAX_QUERY_BATCH} rows; the "
            "broadcast query-batch design caps there. Split the batch "
            "or use the bucketed LSH path for query-side scale."
        )
    q_probe = []
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        d = ((cents - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:n_probe]:
            q_probe.append((int(r[0]), int(cell), [float(x) for x in qv]))
    q_df = spark.createDataFrame(
        q_probe, f"query_id bigint, cell int, qv array<double>"
    ).withColumn("q_nrm", _norm(F.col("qv")))

    cand = cell_corpus.join(F.broadcast(q_df), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        _cosine(F.col("qv"), F.col("cv"), F.col("q_nrm"), F.col("c_nrm")).alias(
            "cosine"
        ),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
