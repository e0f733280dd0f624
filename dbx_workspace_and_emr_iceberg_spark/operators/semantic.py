"""Semantic (embedding-space) dedup: spherical k-means + SemDeDup.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) removes *semantic*
duplicates — documents whose embeddings nearly coincide even when their
text differs — by clustering the corpus and pruning near-identical
pairs WITHIN each cluster only. That two-level structure is what makes
it tractable at 100 TB: the O(n²) cosine comparison is confined to one
cluster at a time (clusters are bounded), and the clustering itself is
linear scans.

Spark-first layout:
  * assignment step — centroids broadcast as a plain numpy array inside
    a ``mapInPandas`` closure; one matmul per Arrow batch assigns every
    row (vectors and centroids L2-normalized, so cosine == dot).
  * update step — ``posexplode`` of the vector then a (cluster, dim)
    hash aggregate; only k·dim aggregated floats ever reach the driver,
    never rows.
  * prune step — ``applyInPandas`` per cluster: greedy keep-first scan
    in vec_id order, dropping members with cosine ≥ threshold to an
    already-kept member. Deterministic (no RNG anywhere: seeds are
    hash-picked, iteration order is sorted).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    dot = F.aggregate(
        F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            vec_col, lambda x: x.cast("double") / F.sqrt(dot)
        ).alias("v"),
    )


def _assign(df: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Nearest-centroid assignment, one numpy matmul per Arrow batch."""
    cent = centroids  # captured in the closure, shipped once per task
    schema = "vec_id bigint, v array<double>, cluster int, cos double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf["v"].to_numpy())  # (n, d), already unit
            sims = mat @ cent.T  # (n, k)
            pdf = pdf.copy()
            pdf["cluster"] = sims.argmax(axis=1).astype("int32")
            pdf["cos"] = sims.max(axis=1)
            yield pdf

    return df.mapInPandas(run, schema)


def kmeans_fit_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
):
    """Spherical k-means. Returns (assigned_df, objective_per_iter).

    Seeds are the k rows with the smallest xxhash64(id) — deterministic
    and uniformly spread over the corpus without an RNG. The objective
    (mean cosine to the assigned centroid) must be non-decreasing;
    callers may assert on the returned trace.
    """
    base = _normalized(df, id_col, vec_col)
    # Re-derived (cheaply, k rows) rather than cached: base is scanned
    # once per iteration anyway and the seed pick is a top-k.
    seed_rows = (
        base.orderBy(F.xxhash64(F.col("vec_id").cast("string")))
        .limit(k)
        .collect()
    )
    cent = np.vstack([np.array(r.v) for r in seed_rows])  # (k, d) unit
    objective: list[float] = []
    for _ in range(iters):
        assigned = _assign(base, cent)
        # one shuffle of (cluster, dim, partial sums) — k*d groups
        stats = (
            assigned.select(
                "cluster", "cos", F.posexplode("v").alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum("val").alias("s"),
                F.sum("cos").alias("cs"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        # ROW-weighted mean cosine — sum over rows of cos(row, centroid)
        # divided by total rows. This is the quantity spherical k-means
        # monotonically improves; an unweighted mean of per-cluster
        # means is NOT monotone (a row correctly reassigning between
        # clusters of different sizes can lower it).
        dim0 = [r for r in stats if r.dim == 0]
        total_n = sum(r.n for r in dim0)
        obj_num = sum(r.cs for r in dim0) / max(total_n, 1)
        objective.append(float(obj_num))
        new = cent.copy()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cluster.setdefault(r.cluster, {})[r.dim] = r.s
        for ci, dims in by_cluster.items():
            vec = np.array([dims[d] for d in sorted(dims)])
            n = np.linalg.norm(vec)
            if n > 0:
                new[ci] = vec / n
        cent = new
    return _assign(base, cent), objective


def semdedup(
    assigned: DataFrame, threshold: float = 0.99, max_cluster: int = 100_000
) -> DataFrame:
    """Within-cluster greedy pruning: scan members in vec_id order,
    drop any whose cosine to an already-kept member ≥ threshold.
    Output: (vec_id, cluster, keep, max_cos_kept).

    max_cluster is a loud guard, not a silent cap: a cluster larger
    than the bound raises rather than quietly doing O(n²) work — at
    scale the fix is a larger k, not a bigger bound.
    """
    schema = "vec_id bigint, cluster int, keep boolean, max_cos_kept double"

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cluster:
            raise ValueError(
                f"cluster of {len(pdf)} exceeds max_cluster={max_cluster}; "
                "increase k"
            )
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.vstack(pdf["v"].to_numpy())
        kept_idx: list[int] = []
        keep = np.zeros(len(pdf), dtype=bool)
        max_cos = np.zeros(len(pdf))
        for i in range(len(pdf)):
            if kept_idx:
                sims = mat[kept_idx] @ mat[i]
                mc = float(sims.max())
            else:
                mc = 0.0
            max_cos[i] = mc
            if mc < threshold:
                keep[i] = True
                kept_idx.append(i)
        out = pdf[["vec_id", "cluster"]].copy()
        out["keep"] = keep
        out["max_cos_kept"] = max_cos
        return out

    return assigned.groupBy("cluster").applyInPandas(
        lambda _key, pdf: prune(pdf), schema
    )
