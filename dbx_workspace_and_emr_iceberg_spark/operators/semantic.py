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
    # materialize the norm BEFORE the per-element lambda references it
    # (quantized_unit_vectors idiom, review-pass r16): an expression
    # embedded inside transform() re-evaluates the whole O(d) fold once
    # per element — O(d²) per row on every k-means corpus pass instead
    # of O(d). Zero-norm vectors raise the contract violation loudly
    # instead of feeding NaN unit vectors into the clustering.
    dot = F.aggregate(
        F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    df = df.withColumn("__nrm", F.sqrt(dot)).withColumn(
        "__nrm",
        F.when(F.col("__nrm") > 0, F.col("__nrm")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("semantic: zero-norm embedding at "),
                    F.col(id_col).cast("string"),
                )
            )
        ),
    )
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            vec_col, lambda x: x.cast("double") / F.col("__nrm")
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


# --- integer-exact SemDeDup (the value-oracled spelling) ---------------------
# The float pipeline above is the idiomatic Spark spelling; its
# clustering decisions, however, hinge on float dot products whose
# summation ORDER differs between engines, so no external engine can
# replay it hash-exactly. The functions below quantize unit vectors to
# integers once (a sequence of individually-rounded IEEE ops both
# engines perform bit-identically) and then make EVERY decision —
# centroid assignment, centroid update, duplicate threshold — in exact
# integer arithmetic, so DuckDB replays the whole algorithm value-for-
# value (dedup_queries.x20 builds the unrolled-CTE oracle, the x35
# PageRank precedent).


def quantized_unit_vectors(
    df: DataFrame, id_col: str, vec_col: str, scale: int = 10_000
) -> DataFrame:
    """(vec_id, vq array<long>, n2 long): v/|v| quantized to integers
    via floor(v_hat*scale + 0.5).

    Cross-engine determinism: norm² is a LEFT fold (F.aggregate here,
    list_reduce in DuckDB — both fold sequentially and 0.0+x²==x²), and
    sqrt/divide/multiply/add/floor are single correctly-rounded IEEE
    ops — so the quantized integers are bit-identical in any IEEE-754
    engine. Downstream bounds (dim 64, scale 1e4): |vq|² = n2 ≈ 1e8,
    pairwise dot ≤ 64·1e8 = 6.4e9 — every later product fits
    decimal(38)/int128.
    """
    sq = F.aggregate(
        F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # materialize the norm BEFORE the per-element lambda references it
    # (text_queries idiom): an expression embedded inside transform()
    # re-evaluates the whole O(d) fold once per element — O(d²) per row
    # on the corpus-linear pass instead of O(d)
    df = df.withColumn("__norm", F.sqrt(sq))
    # zero-vector guard: /0 yields NaN/Inf whose ANSI cast-to-long
    # raises deep inside the job — raise the contract violation HERE
    # instead (a unit vector of the zero vector does not exist;
    # callers filter or fix upstream). raise_error is eager per row,
    # so the check costs nothing on valid data.
    df = df.withColumn(
        "__norm",
        F.when(
            F.col("__norm") > 0, F.col("__norm")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("quantized_unit_vectors: zero-norm vector at "),
                    F.col(id_col).cast("string"),
                )
            )
        ),
    )
    vq = F.transform(
        vec_col,
        lambda x: F.floor(
            x.cast("double") / F.col("__norm") * scale + F.lit(0.5)
        ).cast("long"),
    )
    return df.select(
        F.col(id_col).alias("vec_id"), vq.alias("vq")
    ).withColumn(
        "n2",
        F.aggregate(
            F.transform("vq", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def _int_assign(df: DataFrame, cent: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest-centroid assignment with an exact integer comparator.

    Spherical k-means compares cos(v, S_j/|S_j|) across clusters; the
    order statistic is preserved by key_j = sign(dot_j) * (dot_j² *
    10⁶ // |S_j|²) — exact integers, no sqrt, no float — with ties
    broken on the smaller cluster id. numpy int64 matmul computes the
    dots exactly (≤ 64·scale·|S| comps ≪ 2⁶³); the squares need >64
    bits, done vectorized on an object-dtype view (bounded: n·k Python
    ints per batch; a production build would use two-limb int128 or
    Arrow decimal128 — k is small, this is the map-side cheap step).
    Empty clusters DROP OUT (their centroid row simply does not exist
    next round) — mirrored exactly by the SQL oracle.
    """
    # zero-sum centroids (components can cancel in the integer SUM
    # vector) would floor-divide by 0 below; a zero vector carries no
    # direction, so such a cluster drops out like an empty one. A
    # degenerate case — unit-norm member vectors make it vanishingly
    # rare — but a crash inside mapInPandas is the wrong failure mode.
    cent = [(cid, v) for cid, v in cent if any(x != 0 for x in v)]
    if not cent:
        raise ValueError("_int_assign: every centroid is the zero vector")
    cent = sorted(cent)  # ascending cluster id -> argmax picks first max
    cids = np.array([c for c, _ in cent], dtype="int32")
    S = np.array([v for _, v in cent], dtype="int64")  # (k, d)
    n2s = np.array([sum(x * x for x in v) for _, v in cent], dtype=object)
    schema = "vec_id bigint, cluster int, vq array<long>, n2 bigint"

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf["vq"].to_numpy()).astype("int64")
            dots = mat @ S.T  # (n, k) exact
            dobj = dots.astype(object)
            keys = (dobj * dobj * 1_000_000) // n2s
            keys = np.where(dots >= 0, keys, -keys)
            out = pdf[["vec_id", "vq", "n2"]].copy()
            out["cluster"] = cids[np.argmax(keys, axis=1)]
            yield out[["vec_id", "cluster", "vq", "n2"]]

    return df.mapInPandas(run, schema)


def int_kmeans_assign(
    quant: DataFrame, k: int = 8, iters: int = 2
) -> DataFrame:
    """Integer spherical k-means over quantized_unit_vectors output.

    Seeds = the k lowest vec_ids (cluster j = j-th smallest), then
    ``iters`` rounds of (assign, integer centroid-sum update) and one
    final assignment. Centroids are the raw integer SUM vectors (the
    comparator divides by |S_j|², so normalization is implicit and
    exact). Per round only k·dim aggregated longs reach the driver —
    the same bounded action as the float path's update step.
    """
    # cached: quant is consumed once for the seed pick, once per
    # iteration's centroid-sum collect, and once by the final
    # assignment below — uncached, the O(d)-per-row interpreted
    # quantization HOFs re-ran every time (r19, the qd10/x43
    # convention; x20/x51 are the callers).  r20 (VERDICT r19 #3): the
    # pin used to outlive the call — now the FINAL assignment is
    # localCheckpoint-materialized off the cache and the pin released
    # in finally, so two callers in one session no longer stack pinned
    # frames, AND a caller that consumes the assignment more than once
    # (x20's semdedup self-join) no longer re-runs the mapInPandas
    # assignment per consumer.
    quant = quant.cache()
    try:
        seeds = quant.orderBy("vec_id").limit(k).collect()
        cent = [(i, list(r.vq)) for i, r in enumerate(seeds)]
        assigned = _int_assign(quant, cent)
        for _ in range(iters):
            sums = (
                assigned.select("cluster", F.posexplode("vq").alias("d", "x"))
                .groupBy("cluster", "d")
                .agg(F.sum("x").alias("sx"))
                .collect()
            )  # k*dim rows — bounded collect
            by_c: dict[int, dict[int, int]] = {}
            for r in sums:
                by_c.setdefault(int(r.cluster), {})[int(r.d)] = int(r.sx)
            cent = [
                (c, [dims[d] for d in sorted(dims)])
                for c, dims in by_c.items()
            ]
            assigned = _int_assign(quant, cent)
        return assigned.localCheckpoint()
    finally:
        quant.unpersist()


def int_semdedup_keep(
    assigned: DataFrame,
    threshold_num: int = 9801,
    threshold_den: int = 10_000,
    rounds: int = 6,
    max_cluster: int = 100_000,
) -> DataFrame:
    """Within-cluster greedy keep-first prune, integer-exact and
    SQL-replayable: cos(i,j) ≥ θ becomes dot>0 AND dot²·den ≥
    num·n2_i·n2_j (θ² = num/den — exact rational, decimal(38)
    arithmetic JVM-side).

    Greedy keep-first is sequential, so the declarative spelling is a
    FIXPOINT UNROLL (the x35 pattern applied to a recursion instead of
    an iteration): keep_t(i) = no edge to a smaller-id j with
    keep_{t-1}(j), starting all-true. keep_t is exact for every vertex
    whose alternating drop/keep chain is ≤ t deep; ``rounds`` bounds
    the unroll and a greedy applyInPandas replay ASSERTS equality, so
    an under-unrolled chain raises instead of silently diverging (the
    oracle unrolls the same ``rounds``). Output: (vec_id, cluster,
    keep bigint 0/1).
    """
    a = assigned.select("vec_id", "cluster", "vq", "n2")
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    l, r = a.alias("l"), a.alias("r")
    dd = F.aggregate(
        F.zip_with(F.col("l.vq"), F.col("r.vq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = (
        l.join(
            r,
            (F.col("l.cluster") == F.col("r.cluster"))
            & (F.col("r.vec_id") < F.col("l.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("i"),
            F.col("r.vec_id").alias("j"),
            dd.alias("dd"),
            F.col("l.n2").alias("n2i"),
            F.col("r.n2").alias("n2j"),
        )
    )
    edges = pairs.filter(
        (F.col("dd") > 0)
        & (
            dec(F.col("dd")) * dec(F.col("dd")) * F.lit(threshold_den)
            >= F.lit(threshold_num) * dec(F.col("n2i")) * dec(F.col("n2j"))
        )
    ).select("i", "j")
    ids = a.select("vec_id")
    keep = ids.withColumn("keep", F.lit(True))
    for _ in range(rounds):
        blocked = (
            edges.join(
                keep.filter("keep").select(F.col("vec_id").alias("j")), "j"
            )
            .select(F.col("i").alias("vec_id"))
            .distinct()
            .withColumn("hit", F.lit(True))
        )
        keep = ids.join(blocked, "vec_id", "left").select(
            "vec_id", F.col("hit").isNull().alias("keep")
        )
    fix = a.select("vec_id", "cluster").join(keep, "vec_id")

    # greedy ground-truth replay per cluster (integer math, same rule);
    # any divergence from the unrolled fixpoint raises LOUDLY
    schema = "vec_id bigint, keep_greedy boolean"

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cluster:
            raise ValueError(
                f"cluster of {len(pdf)} exceeds max_cluster={max_cluster}; "
                "increase k"
            )
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.vstack(pdf["vq"].to_numpy()).astype("int64")
        n2 = pdf["n2"].tolist()
        kept_idx: list[int] = []
        keep_flags = np.zeros(len(pdf), dtype=bool)
        for i in range(len(pdf)):
            dup = False
            for ki in kept_idx:
                d = int(mat[ki] @ mat[i])
                if d > 0 and d * d * threshold_den >= threshold_num * int(
                    n2[ki]
                ) * int(n2[i]):
                    dup = True
                    break
            if not dup:
                keep_flags[i] = True
                kept_idx.append(i)
        out = pdf[["vec_id"]].copy()
        out["keep_greedy"] = keep_flags
        return out

    greedy = assigned.groupBy("cluster").applyInPandas(
        lambda _k, pdf: prune(pdf), schema
    )
    # cache before the divergence count: the subtree above it (k-means
    # assigns + O(n²/k) edge join + fixpoint rounds + greedy replay) is
    # the whole operator — without this the caller's consumption of the
    # returned frame re-runs it all from scratch (review-pass finding).
    # Callers that persist/checkpoint the result (x20) make this cache
    # short-lived; it is bounded at one row per vector either way (and
    # the harness — bench.py / driver_sim — clearCache()s it regardless).
    checked = fix.join(greedy, "vec_id").cache()
    n_bad = checked.filter(F.col("keep") != F.col("keep_greedy")).count()
    if n_bad:
        raise AssertionError(
            f"fixpoint unroll ({rounds} rounds) diverges from greedy on "
            f"{n_bad} vertices — raise `rounds`"
        )
    return checked.select(
        "vec_id", "cluster", F.col("keep").cast("long").alias("keep")
    )
