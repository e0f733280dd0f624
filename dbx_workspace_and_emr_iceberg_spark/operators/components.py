"""Connected components over a distributed edge list.

The clustering step of transitive fuzzy dedup: pair detectors
(MinHash-LSH ``operators/dedup.py:minhash_lsh_pairs``, SimHash, exact
Jaccard) emit *pairs*; a training-data pipeline needs *clusters* — "these
17 documents are all the same article" — and then one canonical doc per
cluster. Pairs alone under-delete: A~B and B~C must collapse A,B,C even
when A~C was never scored. (Reference parity: the reference stack -
Spark 3.5 + Iceberg, /root/reference/main.tf:792-806 - ships no dedup
operators at all; this is part of the EXT LLM-pipeline surface
SURVEY.md §2.12 adds on top.)

Algorithm: min-label propagation with pointer jumping.

* State is one row per node ``(n, lbl)``; ``lbl`` is the smallest node
  id known reachable from ``n``. Invariants: ``lbl[n] <= n`` and
  ``lbl[n]`` is always reachable from ``n``, so at the fixpoint
  ``lbl[n] == min(component(n))`` exactly.
* Each round does (1) a neighbour-min step — every node takes the min
  label over itself and its neighbours (join edges->labels + groupBy:
  2 shuffles over |E| rows) — and (2) a pointer jump
  ``lbl <- lbl[lbl]`` (one self-join on |V| rows), which doubles the
  distance a small label has travelled. Rounds needed:
  O(log(diameter)), not O(diameter) — a 1e6-node chain converges in
  ~20 rounds, not 1e6.
* Per-round ``localCheckpoint`` truncates the lineage (iterative plans
  otherwise grow until the optimizer chokes). Convergence is detected
  by carrying each node's pre-round label through the round and
  checking for any difference (labels only decrease, so one changed
  row means work happened) — type-generic over numeric or string ids,
  and the only driver-side value ever materialized is that per-round
  0/1 count, never the components.

Scale: everything shuffles by node id; no step is quadratic in
component size and no component is ever collected. This is the standard
MapReduce CC formulation (hash-to-min family; cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
literature, PAPERS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_rounds: int = 20,
) -> DataFrame:
    """Return ``(node, component)`` where ``component`` is the smallest
    node id in the node's connected component.

    ``edges`` is an undirected edge list (each pair in either or both
    directions; self-loops and duplicates are fine). ``nodes``
    optionally supplies the full node universe so isolated nodes (no
    edges) still appear — each as its own singleton component.
    The loop exits as soon as a round changes nothing — pointer jumping
    makes that O(log diameter) rounds — and raises RuntimeError if
    ``max_rounds`` elapse without convergence (never returns
    possibly-wrong clusters). Convergence is only observable via a
    final do-nothing round, so budget ``max_rounds`` as expected
    rounds + 1.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .filter(F.col("s") != F.col("d"))
        .distinct()
        # materialize ONCE: the edge list is joined every round, and its
        # upstream (e.g. a pair-scoring pipeline) may be expensive
        .localCheckpoint()
    )

    # Universe from the RAW edge list (not sym — a node appearing only
    # in self-loops must still come out as its own singleton component).
    universe = e.select(F.col("s").alias("n")).union(
        e.select(F.col("d").alias("n"))
    )
    if nodes is not None:
        col = node_col or nodes.columns[0]
        universe = universe.union(nodes.select(F.col(col).alias("n")))
    # NULL ids would otherwise VANISH silently: the pointer-jump inner
    # join on lbl never matches a NULL label, so the row just drops from
    # the output (review-pass r16, reproduced) — contradicting this
    # module's fail-loudly stance. raise_error rides the existing first
    # action; no extra scan.
    universe = universe.select(
        F.when(F.col("n").isNotNull(), F.col("n"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "connected_components: NULL node id in edges/nodes — "
                    "filter NULL endpoints upstream"
                )
            )
        )
        .alias("n")
    )
    labels = universe.distinct().select("n", F.col("n").alias("lbl"))
    labels = labels.localCheckpoint()

    converged = False
    for _ in range(max_rounds):
        # (1) neighbour-min: lbl <- min(lbl, min over neighbours' lbl);
        # the pre-round label rides along as __old for change detection
        nbr = (
            sym.join(labels.withColumnRenamed("n", "d"), "d")
            .groupBy("s")
            .agg(F.min("lbl").alias("nlbl"))
            .withColumnRenamed("s", "n")
        )
        stepped = labels.join(nbr, "n", "left").select(
            "n",
            F.col("lbl").alias("__old"),
            F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"),
        )
        # (2) pointer jump: lbl <- lbl[lbl]. Every label value is itself
        # a node id present in `stepped` (labels start as node ids and
        # every update copies another node's label), so the inner join
        # is total.
        parent = stepped.select(
            F.col("n").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        jumped = stepped.join(parent, "lbl").select(
            "n", "__old", F.col("lbl2").alias("lbl")
        )
        checkpointed = jumped.localCheckpoint()
        # Labels only decrease, so any difference from __old means the
        # round did work. Works for ANY orderable id type (numeric,
        # string hash keys, ...) — no numeric-cast tricks.
        changed = (
            checkpointed.filter(F.col("lbl") != F.col("__old")).limit(1).count()
        )
        labels = checkpointed.select("n", "lbl")
        if changed == 0:
            converged = True
            break
    if not converged:
        # Wrong clusters silently corrupt every downstream dedup
        # decision — fail loudly instead. Pointer jumping needs
        # ~log2(diameter) rounds, so hitting this means max_rounds was
        # set far too low for the graph, not a near-miss.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "raise max_rounds (budget ~ log2(graph diameter) + 1 — the "
            "final round must pass with no label changes)"
        )

    return labels.select(F.col("n").alias("node"), F.col("lbl").alias("component"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    *,
    damping: float = 0.85,
    iters: int = 8,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank by fixed power iteration — Pregel-on-DataFrames
    (one join + one groupBy shuffle per iteration), used by
    ``x35_host_pagerank`` as the link-centrality quality prior.

    ``nodes`` (one column, node ids) pins the vertex set; defaults to
    ids appearing in ``edges``. Dangling-mass convention: dropped —
    contributions flow only along edges, so ranks sum to <= 1 when
    sinks exist; a node whose out-edge weights are all <= 0 is treated
    as dangling, never as a NaN source. Weights are assumed
    non-negative (PageRank is undefined otherwise).

    Lifecycle: the transition and node frames are .cache()'d and stay
    live after return so the caller's action reuses them across all
    ``iters`` self-joins — x2's caller-owned-cache convention; call
    ``spark.catalog.clearCache()`` (bench.py and driver_sim do) or unpersist when
    the returned frame is consumed. Scale: persist ``edges`` before
    calling; for deep iteration counts localCheckpoint the rank frame
    every few rounds to truncate lineage (iters is fixed and small
    here — power iteration converges geometrically at damping < 1)."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"), w.alias("__w")
    )
    if nodes is None:
        nodes = e.select(F.col("__s").alias("node")).union(
            e.select(F.col("__d").alias("node"))
        ).distinct()
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    # zero-weight edges carry no mass; dropping them here (a) keeps
    # __w/__out well-defined — a src whose weights all sum to 0 would
    # otherwise yield 0.0/0.0 = NaN transition probabilities that
    # poison every downstream rank over the iterations — and (b) makes
    # such a node a proper dangling sink (mass dropped), matching the
    # documented convention.
    agg = (
        e.groupBy("__s", "__d")
        .agg(F.sum("__w").alias("__w"))
        .filter(F.col("__w") > 0)
    )
    outdeg = agg.groupBy("__s").agg(F.sum("__w").alias("__out"))
    trans = (
        agg.join(outdeg, "__s")
        .select("__s", "__d", (F.col("__w") / F.col("__out")).alias("__p"))
        .cache()
    )
    nodes = nodes.cache()
    # driver scalar bounded by the vertex-set cardinality — the same
    # bounded-action class as the k-means stats collects
    n = nodes.count()
    if n == 0:
        # 1.0/n would surface a bare ZeroDivisionError from deep inside
        # the operator (review-pass r16, reproduced)
        raise ValueError(
            "pagerank: empty vertex set (no edges and no nodes frame)"
        )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iters):
        contrib = (
            trans.join(ranks, trans["__s"] == ranks["node"])
            .groupBy("__d")
            .agg(F.sum(F.col("rank") * F.col("__p")).alias("__c"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["__d"], "left"
        ).select(
            "node",
            (
                F.lit((1 - damping) / n)
                + damping * F.coalesce("__c", F.lit(0.0))
            ).alias("rank"),
        )
        # truncate lineage mid-run (r19, the docstring's own scale note
        # made executable): without it the final action re-plans an
        # iters-deep nested AQE tree — at 8 unrolled iterations the
        # driver re-optimizes every earlier stage inside every later
        # one.  The checkpointed frame is |nodes| rows of (id, double);
        # values are materialized as-is, so the iteration arithmetic
        # (and both x35/x37 oracles' replay of it) is untouched.
        if (i + 1) % 4 == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint()
    return ranks
