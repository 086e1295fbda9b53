"""Distributed connected components — duplicate-cluster resolution
(north-star LLM-pipeline mandate; the step AFTER near-dedup pair
generation).

MinHash-LSH / SimHash emit duplicate PAIRS (text_dedup.py). A training
pipeline needs duplicate CLUSTERS: the transitive closure of the pair
graph, one representative kept per cluster. At 100 TB the pair graph
has billions of edges, so closure must be a bounded number of
shuffle-stage iterations over (node, label) tuples — never a
driver-side union-find and never a frontier-per-hop BFS (diameter can
be large).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — PAPERS.md
adjacency), the standard label-propagation scheme that converges in
O(log n) rounds on real graphs. Each round is exactly one groupBy per
star step:

  large-star: for each node u, every strictly-larger neighbor re-links
              to u's current minimum (keeps the graph connected while
              shrinking big nodes' degree);
  small-star: every neighbor ≤ u links to the minimum (flattens each
              tree toward its root).

Convergence when the edge multiset stops changing; the result maps
every node to the minimum node id of its component — matching the
"min doc_id is the representative" convention used across the dedup
operators.

Scale notes: labels are (long, long) pairs — the per-round shuffle
moves O(E) narrow rows, partitioned by node id (uniform for content
ids). Per-round checkpointing truncates the growing lineage (an
iterative-plan necessity, not an optimization): reliable
`df.checkpoint()` when a checkpoint dir is configured (survives
executor loss on a cluster — localCheckpoint blocks live on
executors and die with them, killing the job mid-iteration), with
`localCheckpoint()` as the local-mode fallback. AQE re-sizes the
per-round shuffles as components collapse and E shrinks.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (large=True) or small-star round. `edges` has
    columns (u, v); returns the rewritten edge set, deduplicated,
    self-loops dropped.

    List-free formulation: a node's neighborhood minimum is a window
    `min().over(partitionBy(node))` riding the SAME exchange that
    groups the oriented rows — one shuffle per star step, where the
    earlier groupBy-min + equi-join spent two on identical rows
    (measured 2.13 s → the fused form at sf0.1 bench). No per-node
    neighbor list is ever materialized: a viral node (unbounded degree
    on an arbitrary pair graph — exactly the skew large-star exists to
    fix) streams through the window's spillable row buffer, not one
    aggregation buffer, so the 100k-degree-hub pytest stays green.
    """
    # Orient each undirected edge both ways, keeping (node, neighbor)
    # so every node sees its full neighborhood. `edges` is canonical
    # (u < v, distinct), so the oriented rows are distinct too.
    nbrs = edges.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionAll(edges.select(F.col("v").alias("node"), F.col("u").alias("nbr")))

    win = Window.partitionBy("node")
    withm = nbrs.withColumn("m", F.min(F.least("nbr", "node")).over(win))
    if large:
        # link every strictly-larger neighbor to m
        out = withm.filter(F.col("nbr") > F.col("node")).select(
            "m", F.col("nbr").alias("other")
        )
    else:
        # link node + every neighbor <= node to m; the (m, node)
        # self-links are emitted once per neighbor and collapse in the
        # final distinct's map-side partial aggregate
        out = withm.filter(F.col("nbr") <= F.col("node")).select(
            "m", F.col("nbr").alias("other")
        ).unionAll(withm.select("m", F.col("node").alias("other")))
    return (
        out.filter(F.col("m") != F.col("other"))
        .select(
            F.least("m", "other").alias("u"), F.greatest("m", "other").alias("v")
        )
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    max_rounds: int = 12,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Map every node in the undirected edge list (u, v) to the minimum
    node id of its connected component. Returns (node, component).

    Runs alternating star rounds until the edge set is a fixed point
    (all stars: every edge already (min, other)) — O(log n) expected;
    the default `max_rounds` of 12 covers graphs far beyond any test
    SF. `max_rounds` bounds the number of CHANGING rounds — the
    comparison round that confirms the fixed point is free, so a graph
    converging exactly on round `max_rounds` still returns (and an
    already-converged input returns even with max_rounds=0). If a
    round beyond the budget still changes the edge set, raises
    RuntimeError rather than returning partial (non-minimal) labels,
    which would silently break every downstream min-id contract;
    `dedup_clusters` plumbs `max_rounds` through for callers that
    legitimately need deeper closure.
    Isolated nodes never appear in `edges` and so are their own
    implicit components (callers union them back if needed).

    Executor-loss story: with `checkpoint_dir` set (or a checkpoint dir
    already configured on the SparkContext), each round materializes
    through a RELIABLE `df.checkpoint()` to that fault-tolerant
    storage — losing an executor mid-iteration only recomputes from
    the last round, as on any cluster job. Without one, the loop falls
    back to `localCheckpoint()`: correct and cheaper in local mode,
    but its blocks live in executor storage, so on a real cluster an
    executor loss after lineage truncation is unrecoverable — pass a
    shared-filesystem `checkpoint_dir` in any multi-executor
    deployment.

    Side-effect hygiene: `setCheckpointDir` mutates session-global
    SparkContext state and has no public unset, so when this function
    sets it, a finally block restores the PRIOR value (including the
    unset state, via the Scala-side Option setter) before returning —
    callers on a shared session never inherit this operator's
    checkpoint configuration. Because the per-round checkpoints are
    eager and the returned plan reads only the final checkpointed
    edge set, restoring the config does not disturb the result.
    """
    spark = edges.sparkSession
    sc = spark.sparkContext
    prior_dir = sc.getCheckpointDir()
    if checkpoint_dir is not None:
        sc.setCheckpointDir(checkpoint_dir)
    reliable = sc.getCheckpointDir() is not None

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(
            eager=True
        )

    def _sketch(df: DataFrame) -> tuple[int, int]:
        """(edge count, order-free checksum) in ONE job: XOR of per-edge
        xxhash64 over a distinct edge set is a commutative set
        fingerprint (XOR cancellation needs a repeated edge, impossible
        in a distinct set; no overflow under ANSI mode, unlike sum).
        Replaces the count()-then-exceptAll() fixpoint test (up to two
        extra jobs per round over the full edge set); a false
        "converged" needs equal counts AND a 64-bit checksum collision
        between differing sets — negligible next to the max_rounds
        safety bound."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        return row["n"], row["h"]

    try:
        cur = _ckpt(
            edges.filter(F.col("u") != F.col("v"))
            .select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .distinct()
        )
        prev = _sketch(cur)
        changing_rounds = 0
        while True:
            nxt = _star_round(cur, large=True)
            cur = _ckpt(_star_round(nxt, large=False))
            sk = _sketch(cur)
            # Fixed point: same edge set (both sides are distinct sets).
            if sk == prev:
                break
            prev = sk
            changing_rounds += 1
            if changing_rounds > max_rounds:
                # A partial result here is silently WRONG labels (some
                # members non-minimal), which downstream contracts —
                # dedup representatives, the leakage-safe split — must
                # never receive. Fail loudly instead of returning it.
                # This branch only fires when THIS round genuinely
                # changed the edge set, so the message is always true;
                # a graph that converges exactly on round max_rounds
                # spends one extra confirming round and returns fine.
                raise RuntimeError(
                    "connected_components exceeded "
                    f"max_rounds={max_rounds} alternating-star rounds "
                    "with the edge set still changing; raise "
                    "max_rounds (dedup_clusters plumbs it through)"
                )
    finally:
        if checkpoint_dir is not None and prior_dir != sc.getCheckpointDir():
            # Restore through the Scala-side Option setter in BOTH
            # cases: there is no public unset for None, and for a
            # previously-set dir re-calling setCheckpointDir would
            # nest a fresh UUID subdir under the already-resolved
            # path instead of restoring it verbatim.
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                sc._jvm.scala.Option.apply(prior_dir)
            )
    # After convergence every edge is (component_min, member).
    members = cur.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = cur.select(F.col("u").alias("node"), F.col("u").alias("component"))
    return members.unionAll(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    checkpoint_dir: Optional[str] = None,
    max_rounds: int = 12,
) -> DataFrame:
    """Resolve near-duplicate pairs into clusters: (doc_id, cluster_id,
    is_representative). `cluster_id` is the minimum doc_id of the
    cluster; docs not in any pair are singleton clusters of themselves.
    `checkpoint_dir` enables reliable per-round checkpointing (see
    connected_components — required for executor-loss tolerance on a
    real cluster); `max_rounds` is the closure's changing-round budget
    (connected_components raises past it rather than returning partial
    labels — this is the knob its error message points at).
    """
    comps = connected_components(
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")),
        max_rounds=max_rounds,
        checkpoint_dir=checkpoint_dir,
    )
    ids = all_ids.select(F.col(id_col).alias("node")).distinct()
    labeled = ids.join(comps, "node", "left").select(
        F.col("node").alias(id_col),
        F.coalesce("component", "node").alias("cluster_id"),
    )
    return labeled.withColumn(
        "is_representative", (F.col(id_col) == F.col("cluster_id"))
    )
