"""Connected components over candidate-pair edges — the cluster
resolution step of the dedup pipeline (pairs from MinHash-LSH /
SimHash / embedding near-dup are EDGES; dedup keeps one document per
connected component).

The reference has no equivalent (its dedup is per-key first-wins,
``src/storage.py:108-117``); this is north-star surface: at 100 TB a
near-dup pass emits millions of pairs whose transitive closure defines
the duplicate clusters.

Algorithm: iterative min-label propagation (the Pregel formulation of
connected components, as in GraphX/GraphFrames): every node starts
labeled with itself; each round every node takes the min label in its
closed neighborhood; converged when no label changes.  Rounds needed =
graph diameter (near-dup clusters are shallow — a handful of rounds);
each round is one shuffle on the edge key.  The driver-side loop reads
ONE aggregate count per round (a convergence flag, not data — the same
control shape as any iterative algorithm on Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checkpoint(df: DataFrame, reliable: bool) -> DataFrame:
    """Lineage-truncating materialization for the iteration loop.

    ``reliable=False`` → ``localCheckpoint``: blocks live NON-replicated
    on executors, so on a real cluster losing one executor (or a
    dynamic-allocation decommission) mid-iteration makes the truncated
    RDD unrecoverable and fails the job. Fine on local[*] and on static
    clusters where a rare retry-from-scratch is acceptable.

    ``reliable=True`` → ``checkpoint``: writes to the configured
    checkpoint dir (caller must have called
    ``spark.sparkContext.setCheckpointDir(...)`` on e.g. HDFS/S3),
    surviving executor loss — the right mode for long 100 TB runs with
    dynamic allocation, at the cost of a distributed-FS write per
    round.

    Retention: reliable checkpoint files are NOT auto-deleted by
    default — ~3 per round accumulate for the application's lifetime
    unless ``spark.cleaner.referenceTracking.cleanCheckpoints=true``
    is set, which lets the ContextCleaner delete a round's files once
    its frame is garbage-collected. Cluster deployments using
    ``reliable_checkpoint=True`` must set that conf (or point
    setCheckpointDir at a TTL'd/scratch path); localCheckpoint blocks
    (the default mode) are always reclaimed automatically."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 25,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Resolve undirected ``edges`` into components.

    Returns (node, cluster_id) for every node appearing in any edge,
    where cluster_id is the component's minimum node id — the
    deterministic "keeper" of a dedup cluster.

    ``reliable_checkpoint=True`` switches per-round materialization
    from executor-local blocks to the session's reliable checkpoint
    dir — opt in for cluster runs with executor churn (see
    ``_checkpoint`` for the trade-off).

    Raises RuntimeError if not converged within ``max_iter`` rounds
    (diameter > max_iter means the input is not near-dup-shaped;
    raise the cap explicitly rather than silently truncating)."""
    # the symmetrization union consumes `edges` twice and Spark does not
    # share subtrees across union branches — persist so an expensive
    # upstream (e.g. the whole LSH candidate pipeline) runs once
    edges = edges.persist()
    # localCheckpoint (NOT persist) for everything the loop re-reads:
    # a checkpoint truncates lineage, so round N's plan never contains
    # rounds 0..N-1.  With plain persist() the per-round unpersist of
    # the PREVIOUS round's frame invalidates the dependent cache entry
    # (Spark re-caches dependents by plan), silently recomputing the
    # ENTIRE history — including the upstream LSH pipeline — every
    # round: O(rounds^2) total work, measured as 2.1s round 0 vs 7.2s
    # round 1 on the sf0.1 dedup graph.  Checkpointed rounds stay
    # incremental; LOCAL checkpoint blocks are reclaimed by the
    # ContextCleaner when the frames are dropped (reliable-mode file
    # retention: see _checkpoint's docstring).
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    sym = _checkpoint(sym, reliable_checkpoint)
    labels = sym.groupBy("a").agg(F.min("b").alias("nbr_min")).select(
        F.col("a").alias("node"),
        F.least(F.col("a"), F.col("nbr_min")).alias("lbl"),
    )
    labels = _checkpoint(labels, reliable_checkpoint)
    # convergence tracking: labels only ever DECREASE under min
    # propagation, so the label sum strictly decreases iff any label
    # changed — one cheap aggregate per round on the already-cached
    # frame replaces a join-and-diff
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]

    for _ in range(max_iter):
        # each node pulls the labels of its neighbors, takes the min of
        # (own label, neighbor labels)
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # checkpoint: stepped is consumed twice below (directly and via
        # the jump self-join) — materializing it once both avoids the
        # double execution AND keeps the round's lineage flat (see the
        # persist-invalidation note above)
        stepped = labels.join(nbr, labels["node"] == nbr["a"], "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias(
                "lbl"
            ),
        )
        stepped = _checkpoint(stepped, reliable_checkpoint)
        # pointer jumping (path compression): additionally adopt the
        # label OF my label — halves the remaining path every round, so
        # convergence needs O(log diameter) rounds instead of O(diameter)
        # (each driver-visible round is a fixed scheduling cost, so round
        # count is what dominates both locally and on a busy cluster).
        # Every label is itself a node id, so the lookup always resolves.
        jump = stepped.select(
            F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        new_labels = (
            stepped.join(jump, on="lbl", how="left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("lbl2"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
        new_labels = _checkpoint(new_labels, reliable_checkpoint)
        new_sum = new_labels.agg(F.sum("lbl")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            # already lineage-truncated (the round checkpoint): the
            # rename is a projection over the checkpointed RDD; no
            # cache entries leak (round-3 advice). Dropped rounds'
            # LOCAL checkpoint blocks are reclaimed by the
            # ContextCleaner; reliable-mode files need the
            # cleanCheckpoints conf (see _checkpoint's docstring).
            edges.unpersist()
            return labels.select(F.col("node"), F.col("lbl").alias("cluster_id"))
        prev_sum = new_sum
    edges.unpersist()
    raise RuntimeError(f"connected_components: not converged in {max_iter} rounds")


def dedup_clusters(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", *, max_iter: int = 25
) -> DataFrame:
    """Components annotated for dedup: (node, cluster_id, cluster_size,
    is_keeper) — keep ``is_keeper`` (the min id of each cluster), drop
    the rest."""
    cc = connected_components(edges, src, dst, max_iter=max_iter)
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id")
    return cc.withColumn("cluster_size", F.count("*").over(w)).withColumn(
        "is_keeper", F.col("node") == F.col("cluster_id")
    )
