"""Distributed graph operators over pair/edge frames.

The reference runs Tarjan SCC and DAG depth stats driver-side over its
import graph (SURVEY §2.7 scoped those out as driver-only).  What DOES
belong in the distributed engine is the graph step the reference's clone
GROUPING performs (``findings/clones/grouping.py``: pairwise matches fold
into groups): near-dup verification emits PAIRS, and a training-data
dedup pipeline needs transitive CLUSTERS of them — "keep one doc per
connected component".

:func:`connected_components` is the Spark-first form: iterative min-label
propagation — per round, every node takes the minimum label among itself
and its neighbors; a fixpoint labels each component by its minimum node
id.  Rounds are bounded by the component diameter, and near-dup clusters
are dense (LSH candidates form near-cliques), so convergence is 2-3
rounds in practice; each round is one join + one groupBy (label frame is
(node, label) — edges never rewritten).  The per-round persist keeps the
iterative plan's lineage bounded without checkpointing; every persisted
round is unpersisted as soon as its successor materializes.

Exactly expressible in SQL as a recursive closure (DuckDB
``WITH RECURSIVE`` min-reachable-label), so the registry query is fully
oracle-checked — iterative-on-Spark vs recursive-CTE-on-DuckDB must
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster_id) for every node of the undirected *edges* graph;
    ``cluster_id`` = minimum node id in the component (deterministic
    canonical representative, the reference's sorted-group-id convention,
    ``clone_baseline.py:511-527``).

    Raises RuntimeError if *max_iter* rounds do not reach the fixpoint —
    a correctness guard (an unconverged labeling is NOT components), hit
    only by a path graph longer than max_iter, not by dedup clusters.
    """
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("t")))
        .distinct()
    )
    # Self-loops make one propagation round = "min over self + neighbors"
    # with a SINGLE reference to the label frame per round.  That single
    # reference is what keeps the iterative logical plan LINEAR in the
    # round count — a two-reference formulation (join + least-fallback)
    # doubles the plan tree every round and OOMs the driver stringifying
    # it long before the data is large.
    nodes = und.select(F.col("s").alias("id")).distinct()
    e2 = (
        und.unionByName(
            nodes.select(F.col("id").alias("s"), F.col("id").alias("t"))
        )
    ).persist()
    labels = nodes.withColumn("lbl", F.col("id")).persist()

    # Convergence probe: labels only ever DECREASE under min-propagation,
    # so the label sum is strictly monotone until the fixpoint — equal
    # sums between rounds ⟺ no label changed.  One aggregate per round on
    # the cached frame; decimal(38,0) so arbitrary 64-bit ids cannot
    # overflow the sum.
    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    cur = _label_sum(labels)
    try:
        for _ in range(max_iter):
            new_labels = (
                e2.join(labels.select(F.col("id").alias("s"), "lbl"), "s")
                .groupBy("t")
                .agg(F.min("lbl").alias("lbl"))
                .select(F.col("t").alias("id"), "lbl")
                .persist()
            )
            new = _label_sum(new_labels)
            labels.unpersist()
            labels = new_labels
            if new == cur:
                return labels.select("id", F.col("lbl").alias("cluster_id"))
            cur = new
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter)"
        )
    finally:
        e2.unpersist()


def cluster_sizes(components: DataFrame) -> DataFrame:
    """(cluster_id, n) summary of a components frame — the group-level
    view (reference group size stats)."""
    return components.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n"))
