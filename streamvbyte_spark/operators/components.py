"""Near-duplicate CLUSTERING: connected components over candidate pairs.

A dedup pipeline doesn't stop at candidate pairs — transitive matches must
collapse into one group (a~b, b~c => {a,b,c}) so exactly one representative
per group survives.  This is min-label propagation over the undirected pair
graph, the standard Spark shape for small-diameter graphs (near-dup clusters
are almost-cliques, so convergence takes O(cluster diameter) ~ 2-4 rounds):

    label(d) <- min(label(d), min over neighbors label(n))   until fixpoint

Each round is one equi-join + one min-aggregation — both shuffle on doc_id,
and AQE reuses the same hash partitioning across rounds.  Lineage is
truncated per round via operators.staging.materialize: localCheckpoint by
default, or a durable checkpoint() against ``spark.svb.stageCheckpointDir``
when that conf is set (on a production cluster point it at durable storage
so a lost executor replays from the checkpoint instead of failing the job).

The driver-gate oracle computes the same components exactly with a DuckDB
recursive CTE (queries.py: dedup_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .staging import materialize


def connected_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """(doc_a, doc_b) candidate pairs -> (doc_id, component_id) where
    component_id = lexicographic min doc_id of the component."""
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    edges = materialize(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"),
                            F.col("doc_a").alias("b"))))
    labels = (edges.select(F.col("a").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id")))
    for _ in range(max_iters):
        nbr = (edges.join(labels, edges["b"] == labels["doc_id"])
               .select(F.col("a").alias("doc_id"), "label"))
        new = materialize(
            labels.unionByName(nbr)
            .groupBy("doc_id").agg(F.min("label").alias("label")))
        changed = (new.withColumnRenamed("label", "new_label")
                   .join(labels, "doc_id")
                   .where(F.col("new_label") != F.col("label")).count())
        labels = new
        if changed == 0:
            break
    else:
        # loop exhausted without a fixpoint: returning intermediate labels
        # would silently split a real component into several — fail loudly
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing); raise max_iters (component "
            "diameter exceeds the round budget)")
    return labels.select("doc_id", F.col("label").alias("component_id"))
