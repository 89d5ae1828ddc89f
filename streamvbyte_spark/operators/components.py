"""Near-duplicate CLUSTERING: connected components over candidate pairs.

A dedup pipeline doesn't stop at candidate pairs — transitive matches must
collapse into one group (a~b, b~c => {a,b,c}) so exactly one representative
per group survives.  This is min-label propagation over the undirected pair
graph, the standard Spark shape for small-diameter graphs (near-dup clusters
are almost-cliques, so convergence takes O(cluster diameter) ~ 2-4 rounds):

    label(d) <- min(label(d), min over neighbors label(n))   until fixpoint

Each round is one equi-join + one min-aggregation — both shuffle on doc_id,
and AQE reuses the same hash partitioning across rounds.  Lineage is
truncated per round with localCheckpoint so the plan stays O(1) deep (on a
production cluster point spark.sparkContext.setCheckpointDir at durable
storage and use checkpoint() for fault tolerance across round failures).

The driver-gate oracle computes the same components exactly with a DuckDB
recursive CTE (queries.py: dedup_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """(doc_a, doc_b) candidate pairs -> (doc_id, component_id) where
    component_id = lexicographic min doc_id of the component."""
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    edges = (pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
             .union(pairs.select(F.col("doc_b").alias("a"),
                                 F.col("doc_a").alias("b")))
             .localCheckpoint())
    labels = (edges.select(F.col("a").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id")))
    for _ in range(max_iters):
        nbr = (edges.join(labels, edges["b"] == labels["doc_id"])
               .select(F.col("a").alias("doc_id"), "label"))
        new = (labels.unionByName(nbr)
               .groupBy("doc_id").agg(F.min("label").alias("label"))
               .localCheckpoint())
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
