"""Iterative hash-min connected components over a pair-edge DataFrame.

Label propagation ("hash-min"): every vertex starts labeled with its own id;
each superstep every vertex takes the min label among itself and its
neighbors; convergence when no label changes.  Iterations are O(component
diameter) — near-dup clusters are dense and shallow, so this converges in a
handful of rounds in practice; ``max_iterations`` bounds pathological chains.

Scale mechanics (SURVEY.md §4.2):

* ``localCheckpoint`` each superstep truncates lineage (otherwise the plan
  doubles every round and the driver OOMs planning it),
* messages are ``groupBy(id).min(label)`` — map-side partial aggregation
  keeps shuffle volume at O(E) per round,
* no GraphFrames dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """-> (id long, component long): component = min vertex id in the cluster.

    ``edges`` must contain two long id columns; isolated vertices (not in
    any edge) are absent from the output — union them in with
    ``component = id`` at the call site if needed.
    """
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        msgs = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
    return labels
