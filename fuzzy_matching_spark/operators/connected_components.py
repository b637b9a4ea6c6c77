"""Iterative hash-min connected components over a pair-edge DataFrame.

Label propagation ("hash-min") with pointer jumping: every vertex starts
labeled with its own id; each superstep every vertex takes the min label
among itself and its neighbors, then labels are *path-compressed* one hop
(``component <- label[component]``), so propagation distance doubles per
round and convergence is O(log diameter) instead of O(diameter) — the
round count, not per-round cost, is what hurts at scale because every
round is a full shuffle barrier.

Scale mechanics (SURVEY.md §4.2):

* ``localCheckpoint`` each superstep truncates lineage (otherwise the plan
  doubles every round and the driver chokes planning it),
* messages are ``groupBy(id).min(label)`` — map-side partial aggregation
  keeps shuffle volume at O(E) per round,
* convergence check is a single aggregate on the new labels: hash-min only
  ever lowers labels, so the label sum strictly decreases until fixpoint —
  no join-and-diff job (that join was as expensive as a superstep),
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
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """-> (id long, component long): component = min vertex id in the cluster.

    ``edges`` must contain two long id columns; isolated vertices (not in
    any edge) are absent from the output — union them in with
    ``component = id`` at the call site if needed.

    Size-adaptive strategy (same shape as Spark's broadcast-join threshold):
    an edge set below ``driver_threshold`` rows (2M edges = 32 MB of ids) is
    collected and solved with a vectorized numpy hash-min in one job — the distributed loop
    pays ~5 shuffle-barrier jobs per superstep, which on a small graph is
    pure serial overhead that an extra 4x of executors cannot shrink (it
    dominated the measured scaling efficiency).  Above the threshold the
    checkpointed hash-min loop runs; both paths label every vertex with the
    component's minimum id, so the choice is invisible to callers.

    Duplicate edges are tolerated — the scatter-min ignores them and the
    distributed path dedups inside ``sym`` — so callers need not pay a
    ``distinct`` shuffle first.  (The size probe is a plain ``count``, not
    ``limit().collect()``: CollectLimit executes partitions incrementally
    across several sequential jobs when the limit exceeds the row count,
    which serializes the whole edge computation.)
    """
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        # Arrow batch transfer, not row collect: collect() deserializes
        # per-row Row objects (~10x the wall of toPandas at 2M rows) and
        # this transfer is serial driver time — it costs the same at every
        # cluster size, so it lands directly on the scaling efficiency.
        pdf = edges.select(id_a, id_b).toPandas()
        return _driver_numpy_cc(
            pdf[id_a].to_numpy(), pdf[id_b].to_numpy(), edges.sparkSession
        )

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

    # label sum decreases strictly while anything changes (min-propagation
    # is monotone); decimal(38) so 64-bit ids can't overflow the sum
    def _label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)

    for _ in range(max_iterations):
        msgs = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping: component <- label[component]; one extra join per
        # round turns O(diameter) rounds into O(log diameter)
        lookup = new_labels.select(
            F.col("id").alias("_c"), F.col("component").alias("_cc")
        )
        new_labels = (
            new_labels.join(lookup, new_labels.component == lookup._c, "left")
            .select("id", F.coalesce("_cc", "component").alias("component"))
            .localCheckpoint()
        )
        labels = new_labels
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    sym.unpersist()
    return labels


def _driver_numpy_cc(a, b, spark) -> DataFrame:
    """Small-graph path: vectorized hash-min + pointer jumping over two
    int64 edge-endpoint arrays, min-id relabel.  One createDataFrame; no
    iterative jobs.

    This is the driver's only SERIAL section in the dedup pipeline, so its
    constant matters for the N -> 4N scaling efficiency: a dict-based
    union-find walked every edge in interpreted Python (~0.8 s at 300k
    edges); this formulation runs O(E) numpy kernels per round and
    converges in O(log diameter) rounds (dup clusters are near-stars, so
    2-3 rounds in practice) — measured 23x faster on a bench-shaped graph,
    identical labels.  Dense indices come from ``np.unique`` (sorted), so
    the min dense index IS the min vertex id and no relabel pass is needed.
    """
    import numpy as np
    import pandas as pd

    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    verts, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: a.size], inv[a.size :]
    lab = np.arange(verts.size, dtype=np.int64)
    while True:
        before = lab.copy()
        m = np.minimum(lab[ea], lab[eb])
        # unbuffered scatter-min: both endpoints take the edge minimum
        np.minimum.at(lab, ea, m)
        np.minimum.at(lab, eb, m)
        while True:  # pointer jumping: label <- label[label] to fixpoint
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(before, lab):
            break

    out = pd.DataFrame({"id": verts, "component": verts[lab]})
    # pandas input goes driver->JVM as Arrow batches; a list of tuples
    # would be pickled row-by-row
    return spark.createDataFrame(out, schema="id long, component long")
