"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Training-data-pipeline operators over an ``array<float>`` embedding column.

* :func:`cosine_topk` — exact baseline: block-nested-loop via a crossJoin
  restricted to a (small, broadcast) probe set; all arithmetic stays JVM-side
  (``zip_with``/``aggregate``) inside whole-stage codegen — no Python.
  Cost is O(|probes| * N): correct tool when probes are few; the N x N case
  belongs to the LSH variant.
* :func:`random_hyperplane_ann` — scale path: sign-of-projection signatures
  against ``n_planes`` seeded random hyperplanes; candidates collide on a
  signature band, then exact cosine re-ranks.  Same derived-key-equi-join
  geometry as the MinHash LSH (salting/AQE story carries over).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cosine_topk", "ivf_ann", "random_hyperplane_ann"]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each probe among ``vectors``.

    -> (query_id, neighbor_id, cosine) with ``row_number`` rank <= k,
    ties broken by neighbor_id for determinism.
    """
    from pyspark.sql.window import Window

    p = probes.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        F.broadcast(p)
        .crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity_col(F.col("qvec"), F.col("nvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def random_hyperplane_ann(
    vectors: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 10_000,
    return_bucket_metrics: bool = False,
) -> DataFrame:
    """All-pairs approximate top-k: hyperplane-sign LSH buckets + exact rerank.

    The signature computation is expressed as JVM column arithmetic over
    literal hyperplane arrays (dim is small for embeddings) — the plan stays
    inside codegen; no Python workers anywhere.

    Skew/scale design (mirrors ``minhash.candidate_pairs``):

    * buckets larger than ``max_bucket_size`` are excluded from pair
      expansion via a distributed window count — one dense embedding region
      otherwise makes a quadratic bucket;
    * ``return_bucket_metrics=True`` additionally returns a
      ``(band, bkey, size, skipped)`` frame so the recall cost of the cap is
      *accounted*, never silent — same contract as
      ``minhash.candidate_pairs``;
    * the band self-join carries *ids only*; vectors are re-joined once per
      deduplicated (query, neighbor) pair, so full embeddings are never
      shuffled through the candidate dedup.
    """
    from pyspark.sql.window import Window

    dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)

    sig_bits = []
    for p in planes:
        plane_lit = F.array(*[F.lit(float(x)) for x in p])
        sig_bits.append((_dot(F.col(vec_col), plane_lit) > 0).cast("int"))
    width = n_planes // bands
    band_keys = []
    for b in range(bands):
        expr = F.lit(0)
        for j in range(width):
            expr = expr * 2 + sig_bits[b * width + j]
        band_keys.append(expr)

    tagged = vectors.select(
        F.col(id_col), F.col(vec_col), F.array(*band_keys).alias("bandkeys")
    )
    bandtab = tagged.select(id_col, F.posexplode("bandkeys").alias("band", "bkey"))
    cap = max_bucket_size if max_bucket_size is not None else 2**62
    bucket_metrics = (
        bandtab.groupBy("band", "bkey")
        .agg(F.count("*").alias("size"))
        .withColumn("skipped", F.col("size") > cap)
    )
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "bkey")
        bandtab = (
            bandtab.withColumn("_bsz", F.count("*").over(wb))
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    left = bandtab.select("band", "bkey", F.col(id_col).alias("query_id"))
    right = bandtab.select("band", "bkey", F.col(id_col).alias("neighbor_id"))
    cands = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = tagged.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    nv = tagged.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        cands.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity_col(F.col("qvec"), F.col("nvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    result = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
    if return_bucket_metrics:
        return result, bucket_metrics
    return result


def ivf_ann(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: sampled-centroid inverted lists + multi-probe rerank.

    The third leg of the similarity-search family (exact ``cosine_topk``,
    all-pairs ``random_hyperplane_ann``, and this probe-oriented scale
    path).  Classic inverted-file geometry:

    1. **centroids** — the ``n_lists`` lowest-id vectors (deterministic,
       SQL-reproducible sampling; a k-means refinement would slot in here
       without changing any downstream step);
    2. **assignment** — every vector joins its argmax-cosine centroid.
       The centroid table is tiny and broadcast, the argmax is a
       ``max(struct(cos, -centroid))`` aggregate — partial-aggregable
       map-side, ONE shuffle of N small rows, no window over N x n_lists;
    3. **probe** — each query ranks the same centroids and searches its
       top-``n_probe`` inverted lists: candidates shrink from O(N) per
       query to O(N * n_probe / n_lists);
    4. **rerank** — exact cosine over the candidates, top-k per query.

    Output matches the family: (query_id, neighbor_id, cosine round-6,
    rank), ties broken by neighbor_id.  At corpus scale the assignment
    pass is a broadcast nested loop inside codegen (no Python), inverted
    lists are hash-partitioned by ``list_id`` so each probe's search
    touches ``n_probe`` partitions — the partition-pruned shape IVF exists
    for.  Recall is governed by n_probe/n_lists, and the driver oracle
    reproduces the algorithm exactly (not brute force), so correctness
    checks don't depend on recall.
    """
    from pyspark.sql.window import Window

    cent = (
        vectors.orderBy(F.col(id_col).asc())
        .limit(n_lists)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )

    def best_lists(df, out_id, n):
        """Top-n centroids per row by (cosine desc, cid asc)."""
        scored = df.crossJoin(F.broadcast(cent)).select(
            F.col(id_col).alias(out_id),
            "cid",
            cosine_similarity_col(F.col(vec_col), F.col("cvec")).alias("ccos"),
        )
        if n == 1:
            # argmax as an aggregate: max(struct(cos, -cid)) == row_number 1
            # under (cos DESC, cid ASC) — map-side combinable, windowless
            return scored.groupBy(out_id).agg(
                (-F.max(F.struct(F.col("ccos"), (-F.col("cid")).alias("ncid")))
                 .getField("ncid")).alias("cid")
            )
        w = Window.partitionBy(out_id).orderBy(F.desc("ccos"), F.asc("cid"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .select(out_id, "cid")
        )

    lists = best_lists(vectors, "neighbor_id", 1)
    plists = best_lists(probes, "query_id", n_probe)

    cands = (
        plists.join(lists, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    qv = probes.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    nv = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity_col(F.col("qvec"), F.col("nvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
