"""Training-data text-analysis operators over a documents table.

All JVM-side column pipelines (language ID, quality scoring, token counting,
token-set Jaccard dedup) except document fingerprinting, which reuses the
vectorized rolling-hash kernel from :mod:`operators.fingerprint`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fuzzy_matching_spark.functions.text import (
    detect_language_col,
    quality_score_col,
    token_count_col,
)

__all__ = [
    "language_profile",
    "quality_scores",
    "token_stats",
    "token_jaccard_pairs",
    "exact_dedup_stats",
]


def language_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Detected-language histogram: (detected_lang, n_docs)."""
    return (
        docs.select(detect_language_col(text_col).alias("detected_lang"))
        .groupBy("detected_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, quality) heuristic in [0,1], rounded for stable comparison."""
    return docs.select(
        F.col(id_col), F.round(quality_score_col(text_col), 6).alias("quality")
    )


def token_stats(docs: DataFrame, text_col: str = "text", group_col: str = "source") -> DataFrame:
    """Per-group token totals: (group, n_docs, total_tokens, avg_tokens)."""
    with_counts = docs.withColumn("_toks", token_count_col(text_col))
    return with_counts.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("_toks").alias("total_tokens"),
        F.round(F.avg("_toks"), 6).alias("avg_tokens"),
    )


def exact_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-hash dedup summary: (total_docs, distinct_docs, dup_docs)."""
    hashed = docs.select(F.sha2(F.col(text_col), 256).alias("h"))
    return hashed.agg(
        F.count("*").alias("total_docs"),
        F.countDistinct("h").alias("distinct_docs"),
        (F.count("*") - F.countDistinct("h")).alias("dup_docs"),
    )


def token_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-set Jaccard near-dup pairs >= threshold (n-gram Jaccard, n=1).

    Classic explode/aggregate formulation — expressible in ANSI SQL, used as
    the SQL-checkable member of the dedup family:

    * per doc: distinct token set + its size,
    * inverted index join on token -> per-pair intersection size,
    * jaccard = inter / (|a| + |b| - inter).

    Scale design (lossless PPJoin-style pruning; the naive inverted-index
    join is quadratic on hot tokens):

    * **prefix filter** — tokens ordered by ascending global frequency; two
      sets with Jaccard >= t must share a token within each other's first
      ``|d| - ceil(t*|d|) + 1`` tokens, so only prefix tokens are indexed;
    * **size-ratio filter** — |a|/|b| must lie in [t, 1/t]; applied inside
      the candidate join before any aggregation;
    * exact intersection via ``array_intersect`` on the (deduped, compact)
      token arrays — one row per candidate pair instead of one per shared
      token occurrence.

    Both filters only *remove* pairs that provably cannot reach the
    threshold, so the result set is identical to the naive formulation
    (the DuckDB oracle runs the naive SQL).
    """
    tok_arrays = docs.select(
        F.col(id_col),
        F.array_distinct(F.split(F.trim(text_col), r"\s+")).alias("toks"),
    ).withColumn("sz", F.size("toks"))

    # global token frequencies -> rare-first ordering makes prefixes selective
    freq = (
        tok_arrays.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    exploded = tok_arrays.select(id_col, "sz", F.explode("toks").alias("tok"))
    ranked = exploded.join(F.broadcast(freq), "tok").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("tok"))
        ),
    )
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(id_col, "sz", "tok")

    a = prefix.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "tok")
    b = prefix.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "tok")
    cands = (
        a.join(b, "tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_a") >= threshold * F.col("sz_b"))
            & (F.col("sz_b") >= threshold * F.col("sz_a"))
        )
        .select("id_a", "id_b")
        .distinct()
    )

    ta = tok_arrays.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"))
    tb = tok_arrays.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"))
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("toks_a", "toks_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("toks_a") + F.size("toks_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
