"""Skew handling: hot LSH buckets are capped + accounted, never silently
lost (SURVEY.md §4.2, FIXTURES.md §5), and byte-identical floods are
defused *before* LSH by the representative-per-sha dedup."""

from pyspark.sql import functions as F

from fuzzy_matching_spark.config import DedupConfig
from fuzzy_matching_spark.fixtures.corpus import generate_corpus
from fuzzy_matching_spark.pipeline.dedup_job import DedupPipeline


def make_skewed_rows(n_hot: int = 300, n_base: int = 50, seed: int = 3, identical: bool = False):
    """``identical=False`` appends a unique tail to each hot copy so every
    copy has a distinct sha256 (the copies survive the rep-per-sha dedup and
    genuinely stress the LSH bucket cap); ``identical=True`` reproduces the
    byte-identical flood that rep-dedup collapses."""
    fx = generate_corpus(n_base=n_base, seed=seed)
    hot_content = fx.rows[0]["content"]
    rows = list(fx.rows)
    for i in range(n_hot):
        content = hot_content if identical else hot_content + f"\n# tail {i}\n"
        rows.append(
            {
                "repo": f"hot/repo{i}",
                "path": f"copy/{i}.py",
                "commit": f"{i:040x}",
                "lang": "python",
                "content": content,
            }
        )
    return rows


def test_hot_bucket_capped_and_accounted(spark):
    """Near-identical (distinct-sha) hot docs flood LSH buckets; buckets over
    the cap must be excluded from pair expansion and surfaced in metrics."""
    config = DedupConfig(max_bucket_size=100)
    rows = make_skewed_rows(identical=False)
    df = spark.createDataFrame(rows)
    pipeline = DedupPipeline(spark, config, detectors=("minhash",))
    result = pipeline.run(df)

    m = {(r["stage"], r["metric"]): r["value"] for r in result.metrics.collect()}
    # a short unique tail changes only a few of the 125 OPH positions, so
    # most of the 25 bands still hash all 300 copies into one hot bucket
    assert m[("minhash", "buckets_dropped")] >= 10
    assert m[("minhash", "rows_in_dropped_buckets")] >= 300 * 10

    # candidate volume stayed bounded: without the cap the hot bucket alone
    # would contribute C(300,2) ~ 45k pairs per band
    assert m[("minhash", "candidate_pairs")] < 200_000


def test_identical_hot_docs_collapse_via_rep_dedup(spark):
    """Byte-identical copies must NOT reach the LSH join at all: the
    rep-per-sha dedup collapses them to one representative, the exact
    detector links them in a star, and no bucket exceeds the cap."""
    config = DedupConfig(max_bucket_size=100)
    rows = make_skewed_rows(identical=True)
    df = spark.createDataFrame(rows)
    pipeline = DedupPipeline(spark, config, detectors=("minhash",))
    result = pipeline.run(df)

    m = {(r["stage"], r["metric"]): r["value"] for r in result.metrics.collect()}
    assert m[("minhash", "buckets_dropped")] == 0
    assert m[("minhash", "candidate_pairs")] < 10_000

    # the hot copies still cluster together (exact detector is always on)
    hot = result.corpus.filter(F.col("repo").startswith("hot/")).select("doc_id")
    comps = (
        result.clusters.join(hot, "doc_id").select("component").distinct().count()
    )
    assert comps == 1
