"""Skew handling: hot LSH buckets are capped + accounted, never silently
lost, and recall survives via the always-on exact detector (SURVEY.md §4.2,
FIXTURES.md §5)."""

from pyspark.sql import functions as F

from fuzzy_matching_spark.config import DedupConfig
from fuzzy_matching_spark.fixtures.corpus import generate_corpus
from fuzzy_matching_spark.pipeline.dedup_job import DedupPipeline


def make_skewed_rows(n_hot: int = 300, n_base: int = 50, seed: int = 3):
    fx = generate_corpus(n_base=n_base, seed=seed)
    hot_content = fx.rows[0]["content"]
    rows = list(fx.rows)
    for i in range(n_hot):
        rows.append(
            {
                "repo": f"hot/repo{i}",
                "path": f"copy/{i}.py",
                "commit": f"{i:040x}",
                "lang": "python",
                "content": hot_content,
            }
        )
    return rows


def test_hot_bucket_capped_and_accounted(spark):
    config = DedupConfig(max_bucket_size=100)
    rows = make_skewed_rows()
    df = spark.createDataFrame(rows)
    pipeline = DedupPipeline(spark, config, detectors=("minhash",))
    result = pipeline.run(df)

    m = {(r["stage"], r["metric"]): r["value"] for r in result.metrics.collect()}
    # every band of the 300-copy file exceeds the cap
    assert m[("minhash", "buckets_dropped")] >= config.bands
    assert m[("minhash", "rows_in_dropped_buckets")] >= 300 * config.bands

    # the hot copies still cluster together (exact detector is always on)
    hot = result.corpus.filter(F.col("repo").startswith("hot/")).select("doc_id")
    comps = (
        result.clusters.join(hot, "doc_id").select("component").distinct().count()
    )
    assert comps == 1

    # candidate volume stayed bounded: without the cap the hot bucket alone
    # would contribute C(300,2) ~ 45k pairs per band
    assert m[("minhash", "candidate_pairs")] < 200_000
