#!/usr/bin/env python
"""spark-submit entry point for the near-duplicate detection pipeline.

Cluster usage (north rule)::

    spark-submit --py-files fuzzy_matching_spark.zip jobs/dedup_job.py \
        --input  my_catalog.corpus.files        --input-format table \
        --output /warehouse/dedup_out           --checkpoint-dir /warehouse/dedup_ckpt \
        --detectors minhash,simhash             --shingle-size 5 --num-perm 128 \
        --bands 32 --rows-per-band 4 --verify-threshold 0.7

Local smoke::

    python jobs/dedup_job.py --input /tmp/corpus.parquet --output /tmp/out

The job is resumable: stage outputs land in ``--checkpoint-dir`` keyed by a
hash of the full configuration, so a rerun after failure skips completed
stages.  Outputs: ``clusters/`` (doc_id, component), ``edges/`` (detector
pair evidence), ``metrics/`` (per-stage lineage + skew accounting).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from fuzzy_matching_spark.config import DedupConfig
from fuzzy_matching_spark.io.readers import load_corpus
from fuzzy_matching_spark.pipeline.dedup_job import DedupPipeline


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--input-format", default="parquet", choices=["parquet", "table"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--detectors", default="minhash")
    ap.add_argument("--shingle-size", type=int, default=5)
    ap.add_argument("--num-perm", type=int, default=128)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--rows-per-band", type=int, default=4)
    ap.add_argument("--tokenize", default="char", choices=["char", "word"])
    ap.add_argument("--verify-threshold", type=float, default=0.7)
    ap.add_argument("--verify-mode", default="auto", choices=["auto", "always"])
    ap.add_argument("--minhash-mode", default="oph", choices=["oph", "classic"])
    ap.add_argument("--anchor-hash", default="rolling", choices=["rolling", "md5"])
    ap.add_argument("--max-bucket-size", type=int, default=200)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    # On a cluster spark-submit supplies master/deploy config; we only add
    # the engine's execution settings.
    spark = (
        SparkSession.builder.appName("fms-dedup")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    config = DedupConfig(
        shingle_size=args.shingle_size,
        num_perm=args.num_perm,
        bands=args.bands,
        rows_per_band=args.rows_per_band,
        tokenize=args.tokenize,
        verify_threshold=args.verify_threshold,
        verify_mode=args.verify_mode,
        minhash_mode=args.minhash_mode,
        anchor_hash=args.anchor_hash,
        max_bucket_size=args.max_bucket_size,
        seed=args.seed,
    )
    corpus = load_corpus(spark, args.input, fmt=args.input_format)
    pipeline = DedupPipeline(
        spark,
        config,
        detectors=tuple(d for d in args.detectors.split(",") if d),
        checkpoint_dir=args.checkpoint_dir,
    )
    result = pipeline.run(corpus)

    result.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    result.edges.write.mode("overwrite").parquet(f"{args.output}/edges")
    result.metrics.coalesce(1).write.mode("overwrite").parquet(f"{args.output}/metrics")

    for row in result.metrics.collect():
        print(f"[metric] {row['stage']}.{row['metric']} = {row['value']}")


if __name__ == "__main__":
    main()
