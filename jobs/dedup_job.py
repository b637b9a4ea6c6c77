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

Incremental ingest (Structured Streaming, availableNow semantics: drain
everything new, exit; rerun as new files land — see
``fuzzy_matching_spark.streaming``)::

    spark-submit --py-files fuzzy_matching_spark.zip jobs/dedup_job.py \
        --input /landing/docs --output /warehouse/stream_out \
        --checkpoint-dir /warehouse/stream_ckpt --streaming

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
    ap.add_argument(
        "--streaming",
        action="store_true",
        help="incremental ingest: treat --input as a landing directory and "
        "run the Structured Streaming MinHash/LSH flow (availableNow: "
        "process everything new, then exit; rerun to pick up later "
        "arrivals — state lives in --checkpoint-dir and the band index "
        "under --output)",
    )
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--id-col", default="doc_id")
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
    if args.streaming:
        if args.input_format != "parquet":
            raise SystemExit("--streaming requires --input-format parquet "
                             "(a file-source landing directory)")
        from fuzzy_matching_spark.streaming import (
            read_document_stream,
            stream_lsh_candidates,
        )

        ckpt = args.checkpoint_dir or f"{args.output}/_stream_checkpoint"
        q = stream_lsh_candidates(
            read_document_stream(spark, args.input),
            index_dir=f"{args.output}/band_index",
            pairs_dir=f"{args.output}/pairs_stream",
            checkpoint_dir=ckpt,
            config=config,
            content_col=args.content_col,
            id_col=args.id_col,
        )
        q.awaitTermination()
        print(f"[metric] stream.batches_processed = {q.lastProgress['batchId'] + 1}"
              if q.lastProgress else "[metric] stream.batches_processed = 0")
        return

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
