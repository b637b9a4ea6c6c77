"""Structured Streaming surfaces: incremental ingest for the dedup engine."""

from fuzzy_matching_spark.streaming.dedup import (
    read_document_stream,
    stream_exact_dedup,
    stream_hash_counts,
    stream_lsh_candidates,
)

__all__ = [
    "read_document_stream",
    "stream_exact_dedup",
    "stream_hash_counts",
    "stream_lsh_candidates",
]
