"""SimHash near-duplicate detector (north-rule detector #2).

64-bit SimHash: hash every token to 64 bits; each bit position accumulates
+count / -count votes across tokens; the signature bit is the vote sign.
Near-duplicates differ in few bit positions (Hamming distance), so candidate
lookup splits the 64 bits into ``simhash_bands`` contiguous slices — two docs
within Hamming distance d collide on at least one slice whenever
d < bands (pigeonhole) — and equi-joins per slice, then verifies true
Hamming distance ≤ ``simhash_max_hamming``.

Same join geometry as MinHash LSH (derived-key equi-join + verify), so the
same skew handling applies: bucket caps + AQE.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzy_matching_spark.config import DedupConfig
from fuzzy_matching_spark.operators.minhash import _splitmix64, _MASK64

__all__ = ["simhash_signatures", "simhash_band_table", "simhash_candidates", "verify_hamming"]


def _token_hashes(tokens, seed: int) -> np.ndarray:
    """Stable 64-bit hashes of a token sequence, one vectorized C call.

    ``pd.util.hash_array`` (SipHash-derived, keyed) replaces the per-token
    Python byte fold — ~100x less Python-loop work per doc; the key derives
    from the config seed so output is deterministic for a fixed seed.
    """
    arr = pd.array(tokens, dtype=object) if not isinstance(tokens, np.ndarray) else tokens
    hashed = pd.util.hash_array(
        np.asarray(arr, dtype=object), hash_key=f"{seed & 0xFFFFFFFF:016x}", categorize=False
    )
    return _splitmix64(hashed.astype(np.uint64))


def _simhash_one(text: str, seed: int) -> np.uint64:
    toks = text.split()
    if not toks:
        return np.uint64(0)
    hashes = _token_hashes(toks, seed)
    # vote per token instance (equivalent to unique-with-count weighting)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sig_bits = (votes > 0).astype(np.uint64)
    return np.uint64((sig_bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def simhash_signatures(
    df: DataFrame,
    config: DedupConfig,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, simhash long)."""
    seed = config.seed

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [np.int64(np.uint64(_simhash_one(t or "", seed))) for t in pdf[content_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": sigs})

    return df.select(id_col, content_col).mapInPandas(
        compute, schema=f"`{id_col}` long, simhash long"
    )


def simhash_band_table(sig_df: DataFrame, config: DedupConfig, id_col: str = "doc_id") -> DataFrame:
    """Slice the 64-bit signature into ``simhash_bands`` key columns (JVM-side)."""
    n = config.simhash_bands
    width = 64 // n
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
            for i in range(n)
        ]
    )
    return sig_df.select(id_col, "simhash", F.posexplode(slices).alias("band", "bh"))


def simhash_candidates(
    band_df: DataFrame, config: DedupConfig, id_col: str = "doc_id"
) -> DataFrame:
    """Equi-join per (band, slice value); distinct (id_a < id_b) pairs with sigs."""
    left = band_df.select(
        "band", "bh", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")
    )
    right = band_df.select(
        "band", "bh", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")
    )
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )


def verify_hamming(cands: DataFrame, config: DedupConfig) -> DataFrame:
    """Keep pairs with popcount(xor) <= simhash_max_hamming (pure JVM)."""
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", ham)
        .filter(F.col("hamming") <= config.simhash_max_hamming)
        .select("id_a", "id_b", "hamming")
    )
