"""MinHash + LSH near-duplicate candidate generation (north-rule detector #1).

Replaces the reference's first-char blocking (``data_matcher.py:232-260``)
as the candidate generator at corpus scale: the same *shape* — an equi-join
on a derived key — but the key is an LSH band hash, so candidate volume is
controlled by (bands, rows) instead of alphabet size (SURVEY.md §2.3 J1).

Dataflow (all Arrow-batched, no per-row Python):

1. ``minhash_signatures`` — mapInPandas: content -> k-shingle set -> 64-bit
   shingle hashes (vectorized polynomial rolling hash over codepoints) ->
   ``num_perm`` multiply-shift permutations -> signature (array<long>) +
   per-band fold hashes (array<long>).
2. ``band_table`` — ``posexplode`` of the band array: (doc_id, band, bh).
3. ``candidate_pairs`` — self-equi-join on (band, bh) with ``id_a < id_b``;
   hot buckets above ``max_bucket_size`` are *excluded and counted* (license
   headers / generated boilerplate would otherwise quadratically explode one
   reducer); AQE skew-join handles residual imbalance.
4. ``verify_pairs_exact`` — join contents back and compute the exact shingle
   Jaccard per pair in a pandas UDF (correctness mode), or
   ``estimate_similarity`` from signature agreement (cheap mode: ±1/sqrt(P)).

Determinism: all hash seeds derive from ``DedupConfig.seed``; output is
independent of partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzy_matching_spark.config import DedupConfig

__all__ = [
    "shingle_hashes",
    "minhash_signatures",
    "band_table",
    "candidate_pairs",
    "verify_pairs_exact",
    "estimate_similarity",
]

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_POLY_BASE = np.uint64(1000003)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — decorrelates sequential seeds (public domain)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return x ^ (x >> np.uint64(31))


def _perm_params(num_perm: int, seed: int):
    """(a, b) multiply-add parameters; a forced odd for bijectivity mod 2^64."""
    base = _splitmix64(np.arange(seed, seed + 2 * num_perm, dtype=np.uint64))
    a = base[:num_perm] | np.uint64(1)
    b = base[num_perm:]
    return a, b


def shingle_hashes(text: str, k: int, tokenize: str = "char") -> np.ndarray:
    """Unique 64-bit hashes of the k-shingles of ``text`` (vectorized).

    ``char`` mode: k-grams over unicode codepoints via a rolling polynomial
    hash (k vector ops, O(n) total).  ``word`` mode: k-grams over whitespace
    tokens (token ids first, then the same polynomial fold).
    """
    if tokenize == "word":
        toks = text.split()
        if len(toks) < k:
            # degenerate doc: a single shingle hashing the whole text
            return np.array([_fold_bytes(" ".join(toks).encode("utf-8"))], dtype=np.uint64)
        # stable token ids: hash each token's bytes with a per-token fold
        units = np.fromiter(
            (_fold_bytes(t.encode("utf-8")) for t in toks), dtype=np.uint64, count=len(toks)
        )
    else:
        cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        if cps.size < k:
            return np.array([_fold_bytes(text.encode("utf-8"))], dtype=np.uint64)
        units = cps

    n = units.size
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = (h * _POLY_BASE + units[j : j + m]) & _MASK64
    return np.unique(_splitmix64(h))


def _fold_bytes(b: bytes) -> np.uint64:
    h = 1469598103934665603  # FNV-ish fold, splitmix-finalized
    for byte in b:
        h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return _splitmix64(np.array([h], dtype=np.uint64))[0]


def _minhash_one(shingles: np.ndarray, a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """min over shingles of (a*x + b) mod 2^64, chunked to bound memory."""
    num_perm = a.size
    sig = np.full(num_perm, _MASK64, dtype=np.uint64)
    for lo in range(0, shingles.size, chunk):
        x = shingles[lo : lo + chunk]
        # (P, C) grid; uint64 wraparound is the intended modulus
        grid = (a[:, None] * x[None, :] + b[:, None]) & _MASK64
        np.minimum(sig, grid.min(axis=1), out=sig)
    return sig


def _band_fold(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Fold each band's rows into one 64-bit value (order-sensitive)."""
    view = sig.reshape(bands, rows)
    out = np.zeros(bands, dtype=np.uint64)
    for j in range(rows):
        out = (out * _POLY_BASE + view[:, j]) & _MASK64
    # mix in the band index so identical folds in different bands don't join
    return _splitmix64(out + np.arange(bands, dtype=np.uint64))


def minhash_signatures(
    df: DataFrame,
    config: DedupConfig,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, sig array<long>, bands array<long>, n_shingles int)."""
    k = config.shingle_size
    tokenize = config.tokenize
    num_perm = config.num_perm
    n_bands, rows = config.bands, config.rows_per_band
    seed = config.seed

    out_schema = f"`{id_col}` long, sig array<long>, bands array<long>, n_shingles int"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a, b = _perm_params(num_perm, seed)
        for pdf in batches:
            ids, sigs, bandvals, counts = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[content_col]):
                sh = shingle_hashes(text or "", k, tokenize)
                sig = _minhash_one(sh, a, b)
                ids.append(doc_id)
                sigs.append(sig.view(np.int64))
                bandvals.append(_band_fold(sig, n_bands, rows).view(np.int64))
                counts.append(sh.size)
            yield pd.DataFrame(
                {id_col: ids, "sig": sigs, "bands": bandvals, "n_shingles": counts}
            )

    return df.select(id_col, content_col).mapInPandas(compute, schema=out_schema)


def band_table(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """posexplode(bands) -> (doc_id, band int, bh long)."""
    return sig_df.select(
        id_col, F.posexplode("bands").alias("band", "bh")
    )


def candidate_pairs(
    bands_df: DataFrame,
    config: DedupConfig,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Self-join on (band, bh) -> distinct (id_a < id_b) candidate pairs.

    Returns ``(pairs, bucket_metrics)``; buckets larger than
    ``max_bucket_size`` are excluded from pair expansion and surfaced in the
    metrics frame (band, bh, size, skipped) — never silently dropped.

    The size filter is a window count over (band, bh) — one extra shuffle,
    fully distributed.  (A broadcast semi-join of "ok buckets" would funnel
    every bucket key through the driver: at corpus scale that's millions of
    rows of driver work that doesn't shrink with cluster size.)
    """
    from pyspark.sql.window import Window

    sizes = bands_df.groupBy("band", "bh").agg(F.count("*").alias("size"))
    metrics = sizes.withColumn("skipped", F.col("size") > config.max_bucket_size)
    w = Window.partitionBy("band", "bh")
    kept = (
        bands_df.withColumn("_bsz", F.count("*").over(w))
        .filter((F.col("_bsz") > 1) & (F.col("_bsz") <= config.max_bucket_size))
        .drop("_bsz")
    )

    left = kept.select(F.col("band"), F.col("bh"), F.col(id_col).alias("id_a"))
    right = kept.select(F.col("band"), F.col("bh"), F.col(id_col).alias("id_b"))
    pairs = (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs, metrics


def estimate_similarity(pairs: DataFrame, sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Jaccard estimate = fraction of agreeing signature components."""
    a = sig_df.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    b = sig_df.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    return joined.select(
        "id_a", "id_b", (agree / F.size("sig_a")).cast("double").alias("sim")
    )


def verify_pairs_exact(
    pairs: DataFrame,
    corpus: DataFrame,
    config: DedupConfig,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact shingle-set Jaccard per candidate pair (pandas UDF, batched).

    Joins content for both sides (two shuffles of the *candidate* subset,
    not the corpus) and re-shingles inside the worker.  Exactness here is
    what makes the ≥0.99-recall-vs-oracle guarantee testable.
    """
    k, tokenize = config.shingle_size, config.tokenize
    docs = corpus.select(F.col(id_col), F.col(content_col))
    a = docs.select(F.col(id_col).alias("id_a"), F.col(content_col).alias("content_a"))
    b = docs.select(F.col(id_col).alias("id_b"), F.col(content_col).alias("content_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")

    def jaccard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}

        def sh(text):
            key = id(text)
            got = cache.get(key)
            if got is None:
                got = shingle_hashes(text or "", k, tokenize)
                if len(cache) > 4096:
                    cache.clear()
                cache[key] = got
            return got

        for pdf in batches:
            sims = []
            for ca, cb in zip(pdf["content_a"], pdf["content_b"]):
                sa, sb = sh(ca), sh(cb)
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                sims.append(inter / union if union else 0.0)
            yield pd.DataFrame({"id_a": pdf["id_a"], "id_b": pdf["id_b"], "sim": sims})

    return joined.mapInPandas(jaccard, schema="id_a long, id_b long, sim double")
