"""Vectorized scorer registry: FuzzyAlgorithm enum value -> batched scorer.

The reference dispatches every pair through rapidfuzz C++
(``/root/reference/fuzzy_matching/core/data_matcher.py:626-638``).  The
Spark engine's hot paths instead go through this module:

* :func:`score_matrix`   — all-pairs score matrix for a block (the greedy
  matcher's kernel; ``operators/greedy_match.py`` computes the whole
  block's matrix vectorized, then runs the sequential argmax assignment
  the reference semantics demand);
* :func:`score_pairs`    — aligned pairwise scores for Arrow batches;
* :func:`scorer_udf`     — pandas UDF twin of ``pairscore.get_similarity``
  (lowercase, empty->0, result in [0, 1]) for DataFrame pipelines.

``ratio`` and ``token_sort_ratio`` run on the numpy bit-parallel LCS
kernel (:mod:`kernel.batchlcs`); the remaining scorers (partial / token-set
/ WRatio — sliding-window and cascade logic that doesn't vectorize into a
single LCS pass) fall back to the scalar kernel over *unique* value pairs,
which the lru-cached :func:`kernel.fuzz.score` already serves.

Float parity with the scalar path is exact (same integer LCS, same
``200.0 * lcs / total`` arithmetic) and locked by ``tests/test_scoring.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from fuzzy_matching_spark.kernel import batchlcs, fuzz

__all__ = [
    "score_matrix",
    "score_pairs",
    "scorer_udf",
    "config_score_matrix",
    "VECTORIZED",
]

# scorers with a fully vectorized path; everything else uses the scalar
# kernel over unique pairs
VECTORIZED = frozenset({"ratio", "token_sort_ratio"})


def _sorted_joins(vals) -> list:
    return [" ".join(sorted(v.split())) for v in vals]


def score_matrix(algorithm: str, left_vals, right_vals) -> np.ndarray:
    """(len(left), len(right)) float64 scores in [0, 100].

    Unknown algorithm names fall back to ``ratio`` — the reference's F6
    semantics (``data_matcher.py:636-638``).
    """
    left_vals = list(left_vals)
    right_vals = list(right_vals)
    if algorithm == "token_sort_ratio":
        return batchlcs.ratio_matrix(_sorted_joins(left_vals), _sorted_joins(right_vals))
    if algorithm in ("partial_ratio", "token_set_ratio", "wratio"):
        fn = fuzz.SCORERS[algorithm]
        out = np.empty((len(left_vals), len(right_vals)), dtype=np.float64)
        for i, s1 in enumerate(left_vals):
            for j, s2 in enumerate(right_vals):
                out[i, j] = fn(s1, s2)
        return out
    return batchlcs.ratio_matrix(left_vals, right_vals)


def score_pairs(algorithm: str, left_vals, right_vals) -> np.ndarray:
    """Aligned pairwise scores in [0, 100] (vector of len(left))."""
    left_vals = list(left_vals)
    right_vals = list(right_vals)
    if algorithm == "token_sort_ratio":
        return batchlcs.ratio_pairs(_sorted_joins(left_vals), _sorted_joins(right_vals))
    if algorithm in ("partial_ratio", "token_set_ratio", "wratio"):
        fn = fuzz.SCORERS[algorithm]
        return np.fromiter(
            (fn(a, b) for a, b in zip(left_vals, right_vals)),
            dtype=np.float64,
            count=len(left_vals),
        )
    return batchlcs.ratio_pairs(left_vals, right_vals)


def scorer_udf(algorithm: str):
    """Pandas UDF (double) with ``pairscore.get_similarity`` semantics:
    lowercase both sides, empty/None -> 0.0, result in [0, 1]."""
    from pyspark.sql.functions import pandas_udf

    algo = algorithm

    @pandas_udf("double")
    def _score(s1: pd.Series, s2: pd.Series) -> pd.Series:
        a = s1.fillna("").astype(str).str.lower()
        b = s2.fillna("").astype(str).str.lower()
        res = score_pairs(algo, a.tolist(), b.tolist()) / 100.0
        res[(a == "").to_numpy() | (b == "").to_numpy()] = 0.0
        return pd.Series(res)

    return _score


# ---------------------------------------------------------------------------
# block score matrix for a MatchConfig (the greedy matcher kernel)
# ---------------------------------------------------------------------------


def _unique_inverse(vals: list):
    arr = np.array(vals, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    return list(uniq), inv


def _translit_field_matrix(left_vals, right_vals, fc, config) -> np.ndarray:
    """Scalar unique-pair path for transliterate-enabled fields.

    Transliteration direction depends on *both* sides' detected languages
    (``pairscore.process_transliteration``), so the transform is genuinely
    pair-wise; uniqueness still collapses repeated values.
    """
    from fuzzy_matching_spark.kernel import pairscore

    ul, linv = _unique_inverse(left_vals)
    ur, rinv = _unique_inverse(right_vals)
    m = np.empty((len(ul), len(ur)), dtype=np.float64)
    for i, v1 in enumerate(ul):
        for j, v2 in enumerate(ur):
            t1, t2, _ = pairscore.process_transliteration(v1, v2, config)
            m[i, j] = pairscore.get_similarity(
                t1, t2, fc.fuzzy_algorithm, config.fuzzy_algorithm
            )
    return m[linv][:, rinv]


def config_score_matrix(left: pd.DataFrame, right: pd.DataFrame, config) -> np.ndarray:
    """(n_left, n_right) weighted-mean similarity in [0, 1].

    Float-identical to looping ``pairscore.weighted_similarity`` over the
    cross product: same per-field ``fn(lower, lower)/100`` values, same
    field accumulation order, same ``sum(s*w)/sum(w)`` arithmetic.
    """
    nl, nr = len(left), len(right)
    if not config.fields:
        return np.zeros((nl, nr))
    total_w = sum(fc.weight for fc in config.fields)
    acc = np.zeros((nl, nr), dtype=np.float64)
    for fc in config.fields:
        lv = (
            left[fc.field].fillna("").astype(str).tolist()
            if fc.field in left.columns
            else [""] * nl
        )
        rv = (
            right[fc.field].fillna("").astype(str).tolist()
            if fc.field in right.columns
            else [""] * nr
        )
        if fc.transliterate and config.transliteration.enabled:
            mat = _translit_field_matrix(lv, rv, fc, config)
        else:
            algo = fc.fuzzy_algorithm if fc.fuzzy_algorithm is not None else config.fuzzy_algorithm
            ul, linv = _unique_inverse([v.lower() for v in lv])
            ur, rinv = _unique_inverse([v.lower() for v in rv])
            m_u = score_matrix(algo.value, ul, ur) / 100.0
            # empty operands score 0 (pairscore.get_similarity guard)
            for i, v in enumerate(ul):
                if not v:
                    m_u[i, :] = 0.0
            for j, v in enumerate(ur):
                if not v:
                    m_u[:, j] = 0.0
            mat = m_u[linv][:, rinv]
        acc += mat * fc.weight
    if total_w <= 0:
        return np.zeros((nl, nr))
    return acc / total_w
