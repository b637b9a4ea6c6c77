"""MinHash kernel unit tests (no Spark session needed).

Locks two contracts the distributed path depends on:

* the reversed-scatter OPH implementation equals a per-doc reference
  bucket-min loop (this pins numpy's documented last-write-wins fancy
  assignment ordering — if a numpy upgrade ever broke it, this fails);
* OPH signatures estimate Jaccard about as well as classic 125-perm
  minwise, and band folding collides for high-Jaccard pairs.
"""

import numpy as np
import pytest

from fuzzy_matching_spark.config import DedupConfig
from fuzzy_matching_spark.operators.minhash import (
    _MASK64,
    _band_fold_batch,
    _minhash_one,
    _oph_batch,
    _perm_params,
    shingle_hashes,
)


def _reference_oph(shingle_sets, num_perm):
    """Per-doc bucket-min loop (the semantics _oph_batch must reproduce)."""
    out = np.full((len(shingle_sets), num_perm), _MASK64, dtype=np.uint64)
    for d, sh in enumerate(shingle_sets):
        for h in sh:
            b = int(h % np.uint64(num_perm))
            if h < out[d, b]:
                out[d, b] = h
    return out


def _make_docs(n, seed=7):
    rng = np.random.default_rng(seed)
    docs = []
    base = rng.integers(0, 2**63, 4000, dtype=np.int64).astype(np.uint64)
    for i in range(n):
        k = int(rng.integers(5, 2500))
        take = rng.choice(base.size, size=k, replace=False)
        docs.append(np.unique(base[take]))
    return docs


def _batchify(docs):
    counts = np.array([d.size for d in docs])
    all_sh = np.concatenate(docs)
    doc_idx = np.repeat(np.arange(len(docs), dtype=np.uint64), counts)
    return all_sh, doc_idx


def test_oph_scatter_matches_reference():
    docs = _make_docs(50)
    all_sh, doc_idx = _batchify(docs)
    got = _oph_batch(all_sh, doc_idx, len(docs), 125)
    ref = _reference_oph(docs, 125)
    filled = ref != _MASK64
    assert (got[filled] == ref[filled]).all()
    # densified buckets must not be the sentinel
    assert (got != _MASK64).all()


def test_oph_densification_deterministic_and_band_safe():
    # doc with very few shingles -> mostly empty buckets
    docs = [np.unique(np.array([3, 900, 2**40], dtype=np.uint64))]
    all_sh, doc_idx = _batchify(docs)
    a = _oph_batch(all_sh, doc_idx, 1, 125)
    b = _oph_batch(all_sh.copy(), doc_idx.copy(), 1, 125)
    assert (a == b).all()
    # two different sparse docs must not band-collide purely via the
    # densification fill pattern
    docs2 = [docs[0], np.unique(np.array([5, 1200, 2**41], dtype=np.uint64))]
    all_sh2, doc_idx2 = _batchify(docs2)
    sigs = _oph_batch(all_sh2, doc_idx2, 2, 125)
    bands = _band_fold_batch(sigs, 25, 5)
    assert not (bands[0] == bands[1]).any()


def test_oph_estimates_jaccard_close_to_classic():
    docs = _make_docs(60, seed=11)
    all_sh, doc_idx = _batchify(docs)
    oph = _oph_batch(all_sh, doc_idx, len(docs), 125)
    a, b = _perm_params(125, 42)
    classic = np.stack([_minhash_one(sh, a, b) for sh in docs])

    errs_oph, errs_classic = [], []
    for i in range(0, 40, 2):
        j = i + 1
        inter = np.intersect1d(docs[i], docs[j], assume_unique=True).size
        union = docs[i].size + docs[j].size - inter
        jac = inter / union
        errs_oph.append(abs((oph[i] == oph[j]).mean() - jac))
        errs_classic.append(abs((classic[i] == classic[j]).mean() - jac))
    # OPH should not be materially worse than classic minwise
    assert np.mean(errs_oph) <= np.mean(errs_classic) + 0.02


def test_signature_batch_independence():
    """Signatures must not depend on which docs share an Arrow batch."""
    docs = _make_docs(20, seed=3)
    all_sh, doc_idx = _batchify(docs)
    whole = _oph_batch(all_sh, doc_idx, len(docs), 125)
    for lo, hi in ((0, 7), (7, 20)):
        part = docs[lo:hi]
        sh, di = _batchify(part)
        got = _oph_batch(sh, di, len(part), 125)
        assert (got == whole[lo:hi]).all()


def test_shingle_hashes_sorted_unique():
    sh = shingle_hashes("def foo(x):\n    return x + 1\n" * 10, 5, "char")
    assert (np.diff(sh.astype(np.int64).view(np.uint64)) > 0).all() or (
        np.diff(sh) > 0
    ).all()
    assert sh.dtype == np.uint64
