"""Batched bit-parallel LCS kernels over numpy uint64 words.

Vectorizes the Crochemore/Iliopoulos/Pinzon/Reid bit-parallel LCS
recurrence (the same algorithm :mod:`kernel.fuzz` runs with Python big
ints) across *many* string pairs at once:

* :func:`lcs_matrix`  — all-pairs LCS lengths for two string lists, the
  kernel behind the greedy matcher's per-block score matrix;
* :func:`lcs_pairs`   — aligned pairwise LCS for two equal-length lists,
  the kernel behind the vectorized scorer pandas UDFs
  (:mod:`functions.scoring`).

Both carry the recurrence ``u = V & PM[c];  V = (V + u) | (V - u)`` with
explicit carry/borrow propagation across 64-bit words, so patterns of any
length are supported.  High bits above a pattern's length are left
unmasked during the iteration — addition carries and subtraction borrows
only travel low→high, so the low ``m`` bits evolve exactly as in the
masked scalar version; the final popcount applies the per-row mask.

Per-step cost is O(n_left * n_right * words) vectorized uint64 ops — a
~100x constant-factor win over the per-pair Python big-int loop that
VERDICT r1 measured at ~36x slower than rapidfuzz C++.

Reference parity target: rapidfuzz ``fuzz.ratio`` semantics as used by
``/root/reference/fuzzy_matching/core/data_matcher.py:626-638``; exact
float equality with :func:`kernel.fuzz.ratio` is locked by
``tests/test_scoring.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "lcs_matrix",
    "lcs_pairs",
    "ratio_matrix",
    "ratio_pairs",
    "partial_ratio_windows",
]

_U0 = np.uint64(0)
_U1 = np.uint64(1)
_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _codepoints(strings):
    """list[str] -> (flat uint32 codepoints, offsets int64 of len n+1)."""
    joined = "".join(strings)
    flat = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=len(strings))
    offs = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return flat, offs


def _popcount(x: np.ndarray) -> np.ndarray:
    """SWAR popcount per uint64 element."""
    x = x - ((x >> _U1) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _pattern_tables(left_flat, left_offs, llens, W):
    """Per-row char-mask table PM of shape (n, V+1, W); vocab sorted.

    Code ``V`` is the sentinel (all-zero mask) for characters that never
    occur in any left string.
    """
    nl = llens.size
    vocab = np.unique(left_flat)
    V = vocab.size
    pm = np.zeros(nl * (V + 1) * W, dtype=np.uint64)
    if left_flat.size:
        row_ids = np.repeat(np.arange(nl, dtype=np.int64), llens)
        pos = np.arange(left_flat.size, dtype=np.int64) - np.repeat(left_offs[:-1], llens)
        code = np.searchsorted(vocab, left_flat)
        word = pos >> 6
        bit = _U1 << (pos & 63).astype(np.uint64)
        flat_idx = (row_ids * (V + 1) + code) * W + word
        np.bitwise_or.at(pm, flat_idx, bit)
    return pm.reshape(nl, V + 1, W), vocab


def _encode_against(vocab, flat, offs, lens, sentinel):
    """Right-side codes padded to (n, maxlen) with ``sentinel``."""
    n = lens.size
    maxr = int(lens.max()) if n else 0
    rc = np.full((n, maxr), sentinel, dtype=np.int32)
    if flat.size:
        idx = np.searchsorted(vocab, flat)
        safe = np.minimum(idx, max(vocab.size - 1, 0))
        known = (idx < vocab.size) & (vocab.size > 0)
        if vocab.size:
            known &= vocab[safe] == flat
        idx = np.where(known, idx, sentinel)
        cpos = np.arange(flat.size, dtype=np.int64) - np.repeat(offs[:-1], lens)
        rc[np.repeat(np.arange(n, dtype=np.int64), lens), cpos] = idx
    return rc


def _row_masks(llens, W):
    """(n, W) uint64: low ``len`` bits set per row, little-endian words."""
    n = llens.size
    mask = np.zeros((n, W), dtype=np.uint64)
    for w in range(W):
        rem = llens - 64 * w
        part = np.clip(rem, 0, 63).astype(np.uint64)
        mask[:, w] = np.where(
            rem >= 64, _U64MAX, np.where(rem > 0, (_U1 << part) - _U1, _U0)
        )
    return mask


def _step_multiword(Vw, pm_list):
    """One recurrence step over per-word contiguous arrays.

    ``Vw``/``pm_list`` are length-W lists of same-shaped uint64 arrays
    (word w of every pair's state / pattern mask).  Keeping each word a
    contiguous 2-D array (instead of slicing the last axis of a 3-D
    array) is what makes the multi-word path faster than the Python
    big-int scalar loop — strided word-slices were ~2x slower.
    """
    W = len(Vw)
    carry = None
    borrow = None
    adds = []
    subs = []
    for w in range(W):
        v = Vw[w]
        u = v & pm_list[w]
        s = v + u
        d = v - u
        if carry is None:
            c = s < v
            b = v < u
        else:
            s2 = s + carry
            c = (s < v) | (s2 < s)
            s = s2
            d2 = d - borrow
            b = (v < u) | (d < borrow)
            d = d2
        adds.append(s)
        subs.append(d)
        if w + 1 < W:
            carry = c.astype(np.uint64)
            borrow = b.astype(np.uint64)
    return [a | s for a, s in zip(adds, subs)]


def lcs_matrix(left: list, right: list) -> np.ndarray:
    """All-pairs LCS lengths: int64 matrix of shape (len(left), len(right))."""
    nl, nr = len(left), len(right)
    out = np.zeros((nl, nr), dtype=np.int64)
    if nl == 0 or nr == 0:
        return out
    lflat, loffs = _codepoints(left)
    rflat, roffs = _codepoints(right)
    llens = np.diff(loffs)
    rlens = np.diff(roffs)
    maxl = int(llens.max())
    maxr = int(rlens.max())
    if maxl == 0 or maxr == 0:
        return out
    W = (maxl + 63) >> 6

    PM, vocab = _pattern_tables(lflat, loffs, llens, W)
    V = vocab.size
    rc = _encode_against(vocab, rflat, roffs, rlens, V)
    rowmask = _row_masks(llens, W)

    # process rights longest-first so the active column set is a prefix
    # that shrinks as t passes each right's length; rights are additionally
    # handled in bounded column chunks so the per-chunk state arrays stay
    # small (a few MB) — chunks of similar length also waste no steps, and
    # small working sets keep worker memory arenas reusable (page-fault-
    # expensive hosts charge heavily for footprint growth)
    order = np.argsort(-rlens, kind="stable")
    rc = rc[order]
    rlens_sorted = rlens[order]
    chunk_cols = max(256, (1 << 21) // max(1, nl * W * 8))  # ~2 MB of state

    PM1 = np.ascontiguousarray(PM[:, :, 0]) if W == 1 else None
    PMw = [np.ascontiguousarray(PM[:, :, w]) for w in range(W)] if W > 1 else None
    ones = np.empty((nl, nr), dtype=np.uint64)

    for lo in range(0, nr, chunk_cols):
        hi = min(nr, lo + chunk_cols)
        rcc = rc[lo:hi]
        rlc = rlens_sorted[lo:hi]
        cmax = int(rlc.max()) if rlc.size else 0
        if W == 1:
            Vv = np.broadcast_to(rowmask[:, :1], (nl, hi - lo)).copy()
            for t in range(cmax):
                act = int(np.searchsorted(-rlc, -t))
                if act == 0:
                    break
                pm = PM1[:, rcc[:act, t]]
                v = Vv[:, :act]
                u = v & pm
                Vv[:, :act] = (v + u) | (v - u)
            ones[:, lo:hi] = _popcount(Vv & rowmask[:, :1])
        else:
            Vw = [
                np.broadcast_to(rowmask[:, w : w + 1], (nl, hi - lo)).copy()
                for w in range(W)
            ]
            for t in range(cmax):
                act = int(np.searchsorted(-rlc, -t))
                if act == 0:
                    break
                codes_t = rcc[:act, t]
                pm_list = [p[:, codes_t] for p in PMw]
                stepped = _step_multiword([v[:, :act] for v in Vw], pm_list)
                for w in range(W):
                    Vw[w][:, :act] = stepped[w]
            ones[:, lo:hi] = sum(
                _popcount(Vw[w] & rowmask[:, w : w + 1]) for w in range(W)
            )
    out = llens[:, None] - ones.astype(np.int64)
    # undo the right-length sort
    inv = np.empty(nr, dtype=np.int64)
    inv[order] = np.arange(nr)
    return out[:, inv]


_PAIR_CHUNK = 1024


def lcs_pairs(left: list, right: list) -> np.ndarray:
    """Aligned pairwise LCS lengths: int64 vector of len(left) == len(right).

    Large inputs are processed in fixed-size chunks: peak working set
    (pattern tables + code matrices) stays a few MB regardless of batch
    size, so worker memory arenas are reused instead of growing — on
    hosts where first-touch page faults are expensive, allocation
    footprint, not arithmetic, dominated large cold batches."""
    n = len(left)
    assert len(right) == n
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    if n > _PAIR_CHUNK:
        for lo in range(0, n, _PAIR_CHUNK):
            out[lo : lo + _PAIR_CHUNK] = lcs_pairs(
                left[lo : lo + _PAIR_CHUNK], right[lo : lo + _PAIR_CHUNK]
            )
        return out
    lflat, loffs = _codepoints(left)
    rflat, roffs = _codepoints(right)
    llens = np.diff(loffs)
    rlens = np.diff(roffs)
    maxl = int(llens.max())
    maxr = int(rlens.max())
    if maxl == 0 or maxr == 0:
        return out
    W = (maxl + 63) >> 6

    PM, vocab = _pattern_tables(lflat, loffs, llens, W)
    V = vocab.size
    rc = _encode_against(vocab, rflat, roffs, rlens, V)
    rowmask = _row_masks(llens, W)
    rows = np.arange(n, dtype=np.int64)

    if W == 1:
        Vv = rowmask[:, 0].copy()
        PM1 = np.ascontiguousarray(PM[:, :, 0])
        for t in range(maxr):
            pm = PM1[rows, rc[:, t]]
            u = Vv & pm
            Vv = (Vv + u) | (Vv - u)
        ones = _popcount(Vv & rowmask[:, 0])
    else:
        Vw = [rowmask[:, w].copy() for w in range(W)]
        PMw = [np.ascontiguousarray(PM[:, :, w]) for w in range(W)]
        for t in range(maxr):
            pm_list = [p[rows, rc[:, t]] for p in PMw]
            Vw = _step_multiword(Vw, pm_list)
        ones = sum(_popcount(Vw[w] & rowmask[:, w]) for w in range(W))
    return llens - ones.astype(np.int64)


def _ratio_from_lcs(lcs, llens, rlens):
    total = llens + rlens
    with np.errstate(divide="ignore", invalid="ignore"):
        r = 200.0 * lcs / total
    return np.where(total == 0, 0.0, r)


def ratio_matrix(left: list, right: list) -> np.ndarray:
    """All-pairs rapidfuzz ``ratio`` (0..100) — float-identical to
    :func:`kernel.fuzz.ratio` (``200.0 * lcs / (len1 + len2)``)."""
    llens = np.fromiter((len(s) for s in left), dtype=np.int64, count=len(left))
    rlens = np.fromiter((len(s) for s in right), dtype=np.int64, count=len(right))
    return _ratio_from_lcs(lcs_matrix(left, right), llens[:, None], rlens[None, :])


def ratio_pairs(left: list, right: list) -> np.ndarray:
    """Aligned pairwise rapidfuzz ``ratio`` (0..100)."""
    llens = np.fromiter((len(s) for s in left), dtype=np.int64, count=len(left))
    rlens = np.fromiter((len(s) for s in right), dtype=np.int64, count=len(right))
    return _ratio_from_lcs(lcs_pairs(left, right), llens, rlens)


# Window-state budget per chunk of the all-windows partial sweep: bounds the
# uint64 state/gather arrays to a few MB so they stay cache-resident and the
# worker's memory arenas are reused (same reasoning as _PAIR_CHUNK above).
_WINDOW_CHUNK = 1 << 19


def partial_ratio_windows(left: list, right: list) -> np.ndarray:
    """Per-pair max of ``ratio(s1, window)`` over ALL rapidfuzz alignment
    windows ``s2[max(0, i) : i + m1]``, ``i in [-(m1-1), m2)`` — the
    ``partial_ratio`` inner loop as one vectorized bit-parallel sweep.

    Preconditions (the :mod:`kernel.batchfuzz` caller enforces them):
    ``1 <= len(left[p]) <= 64`` and ``len(left[p]) <= len(right[p])``.

    Every window of every pair is a state slot in one flat uint64 array;
    step ``j`` feeds slot ``w`` the char ``s2[lo_w + j]`` through the same
    ``u = V & PM[c]; V = (V + u) | (V - u)`` recurrence as
    :func:`lcs_pairs` (single-word: the pattern fits 64 bits).  Windows
    are processed longest-first so the active set is a shrinking prefix —
    total state updates = sum of window lengths ~ m1*m2 per pair, with no
    per-window Python slicing, no dict dedup, and pattern tables built
    once per chunk of PAIRS (the previous formulation pushed ~m1+m2
    materialized slices per pair through lcs_pairs' 1024-pair chunks,
    paying the table-build overhead per 1024 WINDOWS).
    """
    P = len(left)
    out = np.zeros(P, dtype=np.float64)
    if P == 0:
        return out
    # chunk by cumulative window count so state arrays stay bounded
    wn = np.fromiter(
        (len(a) + len(b) - 1 for a, b in zip(left, right)), dtype=np.int64, count=P
    )
    if P > 1 and int(wn.sum()) > _WINDOW_CHUNK:
        csum = np.cumsum(wn)
        lo = 0
        while lo < P:
            base = csum[lo - 1] if lo else 0
            # largest hi with chunk sum <= _WINDOW_CHUNK (>= 1 pair always)
            hi = int(np.searchsorted(csum, base + _WINDOW_CHUNK, side="right"))
            hi = max(lo + 1, min(hi, P))
            out[lo:hi] = partial_ratio_windows(left[lo:hi], right[lo:hi])
            lo = hi
        return out

    lflat, loffs = _codepoints(left)
    rflat, roffs = _codepoints(right)
    m1 = np.diff(loffs)
    m2 = np.diff(roffs)
    PM, vocab = _pattern_tables(lflat, loffs, m1, 1)
    PM1 = np.ascontiguousarray(PM[:, :, 0])  # (P, V+1); sentinel col is 0
    rc = _encode_against(vocab, rflat, roffs, m2, vocab.size)  # (P, max_m2)
    max_m2 = rc.shape[1]
    # text-position masks: TM[p, t] = PM1[p, code of s2_p[t]] (0 when padded)
    TM = PM1[np.arange(P, dtype=np.int64)[:, None], rc].ravel()
    pmask = _row_masks(m1, 1)[:, 0]  # (P,) low-m1-bits masks

    total = int(wn.sum())
    pw = np.repeat(np.arange(P, dtype=np.int64), wn)
    cumw = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(wn, out=cumw[1:])
    k = np.arange(total, dtype=np.int64) - cumw[pw]
    start = k - (m1[pw] - 1)
    lo_w = np.maximum(start, 0)
    wlen = np.minimum(start + m1[pw], m2[pw]) - lo_w

    order = np.argsort(-wlen, kind="stable")
    pw = pw[order]
    gbase = pw * max_m2 + lo_w[order]  # flat TM index of each window's char 0
    wlen = wlen[order]

    V = pmask[pw].copy()
    steps = int(wlen[0]) if total else 0
    neg_wlen = -wlen
    for j in range(steps):
        # active prefix: windows still having a char at index j (wlen > j)
        act = int(np.searchsorted(neg_wlen, -j, side="left"))
        if act == 0:
            break
        pm = TM[gbase[:act] + j]
        v = V[:act]
        u = v & pm
        V[:act] = (v + u) | (v - u)
    ones = _popcount(V & pmask[pw])
    lcs = m1[pw] - ones.astype(np.int64)
    scores = 200.0 * lcs / (m1[pw] + wlen)
    np.maximum.at(out, pw, scores)
    return out
