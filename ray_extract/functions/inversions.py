"""Vectorized inversion counting — the out-of-order-pairs kernel behind
stream-disorder audits (and Kendall-tau style concordance terms).

``count_inversions`` counts pairs (i, j) with i < j and a[i] > a[j] in
O(n log^2 n) using a bottom-up merge where every level is ONE numpy
axis-sort over a (blocks, 2*width) matrix — no per-element Python loop.
Inputs must be pairwise-distinct integers (callers rank-with-tiebreak
first, which is also how ties are given their intended semantics).
"""

from __future__ import annotations

import numpy as np


def count_inversions(a: np.ndarray) -> int:
    """Number of inversions in a 1-D array of DISTINCT integers."""
    n = len(a)
    if n < 2:
        return 0
    if n <= 64:
        # tiny inputs: one triangular broadcast beats merge bookkeeping
        iu, ju = np.triu_indices(n, 1)
        return int(np.sum(a[iu] > a[ju]))
    # pad to a power of two with strictly increasing values ABOVE max(a):
    # pads sit at the array tail and sort to block tails, so they never
    # add inversions (largest values, latest positions)
    m = 1 << int(np.ceil(np.log2(n)))
    buf = np.empty(m, dtype=np.int64)
    buf[:n] = a
    if m > n:
        top = int(a.max())
        buf[n:] = top + 1 + np.arange(m - n, dtype=np.int64)
    total = 0
    width = 1
    while width < m:
        rows = buf.reshape(-1, 2 * width)
        order = np.argsort(rows, axis=1, kind="stable")
        rank = np.empty_like(order)
        np.put_along_axis(
            rank, order, np.broadcast_to(np.arange(2 * width), rows.shape), 1
        )
        # right element j (0-based within its sorted right half) has
        # exactly j right-elements below it; rank - j of them are left
        # elements <= it, so width - (rank - j) left elements exceed it
        right_rank = rank[:, width:]
        j = np.arange(width)
        total += int(np.sum(width - (right_rank - j)))
        buf = np.sort(rows, axis=1, kind="stable").ravel()
        width *= 2
    return total


def inversions_with_tiebreak(primary: np.ndarray, tiebreak: np.ndarray) -> int:
    """Inversions of ``primary`` visited in index order, where ties in
    ``primary`` are NOT inversions: ranks are assigned by (primary,
    tiebreak-already-index-order) lexsort so equal-primary pairs come out
    concordant."""
    order = np.lexsort((tiebreak, primary))
    rank = np.empty(len(primary), dtype=np.int64)
    rank[order] = np.arange(len(primary), dtype=np.int64)
    return count_inversions(rank)
