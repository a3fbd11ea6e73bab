"""Small numerical kernels with no Spark dependency.

Currently: exact Kendall tau-b on numpy arrays — the driver-fallback kernel
for ``corr(method='kendall')`` (the reference also computes only pearson
distributed and defaults other methods to pandas, ref
modin/core/storage_formats/pandas/aggregations.py:60; pandas' own kendall
needs scipy, which this environment doesn't ship, so the kernel is inlined).
"""

from __future__ import annotations

import numpy as np


def _count_inversions(y: np.ndarray) -> int:
    """Strict inversions (pairs i<j with y[i] > y[j]) via bottom-up
    mergesort with vectorized searchsorted cross-counts — O(n log^2 n)."""
    n = len(y)
    inv = 0
    width = 1
    arr = y.copy()
    while width < n:
        for lo in range(0, n, 2 * width):
            mid = min(lo + width, n)
            hi = min(lo + 2 * width, n)
            if mid >= hi:
                continue
            L, R = arr[lo:mid], arr[mid:hi]
            # pairs (l in L, r in R) with l > r; equal values excluded
            inv += int((len(L) - np.searchsorted(L, R, side="right")).sum())
            arr[lo:hi] = np.sort(arr[lo:hi], kind="mergesort")
        width *= 2
    return inv


def kendall_tau_b(a: np.ndarray, b: np.ndarray) -> float:
    """Exact tau-b with tie corrections (scipy-compatible formula)."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    mask = ~(np.isnan(a) | np.isnan(b))
    a, b = a[mask], b[mask]
    n = len(a)
    if n < 2:
        return float("nan")
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]

    def tie_sum(x: np.ndarray) -> int:
        _, counts = np.unique(x, return_counts=True)
        return int((counts * (counts - 1) // 2).sum())

    tot = n * (n - 1) // 2
    xtie = tie_sum(a_s)
    ytie = tie_sum(b)
    _, joint_counts = np.unique(np.stack([a_s, b_s], axis=1), axis=0, return_counts=True)
    ntie = int((joint_counts * (joint_counts - 1) // 2).sum())
    dis = _count_inversions(b_s)
    con_minus_dis = tot - xtie - ytie + ntie - 2 * dis
    denom = np.sqrt(float(tot - xtie)) * np.sqrt(float(tot - ytie))
    if denom == 0:
        return float("nan")
    return float(con_minus_dis / denom)
