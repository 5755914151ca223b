"""Vectorized sorted-set kernels (numpy) — the engine's Set contract.

The reference's Set concept (cardinality/union/intersect/difference/
contains over sorted int vectors, gms/representations/sets/sorted_set.h:21-276
with merge kernels in sorted_set_operations.h:29-106) collapses here to
ONE backend: sorted int64 numpy arrays inside Arrow batches. Roaring /
robin-hood variants are physical-storage concerns that Parquet/Tungsten
already own (SURVEY §2.3).

Key reference optimization preserved: *_count variants never materialize
the result set (sorted_set_operations.h:44-71).
"""

from __future__ import annotations

import numpy as np


def intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sorted-unique intersection (set_intersection, sorted_set_operations.h:36-42)."""
    return np.intersect1d(a, b, assume_unique=True)


def intersect_count(a: np.ndarray, b: np.ndarray) -> int:
    """|a ∩ b| without materializing (sorted_set_operations.h:44-71).

    searchsorted of the smaller into the larger: O(min·log max), beats the
    linear merge when sizes are skewed (hub vs leaf neighborhoods).
    """
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0:
        return 0
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = len(b) - 1
    return int(np.count_nonzero(b[idx] == a))


def union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.union1d(a, b)


def union_count(a: np.ndarray, b: np.ndarray) -> int:
    """|a ∪ b| without materializing (sorted_set.h:140-158)."""
    return len(a) + len(b) - intersect_count(a, b)


def difference(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.setdiff1d(a, b, assume_unique=True)


def contains(a: np.ndarray, x: int) -> bool:
    """Binary-search membership (sorted_set.h:218-222)."""
    i = int(np.searchsorted(a, x))
    return i < len(a) and a[i] == x
