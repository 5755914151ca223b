"""Bit-packed set backend — the dense-container variant of the Set contract.

The reference ships MULTIPLE Set backends behind one concept and picks
per kernel: sorted int vectors (gms/representations/sets/sorted_set.h:21),
Roaring bitmaps (roaring_set.h:16) whose dense chunks are plain bitmap
containers, and robin-hood hash sets. This engine's default backend is
sorted int64 numpy (setops.py — the sorted_set analog); this module is
the second backend, the Roaring *dense container* analog: a set is a
bit-packed uint64 word array over a value range, set algebra is word-wise
AND/OR/ANDNOT, and cardinality is a table-driven popcount. All kernels
are pure numpy and Arrow-batch friendly — no per-element Python.

Same physical-layer division of labor as setops.py: Parquet/Tungsten own
on-disk/in-shuffle encoding; these words exist only INSIDE an executor's
Arrow batch while a mining kernel runs.

When it wins (the Roaring container-selection rule, re-derived for the
batch shape): an intersect-count over a row pair costs
  sorted   ~ min(la, lb) · log2(max(la, lb))   (searchsorted probes)
  bitmap   ~ (la + lb) scatter + range/64 AND+popcount words
so the bitmap wins when the value RANGE spanned by the pair is within a
small multiple of the element count — dense neighborhoods, which is
exactly what RelabelByDegree compaction produces for hub blocks (low ids
concentrate). ``batch_intersect_count`` applies the range-compression
per row (lo = min of the pair, like a Roaring chunk base), so scattered
sparse rows degrade to correctness, not to universe-sized buffers: the
words buffer for a batch is Σ ceil(range_i/64), never n_rows × |V|/64.
"""

from __future__ import annotations

import sys

import numpy as np

# pack/unpack view uint64 words as bytes (words.view(np.uint8) +
# unpackbits(bitorder='little')) — that layout equivalence assumes a
# little-endian host; on a big-endian one the round trip would return
# wrong values silently. Every supported target is little-endian; fail
# loudly rather than corrupt sets if that ever changes.
if sys.byteorder != "little":  # pragma: no cover
    raise ImportError("gms_spark.graph.bitset requires a little-endian host")

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def pack(a: np.ndarray, lo: int | None = None, hi: int | None = None) -> tuple[np.ndarray, int]:
    """Sorted-unique int64 values → (uint64 words, base offset).

    ``lo``/``hi`` pin the represented range (default: the array's own
    span — the Roaring chunk-base trick, so sparse-but-clustered sets
    stay small)."""
    a = np.asarray(a, dtype=np.int64)
    if len(a) == 0:
        return np.zeros(0, dtype=np.uint64), int(lo or 0)
    lo = int(a[0]) if lo is None else int(lo)
    hi = int(a[-1]) if hi is None else int(hi)
    rng = hi - lo + 1
    words = np.zeros((rng + 63) // 64, dtype=np.uint64)
    rel = (a - lo).astype(np.uint64)
    np.bitwise_or.at(words, (rel >> np.uint64(6)).astype(np.int64), np.uint64(1) << (rel & np.uint64(63)))
    return words, lo


def unpack(words: np.ndarray, base: int = 0) -> np.ndarray:
    """(words, base) → sorted int64 values."""
    if len(words) == 0:
        return np.empty(0, dtype=np.int64)
    bits = np.unpackbits(words.view(np.uint8), bitorder="little")
    return np.nonzero(bits)[0].astype(np.int64) + base


def _align(wa, ba, wb, bb):
    """Re-base two word arrays onto one shared range (word-aligned)."""
    lo = min(ba, bb) & ~63
    hi = max(ba + len(wa) * 64, bb + len(wb) * 64)
    n = (hi - lo + 63) // 64
    a = np.zeros(n, dtype=np.uint64)
    b = np.zeros(n, dtype=np.uint64)
    # bases produced by pack() are arbitrary: shift into word-aligned frame
    for src, dst, base in ((wa, a, ba), (wb, b, bb)):
        if len(src) == 0:
            continue
        off = base - lo
        w0, s = off // 64, off % 64
        if s == 0:
            dst[w0 : w0 + len(src)] |= src
        else:
            dst[w0 : w0 + len(src)] |= src << np.uint64(s)
            dst[w0 + 1 : w0 + 1 + len(src)] |= src >> np.uint64(64 - s)
    return a, b, lo


def cardinality(words: np.ndarray) -> int:
    """Popcount over the words (roaring_set.h cardinality)."""
    if len(words) == 0:
        return 0
    return int(_POP[words.view(np.uint8)].sum())


def intersect(wa, ba, wb, bb) -> tuple[np.ndarray, int]:
    a, b, lo = _align(wa, ba, wb, bb)
    return a & b, lo


def intersect_count(wa, ba, wb, bb) -> int:
    """|a ∩ b| without materializing — AND + popcount."""
    a, b, _ = _align(wa, ba, wb, bb)
    return cardinality(a & b)


def union(wa, ba, wb, bb) -> tuple[np.ndarray, int]:
    a, b, lo = _align(wa, ba, wb, bb)
    return a | b, lo


def union_count(wa, ba, wb, bb) -> int:
    a, b, _ = _align(wa, ba, wb, bb)
    return cardinality(a | b)


def difference(wa, ba, wb, bb) -> tuple[np.ndarray, int]:
    a, b, lo = _align(wa, ba, wb, bb)
    return a & ~b, lo


def contains(words: np.ndarray, base: int, x: int) -> bool:
    rel = x - base
    if rel < 0 or rel >= len(words) * 64:
        return False
    return bool((int(words[rel // 64]) >> (rel % 64)) & 1)


def add(words: np.ndarray, base: int, x: int) -> tuple[np.ndarray, int]:
    """Set bit x (re-packs when x falls outside the represented range)."""
    rel = x - base
    if 0 <= rel < len(words) * 64:
        w = words.copy()
        w[rel // 64] |= np.uint64(1) << np.uint64(rel % 64)
        return w, base
    return pack(np.union1d(unpack(words, base), np.array([x], dtype=np.int64)))


def remove(words: np.ndarray, base: int, x: int) -> tuple[np.ndarray, int]:
    rel = x - base
    if 0 <= rel < len(words) * 64:
        w = words.copy()
        w[rel // 64] &= ~(np.uint64(1) << np.uint64(rel % 64))
        return w, base
    return words, base


def set_range(n: int) -> tuple[np.ndarray, int]:
    """The set {0..n-1} — full words + one masked tail word."""
    words = np.full((n + 63) // 64, ~np.uint64(0), dtype=np.uint64)
    if n % 64 and len(words):
        words[-1] = (np.uint64(1) << np.uint64(n % 64)) - np.uint64(1)
    return words, 0


def equals(wa, ba, wb, bb) -> bool:
    a, b, _ = _align(wa, ba, wb, bb)
    return bool(np.array_equal(a, b))


def batch_intersect_count(rows_a, rows_b, dense_factor: int = 64) -> np.ndarray:
    """Per-row |a ∩ b| for a whole Arrow batch — bitmap backend with
    per-row container selection.

    ``rows_a``/``rows_b``: equal-length sequences of sorted-unique int64
    arrays (the same contract as setops.batch_intersect; only counts are
    produced — the count path never materializes values, mirroring the
    reference's *_count kernels). Fully vectorized: ONE flat words
    buffer per side sized Σ ceil(range_i/64) (per-row range compression
    = Roaring chunk bases), one scatter-OR per side, one AND + LUT
    popcount + segmented sum for the whole batch.

    Container selection (the Roaring array-vs-bitmap rule, applied per
    row pair): the bitmap path runs only for rows whose shared value
    range is ≤ ``dense_factor`` · (la+lb); sparser rows fall back to the
    sorted searchsorted kernel. Measured on 2000-row batches of 512-id
    sets: dense (range≈2·len) 15× faster than sorted, mid (range≈16·len)
    2×, while an unguarded bitmap on range≈2000·len rows was ~500×
    SLOWER — the per-row guard keeps the kernel safe on any input.
    """
    n = len(rows_a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    arrs_a = [np.asarray(x, dtype=np.int64) for x in rows_a]
    arrs_b = [np.asarray(x, dtype=np.int64) for x in rows_b]
    la = np.fromiter((len(x) for x in arrs_a), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in arrs_b), dtype=np.int64, count=n)
    both = (la > 0) & (lb > 0)
    counts = np.zeros(n, dtype=np.int64)
    if not both.any():
        return counts
    # per-row range (rows sorted: first/last are min/max)
    rng_all = np.array(
        [
            max(arrs_a[i][-1], arrs_b[i][-1]) - min(arrs_a[i][0], arrs_b[i][0]) + 1 if both[i] else 0
            for i in range(n)
        ],
        dtype=np.int64,
    )
    dense = both & (rng_all <= dense_factor * (la + lb))
    sparse_idx = np.nonzero(both & ~dense)[0]
    if len(sparse_idx):
        from gms_spark.graph.setops import batch_intersect

        _, sc, _ = batch_intersect([arrs_a[i] for i in sparse_idx], [arrs_b[i] for i in sparse_idx])
        counts[sparse_idx] = sc
    if not dense.any():
        return counts
    idx = np.nonzero(dense)[0]
    A = np.concatenate([arrs_a[i] for i in idx])
    B = np.concatenate([arrs_b[i] for i in idx])
    la, lb = la[idx], lb[idx]
    # shared per-row range: lo = min(firsts), hi = max(lasts) (sorted rows)
    first_a = A[np.concatenate(([0], np.cumsum(la)[:-1]))]
    first_b = B[np.concatenate(([0], np.cumsum(lb)[:-1]))]
    last_a = A[np.cumsum(la) - 1]
    last_b = B[np.cumsum(lb) - 1]
    lo = np.minimum(first_a, first_b)
    hi = np.maximum(last_a, last_b)
    nwords = (hi - lo) // 64 + 1  # ceil(range/64)
    woff = np.concatenate(([0], np.cumsum(nwords)))
    total_w = int(woff[-1])
    wa = np.zeros(total_w, dtype=np.uint64)
    wb = np.zeros(total_w, dtype=np.uint64)
    row_of_a = np.repeat(np.arange(len(idx)), la)
    row_of_b = np.repeat(np.arange(len(idx)), lb)
    rel_a = (A - lo[row_of_a]).astype(np.uint64)
    rel_b = (B - lo[row_of_b]).astype(np.uint64)
    np.bitwise_or.at(
        wa, woff[row_of_a] + (rel_a >> np.uint64(6)).astype(np.int64), np.uint64(1) << (rel_a & np.uint64(63))
    )
    np.bitwise_or.at(
        wb, woff[row_of_b] + (rel_b >> np.uint64(6)).astype(np.int64), np.uint64(1) << (rel_b & np.uint64(63))
    )
    pops = _POP[(wa & wb).view(np.uint8)]
    # byte-level segmented sum: row i owns bytes [8*woff[i], 8*woff[i+1])
    seg = np.add.reduceat(pops, woff[:-1] * 8)
    # reduceat quirk: empty segments copy the next element — impossible
    # here (nwords >= 1 for every surviving row)
    counts[idx] = seg
    return counts
