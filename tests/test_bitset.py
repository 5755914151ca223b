"""Bitmap set backend (graph/bitset.py) — parity with the sorted backend.

The contract is the reference's Set concept; the oracle is Python sets
(as in test_setops.py) plus setops.batch_intersect for the batch kernel.
Property-based: hypothesis drives value ranges that exercise the
range-compression (chunk-base) paths, word-boundary bits, and empties.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gms_spark.graph import bitset as B
from gms_spark.graph.setops import batch_intersect

ints = st.integers(min_value=-1000, max_value=100_000)
sets_ = st.frozensets(ints, max_size=200)


def arr(s) -> np.ndarray:
    return np.array(sorted(s), dtype=np.int64)


@given(sets_)
@settings(max_examples=200, deadline=None)
def test_pack_unpack_roundtrip(s):
    w, base = B.pack(arr(s))
    assert np.array_equal(B.unpack(w, base), arr(s))
    assert B.cardinality(w) == len(s)


@given(sets_, sets_)
@settings(max_examples=200, deadline=None)
def test_algebra_matches_python_sets(sa, sb):
    wa, ba = B.pack(arr(sa))
    wb, bb = B.pack(arr(sb))
    iw, ib = B.intersect(wa, ba, wb, bb)
    assert set(B.unpack(iw, ib)) == (sa & sb)
    assert B.intersect_count(wa, ba, wb, bb) == len(sa & sb)
    uw, ub = B.union(wa, ba, wb, bb)
    assert set(B.unpack(uw, ub)) == (sa | sb)
    assert B.union_count(wa, ba, wb, bb) == len(sa | sb)
    dw, db = B.difference(wa, ba, wb, bb)
    assert set(B.unpack(dw, db)) == (sa - sb)
    assert B.equals(wa, ba, wb, bb) == (sa == sb)


@given(sets_, ints)
@settings(max_examples=200, deadline=None)
def test_contains_add_remove(s, x):
    w, base = B.pack(arr(s))
    assert B.contains(w, base, x) == (x in s)
    wa, ba = B.add(w, base, x)
    assert set(B.unpack(wa, ba)) == (s | {x})
    wr, br = B.remove(w, base, x)
    assert set(B.unpack(wr, br)) == (s - {x})


def test_set_range():
    for n in (0, 1, 63, 64, 65, 200):
        w, base = B.set_range(n)
        assert np.array_equal(B.unpack(w, base), np.arange(n, dtype=np.int64))


@given(
    st.lists(st.tuples(sets_, sets_), max_size=20),
)
@settings(max_examples=100, deadline=None)
def test_batch_intersect_count_matches_sorted_backend(pairs):
    rows_a = [arr(a) for a, _ in pairs]
    rows_b = [arr(b) for _, b in pairs]
    got = B.batch_intersect_count(rows_a, rows_b)
    _, want, _ = batch_intersect(rows_a, rows_b)
    assert np.array_equal(got, want)
    assert list(got) == [len(a & b) for a, b in pairs]


def test_word_boundary_bits():
    # values straddling uint64 word edges, shared-frame misalignment
    a = np.array([0, 63, 64, 127, 128, 191], dtype=np.int64)
    b = np.array([63, 64, 65, 128, 190, 191], dtype=np.int64)
    wa, ba = B.pack(a)
    wb, bb = B.pack(b)
    assert B.intersect_count(wa, ba, wb, bb) == 4  # {63, 64, 128, 191}
    # deliberately unaligned chunk bases
    wa2, ba2 = B.pack(a, lo=-3)
    wb2, bb2 = B.pack(b, lo=61)
    assert B.intersect_count(wa2, ba2, wb2, bb2) == 4


def test_triangles_bitmap_backend_equals_sorted(spark):
    from gms_spark.graph.build import build_undirected
    from gms_spark.graph.generators import rmat_el
    from gms_spark.graph.triangles import triangle_count_total

    und = build_undirected(rmat_el(spark, 10, 8)).persist()
    t_sorted = triangle_count_total(und, set_backend="sorted")
    t_bitmap = triangle_count_total(und, set_backend="bitmap")
    und.unpersist()
    assert t_bitmap == t_sorted > 0
