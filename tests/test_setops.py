"""Set-kernel unit tests vs Python set semantics (mirrors testing/sets.cpp)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gms_spark.graph import setops

sets = st.lists(st.integers(0, 200), max_size=80).map(
    lambda xs: np.unique(np.array(xs, dtype=np.int64))
)


@given(sets, sets)
@settings(max_examples=200, deadline=None)
def test_algebra_matches_python_sets(a, b):
    sa, sb = set(a.tolist()), set(b.tolist())
    assert set(setops.intersect(a, b).tolist()) == sa & sb
    assert setops.intersect_count(a, b) == len(sa & sb)
    assert set(setops.union(a, b).tolist()) == sa | sb
    assert setops.union_count(a, b) == len(sa | sb)
    assert set(setops.difference(a, b).tolist()) == sa - sb


@given(sets, st.integers(0, 200))
@settings(max_examples=100, deadline=None)
def test_contains(a, x):
    assert setops.contains(a, x) == (x in set(a.tolist()))
