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


def test_batch_intersect_matches_per_row():
    import numpy as np

    from gms_spark.graph.setops import batch_intersect

    rng = np.random.default_rng(7)
    rows_a, rows_b = [], []
    for _ in range(200):
        rows_a.append(np.unique(rng.integers(0, 60, size=rng.integers(0, 12))))
        rows_b.append(np.unique(rng.integers(0, 60, size=rng.integers(0, 12))))
    vals, counts, rows = batch_intersect(rows_a, rows_b)
    off = 0
    for i, (a, b) in enumerate(zip(rows_a, rows_b)):
        want = np.intersect1d(a, b, assume_unique=True)
        assert counts[i] == len(want)
        got = vals[off : off + counts[i]]
        assert np.array_equal(got, want), i
        assert np.all(rows[off : off + counts[i]] == i)
        off += counts[i]
    assert off == len(vals)


def test_set_contract_add_remove_range_equals():
    import numpy as np

    from gms_spark.graph.setops import add, equals, remove, set_range

    a = np.array([1, 3, 7], dtype=np.int64)
    assert np.array_equal(add(a, 5), [1, 3, 5, 7])
    assert np.array_equal(add(a, 3), a)  # idempotent
    assert np.array_equal(remove(a, 3), [1, 7])
    assert np.array_equal(remove(a, 4), a)
    assert np.array_equal(set_range(4), [0, 1, 2, 3])
    assert equals(a, np.array([1, 3, 7]))
    assert not equals(a, np.array([1, 3]))
    assert not equals(a, np.array([1, 3, 8]))
