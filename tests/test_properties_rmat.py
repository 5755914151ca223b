"""Property tests on seeded R-MAT / uniform graphs (SURVEY §5e)."""

from __future__ import annotations

import numpy as np
import pytest

from gms_spark.graph.build import build_undirected
from gms_spark.graph.components import connected_components
from gms_spark.graph.generators import insert_weights, rmat_el, uniform_el
from gms_spark.graph.pagerank import pagerank
from gms_spark.graph.triangles import triangle_count_total

from .oracles import components_oracle, pagerank_oracle, triangle_total_oracle


@pytest.fixture(scope="module")
def rmat(spark):
    df = rmat_el(spark, scale=7, deg=4, seed=7)
    el = np.array([(r["src"], r["dst"]) for r in df.collect()], dtype=np.int64)
    und = build_undirected(df).persist()
    return el, und


def test_generators_deterministic_across_partitionings(spark):
    a = sorted((r["src"], r["dst"]) for r in rmat_el(spark, 6, 4, partitions=2).collect())
    b = sorted((r["src"], r["dst"]) for r in rmat_el(spark, 6, 4, partitions=13).collect())
    assert a == b
    u1 = sorted((r["src"], r["dst"]) for r in uniform_el(spark, 6, 4, partitions=3).collect())
    u2 = sorted((r["src"], r["dst"]) for r in uniform_el(spark, 6, 4, partitions=9).collect())
    assert u1 == u2


def test_rmat_is_skewed(rmat):
    el, _ = rmat
    deg = np.bincount(np.concatenate([el[:, 0], el[:, 1]]))
    assert deg.max() >= 8 * max(1, int(np.median(deg[deg > 0])))  # heavy tail


def test_pagerank_sums_to_one_and_matches_oracle(rmat):
    el, und = rmat
    from .oracles import undirect

    uel = undirect(el)
    res = pagerank(und, tol=1e-9, max_iters=200, check_every=5)
    got = {r["vertex"]: r["score"] for r in res.scores.collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    want = pagerank_oracle(uel, tol=1e-9, max_iters=200)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_components_match_union_find(rmat):
    el, und = rmat
    from .oracles import undirect

    want = components_oracle(undirect(el))
    got = {r["vertex"]: r["component"] for r in connected_components(und).components.collect()}
    assert got == want


def test_triangles_match_recount(rmat):
    el, und = rmat
    assert triangle_count_total(und) == triangle_total_oracle(el)


def test_weights_deterministic(spark):
    df = insert_weights(rmat_el(spark, 5, 4))
    w1 = sorted((r["src"], r["dst"], r["weight"]) for r in df.collect())
    w2 = sorted((r["src"], r["dst"], r["weight"]) for r in insert_weights(rmat_el(spark, 5, 4)).collect())
    assert w1 == w2
    assert all(1 <= w <= 255 for _, _, w in w1)
