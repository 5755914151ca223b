"""Graph kernels on the GMS golden graphs vs numpy oracles.

Mirrors the reference's verifier strategy (SURVEY §5): every kernel
result is re-derived by an independent single-process oracle.
Fixtures are verbatim copies of /root/reference/testing/testGraphs/*.el
(data files, format gms/third_party/gapbs/reader.h:50-57).
"""

from __future__ import annotations

import numpy as np
import pytest

from gms_spark.graph.build import build_undirected
from gms_spark.graph.components import connected_components
from gms_spark.graph.labelprop import label_propagation
from gms_spark.graph.pagerank import pagerank
from gms_spark.graph.triangles import triangle_count_per_vertex, triangle_count_total

from .oracles import (
    components_oracle,
    labelprop_oracle,
    load_el,
    pagerank_oracle,
    triangle_total_oracle,
    triangle_vertex_oracle,
    undirect,
)

GRAPHS = ["micro.el", "triangles_1.el", "triangles_3.el", "smallRandom1.el", "eppsteinExample.el", "tomitaExample.el"]


@pytest.fixture(params=GRAPHS)
def graph(request, edges_df_factory):
    el = undirect(load_el(request.param))
    return request.param, el, edges_df_factory(el)


def test_build_undirected_squishes(edges_df_factory):
    el = load_el("triangles_3.el")
    df = build_undirected(edges_df_factory(el))
    got = np.array(sorted((r["src"], r["dst"]) for r in df.collect()))
    assert np.array_equal(got, undirect(el))


def test_pagerank_matches_oracle(graph):
    name, el, df = graph
    want = pagerank_oracle(el, tol=1e-10, max_iters=200)
    res = pagerank(df, tol=1e-10, max_iters=200, check_every=8)
    got = {r["vertex"]: r["score"] for r in res.scores.collect()}
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6, rel=1e-6), (name, v)


def test_pagerank_scores_sum_to_one(graph):
    _, _, df = graph
    res = pagerank(df, tol=1e-9, max_iters=200, check_every=8)
    total = sum(r["score"] for r in res.scores.collect())
    assert total == pytest.approx(1.0, abs=1e-6)


def test_components_match_oracle(graph):
    name, el, df = graph
    want = components_oracle(el)
    res = connected_components(df)
    got = {r["vertex"]: r["component"] for r in res.components.collect()}
    assert got == want, name


def test_labelprop_matches_oracle(graph):
    name, el, df = graph
    for iters in (1, 3, 5):
        want = labelprop_oracle(el, iters)
        got = {r["vertex"]: r["label"] for r in label_propagation(df, iters=iters).labels.collect()}
        assert got == want, (name, iters)


def test_triangles_total(graph):
    name, el, df = graph
    assert triangle_count_total(df) == triangle_total_oracle(el), name


def test_triangles_per_vertex(graph):
    name, el, df = graph
    want = triangle_vertex_oracle(el)
    got = {r["vertex"]: r["count"] for r in triangle_count_per_vertex(df).collect()}
    assert got == want, name


def test_known_invariants(edges_df_factory):
    # FIXTURES.md §2 spot values, recomputed here end-to-end.
    el = undirect(load_el("triangles_1.el"))
    assert triangle_count_total(edges_df_factory(el)) == 1
    el3 = undirect(load_el("triangles_3.el"))
    assert triangle_count_total(edges_df_factory(el3)) == 3
    micro = undirect(load_el("micro.el"))
    res = pagerank(edges_df_factory(micro), tol=1e-9)
    got = sorted(r["score"] for r in res.scores.collect())
    assert got == pytest.approx([0.5, 0.5], abs=1e-6)


def test_pagerank_weighted_matches_numpy(spark):
    """A `weight` column switches the transition to weight/out-strength
    (pagerank.py weighted path) — checked against a dense numpy power
    iteration on a hand graph with string vertex keys (the host-graph
    shape: pagerank_hosts driver query)."""
    hosts = ["a", "b", "c"]
    w = {("a", "b"): 3.0, ("a", "c"): 1.0, ("b", "a"): 1.0, ("c", "a"): 1.0, ("c", "b"): 1.0}
    df = spark.createDataFrame(
        [(s, d, x) for (s, d), x in w.items()], "src string, dst string, weight double"
    )
    iters, damping = 12, 0.85
    idx = {h: i for i, h in enumerate(hosts)}
    P = np.zeros((3, 3))
    for (s, d), x in w.items():
        P[idx[d], idx[s]] = x
    P /= P.sum(axis=0, keepdims=True)
    score = np.full(3, 1 / 3)
    for _ in range(iters):
        score = (1 - damping) / 3 + damping * (P @ score)
    res = pagerank(df, fixed_iters=iters)
    got = {r["vertex"]: r["score"] for r in res.scores.collect()}
    assert got.keys() == set(hosts)
    for h in hosts:
        assert got[h] == pytest.approx(score[idx[h]], abs=1e-12), h
    # and without the weight column the same edge LIST is plain pagerank
    res_u = pagerank(df.select("src", "dst"), fixed_iters=iters)
    got_u = {r["vertex"]: r["score"] for r in res_u.scores.collect()}
    assert got_u["b"] != pytest.approx(got["b"], abs=1e-9)


def test_pagerank_warm_start(spark):
    """Warm start (start_scores) reaches the SAME fixpoint as a cold run
    on the mutated graph — power iteration converges from any positive
    start — in strictly fewer supersteps when the edge delta is small
    (the evolving-crawl pattern: seed today's run from yesterday's
    scores)."""
    from gms_spark.io.readers import read_edge_list

    g = build_undirected(read_edge_list(spark, "tests/data/triangles_3.el").select("src", "dst"))
    # tol/check_every sized for suite wall time: identical for all three
    # runs, so the iteration-count comparison stays apples-to-apples
    kw = dict(tol=1e-7, max_iters=300, check_every=3)
    cold = pagerank(g, **kw)
    # small delta: one new intra-component edge (0-3 is absent)
    import pyspark.sql.functions as F

    extra = spark.createDataFrame([(0, 3), (3, 0)], "src long, dst long")
    g2 = g.select("src", "dst").unionAll(extra).distinct()
    cold2 = pagerank(g2, **kw)
    warm2 = pagerank(g2, start_scores=cold.scores, **kw)
    got_c = {r["vertex"]: r["score"] for r in cold2.scores.collect()}
    got_w = {r["vertex"]: r["score"] for r in warm2.scores.collect()}
    assert got_w.keys() == got_c.keys()
    for v in got_c:
        assert got_w[v] == pytest.approx(got_c[v], abs=1e-5), v
    assert warm2.iterations < cold2.iterations, (warm2.iterations, cold2.iterations)


def test_components_warm_start(spark):
    """start_labels on a GROWN graph: correct new fixpoint (merged
    components get the merged min), and an unchanged-component delta
    converges in strictly fewer rounds than a cold run."""
    # two 8-vertex paths: 0-1-...-7 and 100-101-...-107 (short chains —
    # every extra diameter unit costs a whole Spark job per CC run here)
    chain = [(i, i + 1) for i in range(7)] + [(100 + i, 101 + i) for i in range(7)]
    e = spark.createDataFrame(chain, "src long, dst long")
    g = build_undirected(e)
    base = connected_components(g)  # default chunking: fewest jobs
    labels = {r["vertex"]: r["component"] for r in base.components.collect()}
    assert set(labels.values()) == {0, 100}

    # delta 1: intra-component edge (0,11) — labels unchanged, warm run
    # must detect the fixpoint almost immediately
    g2 = build_undirected(e.unionAll(spark.createDataFrame([(0, 7)], "src long, dst long")))
    # same chunk granularity on both sides keeps the round comparison fair
    cold2 = connected_components(g2, check_every=2)
    warm2 = connected_components(g2, check_every=2, start_labels=base.components)
    got_c = {r["vertex"]: r["component"] for r in cold2.components.collect()}
    got_w = {r["vertex"]: r["component"] for r in warm2.components.collect()}
    assert got_w == got_c
    assert warm2.iterations < cold2.iterations, (warm2.iterations, cold2.iterations)

    # delta 2: merge the two components — warm still reaches the merged min
    g3 = build_undirected(e.unionAll(spark.createDataFrame([(7, 100)], "src long, dst long")))
    warm3 = connected_components(g3, start_labels=base.components)
    got3 = {r["vertex"]: r["component"] for r in warm3.components.collect()}
    assert set(got3.values()) == {0} and len(got3) == 16


def test_pagerank_warm_start_redistribute_fixed_iters(spark):
    """start_scores + dangling='redistribute' + fixed_iters must follow
    TRUE power iteration from the seed: dmass_0 is measured over the
    seed scores, not assumed uniform (n_dangling/n). Verified step-for-
    step against a numpy oracle on a directed graph with a dangling
    vertex and a deliberately skewed seed."""
    import pyspark.sql.functions as F

    # directed: 3 is dangling (no out-edges)
    el = [(0, 1), (0, 2), (1, 2), (2, 3), (1, 3)]
    n, d, iters = 4, 0.85, 3
    edges = spark.createDataFrame(el, "src long, dst long")
    seed = [0.4, 0.3, 0.2, 0.1]  # non-uniform on purpose
    seed_df = spark.createDataFrame(list(enumerate(seed)), "vertex long, score double")

    # numpy power iteration with dangling redistribution from the seed
    import numpy as np

    outdeg = np.zeros(n)
    for s, _ in el:
        outdeg[s] += 1
    x = np.array(seed)
    for _ in range(iters):
        dmass = x[outdeg == 0].sum()
        nxt = np.full(n, (1 - d) / n + d * dmass / n)
        for s, t in el:
            nxt[t] += d * x[s] / outdeg[s]
        x = nxt

    res = pagerank(
        edges, fixed_iters=iters, dangling="redistribute", start_scores=seed_df
    )
    got = {r["vertex"]: r["score"] for r in res.scores.collect()}
    for v in range(n):
        assert got[v] == pytest.approx(x[v], abs=1e-12), v
