"""Brandes betweenness tests vs an independent python implementation."""

from __future__ import annotations

from collections import deque

import pytest

from gms_spark.graph.betweenness import betweenness_centrality

from .oracles import load_el, neighbors, undirect


def brandes_oracle(el):
    adj = {u: [int(x) for x in v] for u, v in neighbors(el).items()}
    bc = {v: 0.0 for v in adj}
    for s in adj:
        # forward BFS
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0.0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        # backward accumulation
        delta = {v: 0.0 for v in dist}
        for w in reversed(order):
            for u in adj[w]:
                if dist.get(u, -2) == dist[w] - 1:
                    delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: x / 2.0 for v, x in bc.items()}  # undirected convention


@pytest.mark.parametrize("name", ["triangles_3.el", "smallRandom1.el", "eppsteinExample.el"])
def test_bc_exact(name, edges_df_factory):
    el = undirect(load_el(name))
    want = brandes_oracle(el)
    got = {r["vertex"]: r["bc"] for r in betweenness_centrality(edges_df_factory(el)).collect()}
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), (name, v)


def test_bc_sampled_scales(edges_df_factory):
    el = undirect(load_el("smallRandom1.el"))
    df = edges_df_factory(el)
    exact = {r["vertex"]: r["bc"] for r in betweenness_centrality(df).collect()}
    approx = {r["vertex"]: r["bc"] for r in betweenness_centrality(df, sources=list(range(5))).collect()}
    assert approx.keys() == exact.keys()
    assert sum(approx.values()) == pytest.approx(
        2 * sum(exact.values()), rel=1.0
    )  # same order of magnitude (loose sanity, 5/10 sources scaled 2x)


def test_waved_sources_identical_to_single_wave(edges_df_factory):
    """bc is a sum over sources — wave partitioning must not change it.

    A fixed 11-source sample keeps the Brandes-dependency cost down; the
    invariance under test (per-source waves sum to the single-wave total)
    is per-source, so the sample loses no coverage vs all-sources runs.
    """
    from .oracles import load_el

    el = undirect(load_el("smallRandom1.el"))
    df = edges_df_factory(el)
    srcs = sorted({int(u) for u, _ in el})[::5][:11]
    one = {r["vertex"]: r["bc"] for r in betweenness_centrality(df, sources=srcs, wave_size=None).collect()}
    waved = {r["vertex"]: r["bc"] for r in betweenness_centrality(df, sources=srcs, wave_size=3).collect()}
    assert set(one) == set(waved)
    for v in one:
        assert abs(one[v] - waved[v]) < 1e-9
