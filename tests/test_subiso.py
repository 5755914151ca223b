"""Subgraph-isomorphism tests vs a brute-force python oracle."""

from __future__ import annotations

from itertools import permutations

import pytest

from gms_spark.graph.subiso import first_embedding, subgraph_count, subgraph_match

from .oracles import load_el, neighbors, undirect

PATTERNS = {
    "edge": [(0, 1)],
    "path3": [(0, 1), (1, 2)],
    "triangle": [(0, 1), (1, 2), (0, 2)],
    "star3": [(0, 1), (0, 2), (0, 3)],
    "tailed_triangle": [(0, 1), (1, 2), (0, 2), (2, 3)],
    "square": [(0, 1), (1, 2), (2, 3), (3, 0)],
}


def brute_count(el, pattern):
    adj = {u: set(v.tolist()) for u, v in neighbors(el).items()}
    pverts = sorted({v for e in pattern for v in e})
    total = 0
    for perm in permutations(adj, len(pverts)):
        m = dict(zip(pverts, perm))
        if all(m[b] in adj[m[a]] for a, b in pattern):
            total += 1
    return total


@pytest.fixture(scope="module")
def graph(spark):
    el = undirect(load_el("smallRandom1.el"))
    df = spark.createDataFrame([(int(u), int(v)) for u, v in el], "src long, dst long")
    return el, df


@pytest.mark.parametrize("name", sorted(PATTERNS))
def test_counts_match_brute_force(name, graph):
    el, df = graph
    assert subgraph_count(df, PATTERNS[name]) == brute_count(el, PATTERNS[name]), name


def test_embeddings_are_valid(graph):
    el, df = graph
    adj = {u: set(v.tolist()) for u, v in neighbors(el).items()}
    pattern = PATTERNS["tailed_triangle"]
    rows = subgraph_match(df, pattern).collect()
    for r in rows:
        m = {i: r[f"p{i}"] for i in range(4)}
        assert len(set(m.values())) == 4  # injective
        for a, b in pattern:
            assert m[b] in adj[m[a]]


def test_first_embedding(graph):
    _, df = graph
    assert first_embedding(df, PATTERNS["triangle"]) is not None
    # a 5-clique pattern does not exist in smallRandom1 if brute says so
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    el, _ = graph
    assert (first_embedding(df, k5) is not None) == (brute_count(el, k5) > 0)
