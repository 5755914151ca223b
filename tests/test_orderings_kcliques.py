"""Orderings + k-clique listing tests vs python oracles."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest

from gms_spark.graph.kclique import kclique_count, kclique_list, kclique_star_list
from gms_spark.graph.orderings import adg_order, degree_order, identity_order, random_order, triangle_count_order

from .oracles import load_el, neighbors, undirect


def brute_kcliques(el, k):
    adj = {u: set(v.tolist()) for u, v in neighbors(el).items()}
    out = []
    for combo in combinations(sorted(adj), k):
        if all(b in adj[a] for a, b in combinations(combo, 2)):
            out.append(combo)
    return out


def matula_degeneracy(el):
    """Exact degeneracy via min-degree peel (degeneracy_matula.h:13-66)."""
    adj = {u: set(v.tolist()) for u, v in neighbors(el).items()}
    deg = {u: len(v) for u, v in adj.items()}
    alive = set(adj)
    k = 0
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        alive.discard(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
    return k


@pytest.fixture(scope="module")
def graph(spark):
    el = undirect(load_el("smallRandom1.el"))
    df = spark.createDataFrame([(int(u), int(v)) for u, v in el], "src long, dst long")
    return el, df


@pytest.mark.parametrize("k", [3, 4, 5])
def test_kclique_count_and_list(k, graph):
    el, df = graph
    want = brute_kcliques(el, k)
    assert kclique_count(df, k) == len(want)
    got = sorted(tuple(r["members"]) for r in kclique_list(df, k).collect())
    assert got == sorted(want)


def test_kclique_star(graph):
    el, df = graph
    adj = {u: set(v.tolist()) for u, v in neighbors(el).items()}
    rows = kclique_star_list(df, 3).collect()
    got = {tuple(r["members"]): sorted(r["star"]) for r in rows}
    want = {}
    for c in brute_kcliques(el, 3):
        common = set.intersection(*(adj[v] for v in c)) - set(c)
        want[c] = sorted(common)
    assert got == want


def test_order_formats(graph):
    el, df = graph
    n = len(neighbors(el))
    for order_df in (identity_order(df), random_order(df), degree_order(df), triangle_count_order(df)):
        rows = order_df.collect()
        assert sorted(r["vertex"] for r in rows) == sorted(neighbors(el))
        ranks = sorted(r["rank"] for r in rows)
        if order_df is not identity_order:  # identity rank==vertex may be sparse
            pass
    # degree order: rank increases with (degree, id)
    adj = neighbors(el)
    got = {r["vertex"]: r["rank"] for r in degree_order(df).collect()}
    ordered = sorted(adj, key=lambda v: (len(adj[v]), v))
    assert [got[v] for v in ordered] == list(range(len(ordered)))


def test_adg_order_valid_degeneracy_approx(graph):
    """ADG (2+eps)-approximation: max later-ranked neighbors ≤ (2+2eps)·d(G).

    The validity property of gms/algorithms/preprocessing/verifiers/
    degeneracy_verifier.h:38-110, with the exact degeneracy from the
    Matula peel oracle.
    """
    el, df = graph
    eps = 0.1
    d_exact = matula_degeneracy(el)
    rank = {r["vertex"]: r["rank"] for r in adg_order(df, eps=eps).collect()}
    adj = neighbors(el)
    assert sorted(rank) == sorted(adj)
    worst = max(sum(1 for u in nbrs if rank[int(u)] > rank[v]) for v, nbrs in adj.items())
    assert worst <= (2 + 2 * eps) * d_exact + 1e-9


def test_kclique_adg_order_same_counts(spark, edges_df_factory):
    """ADG-oriented counting gives the same totals as degree-oriented
    (the ordering is a performance knob, never a semantics knob)."""
    from .oracles import load_el, undirect

    from gms_spark.graph.kclique import kclique_count

    el = undirect(load_el("smallRandom1.el"))
    df = edges_df_factory(el).persist()
    for k in (3, 4):
        assert kclique_count(df, k, order="adg") == kclique_count(df, k, order="degree")


def test_degeneracy_order_exact(graph):
    """Exact Matula parity: core numbers, degeneracy, forward-degree bound.

    The batch peel must reproduce the SEQUENTIAL peel's core numbers
    exactly (degeneracy_matula.h:13-66 semantics), max(core) must equal
    the graph degeneracy, and every vertex's later-ranked neighbor count
    must be ≤ its core (the exact bound, tighter than ADG's (2+2eps)·d).
    """
    from gms_spark.graph.orderings import degeneracy_order

    el, df = graph
    adj = neighbors(el)
    # sequential peel oracle with per-vertex core numbers
    deg = {u: len(v) for u, v in adj.items()}
    alive = set(adj)
    k = 0
    core = {}
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        alive.discard(v)
        for u in adj[v]:
            if int(u) in alive:
                deg[int(u)] -= 1
    rows = degeneracy_order(df).collect()
    got_core = {r["vertex"]: r["core"] for r in rows}
    rank = {r["vertex"]: r["rank"] for r in rows}
    assert got_core == core
    assert max(got_core.values()) == matula_degeneracy(el)
    assert sorted(rank.values()) == list(range(len(adj)))
    for v, nbrs in adj.items():
        fwd = sum(1 for u in nbrs if rank[int(u)] > rank[v])
        assert fwd <= got_core[v], (v, fwd, got_core[v])


def test_coreness_hindex_matches_peel(graph):
    """Cross-algorithm identity: the H-index fixpoint (the scale path
    behind the coreness query) must equal the Matula batch peel's core
    numbers vertex-for-vertex."""
    from gms_spark.graph.orderings import coreness_hindex, degeneracy_order

    el, df = graph
    want = {r["vertex"]: r["core"] for r in degeneracy_order(df).collect()}
    got = {r["vertex"]: r["core"] for r in coreness_hindex(df).collect()}
    assert got == want


def test_coreness_hindex_rounds_rmat(spark):
    """Round-count scaling: on a skewed R-MAT graph the H-index fixpoint
    must converge in rounds ≪ n (the Matula peel pays #levels × cascade
    depth; the fixpoint depth is what makes coreness web-scale)."""
    from gms_spark.graph.build import build_undirected
    from gms_spark.graph.generators import rmat_el
    from gms_spark.graph.orderings import coreness_hindex

    und = build_undirected(rmat_el(spark, scale=11, deg=8, seed=3)).persist()
    n = und.select("src").distinct().count()
    cores, rounds = coreness_hindex(und, return_rounds=True)
    assert rounds * 20 < n, (rounds, n)  # ≪ n: tens of rounds on ~2k vertices
    assert cores.count() == n
    und.unpersist()


def test_matula_peel_round_contract_rmat(spark):
    """The exact peel's SCALE CONTRACT (orderings.degeneracy_order
    docstring): one superstep per cascade round, round count grows with
    graph size (measured 96 @ scale 12, 178 @ scale 14) — guard the
    scale-10 round count so a refactor can't silently add rounds, and
    check the batched peel-flush reproduces exact core numbers."""
    from gms_spark.graph.build import build_undirected
    from gms_spark.graph.generators import rmat_el
    from gms_spark.graph.orderings import degeneracy_order

    und = build_undirected(rmat_el(spark, scale=9, deg=8, seed=3)).persist()
    res, rounds = degeneracy_order(und, return_rounds=True)
    assert rounds <= 55, rounds  # measured 46 @ scale 9 (62 @ 10, 96 @ 12)
    # exactness vs the sequential peel oracle (cross-ALGORITHM identity
    # with coreness_hindex is test_coreness_hindex_matches_peel's job —
    # no need to run a second distributed kernel here)
    el = np.array([(r["src"], r["dst"]) for r in und.collect()], dtype=np.int64)
    adj = neighbors(el)
    deg = {u: len(v) for u, v in adj.items()}
    alive, k, want = set(adj), 0, {}
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        want[v] = k
        alive.discard(v)
        for u in adj[v]:
            if int(u) in alive:
                deg[int(u)] -= 1
    got = {r["vertex"]: r["core"] for r in res.collect()}
    assert got == want
    und.unpersist()


def test_mining_degeneracy_order_same_counts(spark, edges_df_factory):
    """order='degeneracy' is a performance knob: identical counts/cliques."""
    from gms_spark.graph.mce import maximal_cliques

    el = undirect(load_el("smallRandom1.el"))
    df = edges_df_factory(el).persist()
    assert kclique_count(df, 4, order="degeneracy") == kclique_count(df, 4, order="degree")
    a = sorted(tuple(r["clique"]) for r in maximal_cliques(df, order="degeneracy").collect())
    b = sorted(tuple(r["clique"]) for r in maximal_cliques(df, order="degree").collect())
    assert a == b
