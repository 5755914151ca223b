"""Vertex similarity + link prediction tests vs numpy oracles."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gms_spark.graph.lp_eval import evaluate_link_prediction, split_edges
from gms_spark.graph.similarity import link_prediction_topq, vertex_similarity

from .oracles import load_el, neighbors, undirect


@pytest.fixture(scope="module")
def graph(spark):
    el = undirect(load_el("smallRandom1.el"))
    df = spark.createDataFrame([(int(u), int(v)) for u, v in el], "src long, dst long")
    return el, df


def test_vertex_similarity_metrics(graph):
    el, df = graph
    adj = neighbors(el)
    got = {(r["a"], r["b"]): r for r in vertex_similarity(df).collect()}
    for (a, b), r in got.items():
        A, B = set(adj[a].tolist()), set(adj[b].tolist())
        c = len(A & B)
        assert r["common_neighbors"] == c
        # the GMS quirk: c / (|A| + |B| + c) — vertex_similarity.h:35
        assert r["jaccard_gms"] == pytest.approx(round(c / (len(A) + len(B) + c), 6), abs=1e-9)
        assert r["jaccard_textbook"] == pytest.approx(round(c / len(A | B), 6), abs=1e-9)
        assert r["overlap"] == pytest.approx(round(c / min(len(A), len(B)), 6), abs=1e-9)
        aa = sum(1.0 / math.log(len(adj[w])) for w in A & B)
        ra = sum(1.0 / len(adj[w]) for w in A & B)
        assert r["adamic_adar"] == pytest.approx(round(aa, 6), abs=1e-6)
        assert r["resource_alloc"] == pytest.approx(round(ra, 6), abs=1e-6)
        assert r["total_neighbors"] == len(A | B)
        assert r["pref_attachment"] == len(A) * len(B)


def test_link_prediction_topq_properties(graph):
    el, df = graph
    adj = neighbors(el)
    rows = link_prediction_topq(df, q=10).collect()
    assert len(rows) <= 10
    edge_set = {(int(u), int(v)) for u, v in el}
    for r in rows:
        assert (r["a"], r["b"]) not in edge_set  # non-edges only
        assert r["a"] < r["b"]
        assert len(set(adj[r["a"]].tolist()) & set(adj[r["b"]].tolist())) > 0  # 2-hop
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_split_deterministic_and_disjoint(graph):
    _, df = graph
    tr1, te1 = split_edges(df, 0.3)
    tr2, te2 = split_edges(df, 0.3)
    t1 = {(r["src"], r["dst"]) for r in tr1.collect()}
    t2 = {(r["src"], r["dst"]) for r in tr2.collect()}
    s1 = {(r["src"], r["dst"]) for r in te1.collect()}
    assert t1 == t2
    assert not (t1 & s1)
    half = {(r["src"], r["dst"]) for r in df.where("src < dst").collect()}
    assert t1 | s1 == half


def test_lp_evaluation_runs(graph):
    _, df = graph
    res = evaluate_link_prediction(df, q=10, test_frac=0.3)
    assert 0.0 <= res.precision_at_q <= 1.0
    assert 0.0 <= res.auc <= 1.0
    assert res.n_test > 0


def test_edge_sampler_reference_semantics(edges_df_factory):
    """Exact parity with a python replica of edge_sampler.h:24-155."""
    import numpy as np

    from gms_spark.graph.lp_sampler import DRAW_A, DRAW_B, P31, sample_complement_edges, sample_edges

    from .oracles import load_el, undirect

    el = undirect(load_el("smallRandom1.el"))
    df = edges_df_factory(el).persist()
    adj = {}
    for s, d in el:
        adj.setdefault(int(s), set()).add(int(d))
    verts = sorted(adj)
    n = len(verts)
    neigh = {v: sorted(adj[v]) for v in verts}

    def draws(k, seed, total):
        return [((i * DRAW_A + seed * DRAW_B + 7) % P31) % total for i in range(k)]

    # positives: cumulative degree in id order, slot -> sorted-neighbor index
    want_pos = []
    cum = np.cumsum([len(neigh[v]) for v in verts])
    total_e = int(cum[-1])
    for i, t in enumerate(draws(25, 29, total_e)):
        u_idx = int(np.searchsorted(cum, t, side="right"))
        u = verts[u_idx]
        off = t - (cum[u_idx - 1] if u_idx else 0)
        v = neigh[u][off]
        want_pos.append((i, min(u, v), max(u, v)))
    got_pos = sorted((r["draw"], r["a"], r["b"]) for r in sample_edges(df, 25, seed=29).collect())
    assert got_pos == sorted(want_pos)

    # negatives: weight n - deg(u); reference skip loop over sorted neigh
    want_neg = []
    cumc = np.cumsum([n - len(neigh[v]) for v in verts])
    total_c = int(cumc[-1])
    for i, t in enumerate(draws(25, 31, total_c)):
        u_idx = int(np.searchsorted(cumc, t, side="right"))
        u = verts[u_idx]
        v = t - (cumc[u_idx - 1] if u_idx else 0)
        for nb in neigh[u]:
            if nb <= v:
                v += 1
            else:
                break
        assert v not in adj[u]  # true complement member (may equal u)
        want_neg.append((i, min(u, v), max(u, v)))
    got_neg = sorted((r["draw"], r["a"], r["b"]) for r in sample_complement_edges(df, 25, seed=31).collect())
    assert got_neg == sorted(want_neg)


def test_rank_auc_equals_pairwise(spark):
    """_rank_auc == the brute pairwise tie-averaged AUC, ties included."""
    from gms_spark.graph.lp_eval import _rank_auc

    pos = [0.9, 0.5, 0.5, 0.2]
    neg = [0.5, 0.3, 0.2, 0.1, 0.0]
    rows = [(float(s), 1) for s in pos] + [(float(s), 0) for s in neg]
    df = spark.createDataFrame(rows, "s double, is_pos int")
    brute = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert abs(_rank_auc(df) - brute) < 1e-12


def test_add_false_links_mutation(spark, edges_df_factory):
    """Mutation mode (evaluation.h:176-200): edge count preserved (swap
    semantics), added pairs are genuine non-edges, removed pairs are
    gone, test positives never injected, deterministic given the seed."""
    from pyspark.sql import functions as F

    from gms_spark.graph.build import build_undirected
    from gms_spark.graph.lp_eval import add_false_links, split_edges

    from .oracles import load_el, undirect

    el = undirect(load_el("smallRandom1.el"))
    und = build_undirected(edges_df_factory(el)).localCheckpoint(eager=True)
    train_half, test_half = split_edges(und)
    train = build_undirected(train_half).localCheckpoint(eager=True)

    k = 5
    mut = add_false_links(train, k, test=test_half).localCheckpoint(eager=True)
    n0 = train.where(F.col("src") < F.col("dst")).count()
    n1 = mut.where(F.col("src") < F.col("dst")).count()
    assert n1 == n0  # k removed, k added

    orig = {(r["src"], r["dst"]) for r in train.where(F.col("src") < F.col("dst")).collect()}
    new = {(r["src"], r["dst"]) for r in mut.where(F.col("src") < F.col("dst")).collect()}
    added = new - orig
    removed = orig - new
    assert len(added) == k and len(removed) == k
    test_set = {(r["src"], r["dst"]) for r in test_half.collect()}
    assert not (added & test_set)  # hidden positives never injected

    mut2 = add_false_links(train, k, test=test_half)
    new2 = {(r["src"], r["dst"]) for r in mut2.where(F.col("src") < F.col("dst")).collect()}
    assert new2 == new  # deterministic


def test_pair_mix_int64_safe_for_huge_ids(spark):
    """The LCG pair mix must match pure-Python bignum arithmetic even for
    vertex ids far beyond 2^46 — the point where the old un-reduced
    b*ARITH_C term silently wrapped int64 in Spark (and errored in a
    DuckDB oracle). Both operands are now pre-reduced mod P."""
    from gms_spark.graph.coloring import ARITH_A, ARITH_B, ARITH_C, ARITH_P
    from gms_spark.graph.lp_eval import _pair_mix

    seed = 7
    pairs = [(3, 5), (2**50, 2**55), (2**62, 2**62 + 12345), (ARITH_P - 1, 2**63 - 1)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r["a"], r["b"]): r["m"]
        for r in df.select("a", "b", _pair_mix("a", "b", seed).alias("m")).collect()
    }
    salt = seed * ARITH_B % ARITH_P
    for a, b in pairs:
        want = ((a % ARITH_P) * ARITH_A + (b % ARITH_P) * ARITH_C + salt) % ARITH_P
        assert got[(a, b)] == want, (a, b)
