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
