"""CSR-block PageRank equivalence tests (the measured alternative)."""

from __future__ import annotations

import pytest

from gms_spark.graph.pagerank import pagerank
from gms_spark.graph.pagerank_csr import pagerank_csr

from .oracles import load_el, pagerank_oracle, undirect


@pytest.fixture(scope="module")
def graph(spark):
    el = undirect(load_el("smallRandom1.el"))
    return el, spark.createDataFrame([(int(u), int(v)) for u, v in el], "src long, dst long")


def test_csr_equals_join_formulation(graph):
    el, df = graph
    a = {r["vertex"]: r["score"] for r in pagerank(df, fixed_iters=10).scores.collect()}
    b = {r["vertex"]: r["score"] for r in pagerank_csr(df, fixed_iters=10, num_blocks=4).scores.collect()}
    assert a.keys() == b.keys()
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_csr_matches_oracle_converged(graph):
    el, df = graph
    want = pagerank_oracle(el, tol=1e-9, max_iters=150)
    res = pagerank_csr(df, tol=1e-7, max_iters=150)  # oracle at 1e-9; 1e-7 keeps |got-want| ~1e-7 << the 1e-6 gate
    got = {r["vertex"]: r["score"] for r in res.scores.collect()}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
