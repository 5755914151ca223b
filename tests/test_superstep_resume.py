"""Checkpoint/lineage/resume tests (BASELINE.md 'Resumability')."""

from __future__ import annotations

import pytest

from gms_spark.graph.build import build_undirected
from gms_spark.graph.pagerank import pagerank
from gms_spark.io.tableio import TableIO
from gms_spark.runtime.superstep import iterate

from .oracles import load_el, undirect


@pytest.fixture(scope="module")
def graph_df(spark):
    el = load_el("smallRandom1.el")
    df = spark.createDataFrame([(int(u), int(v)) for u, v in el], "src long, dst long")
    return build_undirected(df).persist()


#: resume coverage is about the checkpoint/lineage machinery, not
#: convergence depth — a looser tol keeps the superstep count (and the
#: per-superstep parquet commits) small while exercising every path.
TOL = 1e-3


@pytest.fixture(scope="module")
def clean_scores(graph_df):
    """One clean (non-durable) pagerank run shared by the comparisons."""
    res = pagerank(graph_df, tol=TOL, max_iters=50)
    return res, {r["vertex"]: r["score"] for r in res.scores.collect()}


def test_tableio_atomic_snapshots(spark, tmp_path):
    io = TableIO(str(tmp_path))
    df = spark.range(10).selectExpr("id as vertex", "cast(id as double) as score")
    io.write(df, "t", 0)
    io.write(df.selectExpr("vertex", "score * 2 as score"), "t", 1)
    assert io.snapshots("t") == [0, 1]
    assert io.read(spark, "t").agg({"score": "sum"}).first()[0] == 90.0
    assert io.read(spark, "t", 0).agg({"score": "sum"}).first()[0] == 45.0


def test_pagerank_checkpointed_equals_uncheckpointed(spark, graph_df, clean_scores, tmp_path):
    io = TableIO(str(tmp_path))
    a, sa = clean_scores
    b = pagerank(graph_df, tol=TOL, max_iters=50, io=io, run_id="ckpt1")
    sb = {r["vertex"]: r["score"] for r in b.scores.collect()}
    assert sa.keys() == sb.keys()
    for v in sa:
        assert sa[v] == pytest.approx(sb[v], abs=1e-12)
    assert a.iterations == b.iterations


def test_kill_and_resume_identical(spark, graph_df, clean_scores, tmp_path):
    """Kill after superstep k → relaunch resumes and matches a clean run."""
    io = TableIO(str(tmp_path))
    _, sf = clean_scores

    # "killed" run: budget of 3 supersteps, then a fresh process resumes
    partial = pagerank(graph_df, tol=TOL, max_iters=3, io=io, run_id="resume1")
    assert partial.iterations == 3
    assert io.last_committed("pagerank_state_resume1") == 2

    resumed = pagerank(graph_df, tol=TOL, max_iters=50, io=io, run_id="resume1")
    sr = {r["vertex"]: r["score"] for r in resumed.scores.collect()}
    for v in sf:
        assert sr[v] == pytest.approx(sf[v], abs=1e-12)

    # lineage: gap-free, no duplicate (iteration, partition) rows
    rows = [r for r in io.lineage_rows() if r["run_id"] == "resume1"]
    iters = sorted({r["iteration"] for r in rows})
    assert iters == list(range(resumed.iterations))
    seen = set()
    for r in rows:
        key = (r["iteration"], r["partition_id"])
        assert key not in seen
        seen.add(key)


def test_resume_skips_completed_run(spark, graph_df, tmp_path):
    io = TableIO(str(tmp_path))
    first = pagerank(graph_df, tol=TOL, max_iters=50, io=io, run_id="done1")
    n_lineage = len(io.lineage_rows())
    again = pagerank(graph_df, tol=TOL, max_iters=50, io=io, run_id="done1")
    assert len(io.lineage_rows()) == n_lineage  # nothing recomputed
    sa = {r["vertex"]: r["score"] for r in first.scores.collect()}
    sb = {r["vertex"]: r["score"] for r in again.scores.collect()}
    assert sa == sb
