"""Edge-list reader tests (formats per gms/third_party/gapbs/reader.h)."""

from __future__ import annotations

import pytest

from gms_spark.io.readers import read_edge_list


def collect(df):
    return sorted((r["src"], r["dst"]) for r in df.collect())


def test_el(spark, tmp_path):
    p = tmp_path / "g.el"
    p.write_text("0 1\n1 2\n# comment\n\n2 0\n")
    assert collect(read_edge_list(spark, str(p))) == [(0, 1), (1, 2), (2, 0)]


def test_wel(spark, tmp_path):
    p = tmp_path / "g.wel"
    p.write_text("0 1 2.5\n1 2 1.0\n")
    rows = sorted((r["src"], r["dst"], r["weight"]) for r in read_edge_list(spark, str(p)).collect())
    assert rows == [(0, 1, 2.5), (1, 2, 1.0)]


def test_gr_dimacs(spark, tmp_path):
    p = tmp_path / "g.gr"
    p.write_text("c comment\np sp 3 2\na 1 2 7\na 2 3 4\n")
    rows = sorted((r["src"], r["dst"], r["weight"]) for r in read_edge_list(spark, str(p)).collect())
    assert rows == [(0, 1, 7.0), (1, 2, 4.0)]  # 1-based -> 0-based


def test_mtx_general_and_symmetric(spark, tmp_path):
    g = tmp_path / "g.mtx"
    g.write_text("%%MatrixMarket matrix coordinate pattern general\n3 3 2\n1 2\n2 3\n")
    assert collect(read_edge_list(spark, str(g))) == [(0, 1), (1, 2)]
    s = tmp_path / "s.mtx"
    s.write_text("%%MatrixMarket matrix coordinate pattern symmetric\n3 3 2\n1 2\n2 3\n")
    assert collect(read_edge_list(spark, str(s))) == [(0, 1), (1, 0), (1, 2), (2, 1)]


def test_metis(spark, tmp_path):
    p = tmp_path / "g.graph"
    # header: 3 vertices 2 edges; then neighbor lists (1-based)
    p.write_text("3 2\n2 3\n1\n1\n")
    assert collect(read_edge_list(spark, str(p))) == [(0, 1), (0, 2), (1, 0), (2, 0)]


def test_golden_graph_via_reader(spark):
    df = read_edge_list(spark, "tests/data/triangles_3.el")
    assert df.count() == 11  # 10 newlines + unterminated final row


def test_sg_round_trip(spark, tmp_path):
    """GAPBS binary snapshot interop (reader.h:252-298 layout): the .el
    graph serialized to .sg and read back must be edge-identical; same
    for .wsg with integer weights."""
    from gms_spark.graph.build import build_undirected
    from gms_spark.io.readers import read_edge_list, read_sg, write_sg

    und = build_undirected(
        read_edge_list(spark, "tests/data/triangles_3.el")
    ).localCheckpoint(eager=True)
    p = str(tmp_path / "g.sg")
    write_sg(und, p)
    back = read_sg(spark, p)
    a = sorted((r["src"], r["dst"]) for r in und.collect())
    b = sorted((r["src"], r["dst"]) for r in back.collect())
    assert a == b and len(a) > 10

    from pyspark.sql import functions as F

    w = und.withColumn("weight", (1 + (F.col("src") + F.col("dst")) % 7).cast("double"))
    pw = str(tmp_path / "g.wsg")
    write_sg(w, pw)
    backw = read_sg(spark, pw)
    aw = sorted((r["src"], r["dst"], r["weight"]) for r in w.collect())
    bw = sorted((r["src"], r["dst"], r["weight"]) for r in backw.collect())
    assert aw == bw


def wcollect(df):
    return sorted((r["src"], r["dst"], r["weight"]) for r in df.collect())


def test_mtx_weighted_real_symmetric(spark, tmp_path):
    """field=real → weight column; symmetric mirrors the weight too
    (reader.h:196-207)."""
    p = tmp_path / "w.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% a comment\n3 3 2\n1 2 2.5\n2 3 4\n"
    )
    assert wcollect(read_edge_list(spark, str(p))) == [
        (0, 1, 2.5), (1, 0, 2.5), (1, 2, 4.0), (2, 1, 4.0),
    ]


def test_mtx_weighted_integer_general(spark, tmp_path):
    p = tmp_path / "w.mtx"
    p.write_text("%%MatrixMarket matrix coordinate integer general\n3 3 2\n1 2 7\n3 1 9\n")
    assert wcollect(read_edge_list(spark, str(p))) == [(0, 1, 7.0), (2, 0, 9.0)]


def test_mtx_rejects_complex_and_bad_symmetry(spark, tmp_path):
    c = tmp_path / "c.mtx"
    c.write_text("%%MatrixMarket matrix coordinate complex general\n2 2 1\n1 2 1 0\n")
    with pytest.raises(ValueError, match="field"):
        read_edge_list(spark, str(c))
    h = tmp_path / "h.mtx"
    h.write_text("%%MatrixMarket matrix coordinate real hermitian\n2 2 1\n1 2 1\n")
    with pytest.raises(ValueError, match="symmetry"):
        read_edge_list(spark, str(h))


def test_metis_weighted_fmt1(spark, tmp_path):
    """fmt flag 1 → lines alternate neighbor/weight (reader.h:100-131)."""
    p = tmp_path / "w.graph"
    p.write_text("3 3 1\n2 5 3 1\n1 5 3 2\n1 1 2 2\n")
    assert wcollect(read_edge_list(spark, str(p))) == [
        (0, 1, 5.0), (0, 2, 1.0), (1, 0, 5.0), (1, 2, 2.0), (2, 0, 1.0), (2, 1, 2.0),
    ]


def test_metis_comments_and_fmt_guard(spark, tmp_path):
    # '%' lines are skipped without consuming a vertex index (reader.h:118-120)
    p = tmp_path / "c.graph"
    p.write_text("% leading comment\n3 2 0\n2 3\n% mid comment\n1\n1\n")
    assert collect(read_edge_list(spark, str(p))) == [(0, 1), (0, 2), (1, 0), (2, 0)]
    bad = tmp_path / "bad.graph"
    bad.write_text("2 1 11\n2\n1\n")
    with pytest.raises(ValueError, match="fmt"):
        read_edge_list(spark, str(bad))


def test_sssp_straight_off_weighted_mtx(spark, tmp_path):
    """A weighted benchmark graph loads → SSSP runs with its weights
    end-to-end (the round-3 'silently loses weights' gap)."""
    from gms_spark.graph.traversal import sssp

    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "4 4 4\n1 2 1\n2 3 2\n3 4 1\n1 4 10\n"
    )
    edges = read_edge_list(spark, str(p))
    dist = {r["vertex"]: r["dist"] for r in sssp(edges, source=0).collect()}
    assert dist == {0: 0.0, 1: 1.0, 2: 3.0, 3: 4.0}


def test_sg_directed_inverse_round_trip(spark, tmp_path):
    """Directed .sg with the appended inverse CSR (builder.h:279-297):
    read_sg(inverse=True) must return the transposed edge set; the
    forward read is unchanged; undirected files are their own inverse."""
    from gms_spark.io.readers import read_sg, write_sg

    edges = spark.createDataFrame([(0, 1), (0, 2), (2, 1), (3, 0)], "src long, dst long")
    p = str(tmp_path / "d.sg")
    write_sg(edges, p, directed=True)
    fwd = collect(read_sg(spark, p))
    inv = collect(read_sg(spark, p, inverse=True))
    assert fwd == [(0, 1), (0, 2), (2, 1), (3, 0)]
    assert inv == sorted((d, s) for s, d in fwd)
    u = str(tmp_path / "u.sg")
    write_sg(edges, u, directed=False)
    assert collect(read_sg(spark, u, inverse=True)) == fwd


def test_in_degree_helpers(spark):
    """Directed in-neighbor surface (graph.h:265-268 semantics)."""
    from gms_spark.graph.build import in_adjacency, in_degrees

    edges = spark.createDataFrame([(0, 1), (2, 1), (3, 1), (1, 0)], "src long, dst long")
    ind = {r["vertex"]: r["in_degree"] for r in in_degrees(edges).collect()}
    assert ind == {1: 3, 0: 1}
    adj = {r["dst"]: list(r["in_neigh"]) for r in in_adjacency(edges).collect()}
    assert adj == {1: [0, 2, 3], 0: [1]}
