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
