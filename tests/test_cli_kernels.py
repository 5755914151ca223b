"""CLI kernel menu: every kernel runs end-to-end on a golden graph."""

from __future__ import annotations

import pytest

from gms_spark import cli

EL = "tests/data/triangles_3.el"


@pytest.mark.parametrize(
    "argv",
    [
        ["--kernel", "bfs", "--input", EL, "--source", "0"],
        ["--kernel", "bfs_do", "--input", EL, "--source", "0"],
        ["--kernel", "sssp", "--input", EL],
        ["--kernel", "betweenness", "--input", EL, "--bc-samples", "3"],
        ["--kernel", "coreness", "--input", EL],
        ["--kernel", "components", "--input", EL, "--hub-salt", "2"],
        ["--kernel", "pagerank", "--input", EL, "--hub-salt", "2", "--iters", "5"],
        ["--kernel", "kclique", "--input", EL, "--k", "3"],
        ["--kernel", "mce", "--input", EL],
        ["--kernel", "coloring", "--input", EL, "--variant", "jp_lf"],
        ["--kernel", "link_prediction", "--input", EL, "--topq", "5"],
    ],
)
def test_cli_kernel_runs(spark, argv, capsys):
    # `spark` fixture keeps one session alive; cli's getOrCreate reuses it
    assert cli.main(argv) == 0
    assert "@@@ kernel=" in capsys.readouterr().out


def test_cli_bfs_matches_kernel(spark, capsys):
    from gms_spark.graph.traversal import bfs
    from gms_spark.io.readers import read_edge_list
    from gms_spark.graph.build import build_undirected

    cli.main(["--kernel", "bfs", "--input", EL, "--source", "0"])
    out = capsys.readouterr().out
    rows = int(out.split("rows=")[1].split()[0])
    g = build_undirected(read_edge_list(spark, EL).select("src", "dst"))
    assert rows == bfs(g, 0).count()
