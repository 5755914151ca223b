"""Coloring-menu tests: propriety, palette bounds, harness determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gms_spark.graph.coloring import (
    barenboim,
    compare_colorings,
    elkin,
    is_proper,
    johansson,
    jp_lf,
    jp_random,
    jp_sl,
)

from .oracles import load_el, undirect


@pytest.fixture()
def graph(edges_df_factory):
    el = undirect(load_el("smallRandom1.el"))
    return edges_df_factory(el).persist()


@pytest.mark.parametrize("variant", [jp_random, jp_lf, jp_sl, johansson])
def test_variant_proper_and_bounded(graph, variant):
    """Propriety + Δ+1 palette bound + no NULL colors, per variant.

    Greedy JP uses ≤ Δ+1 colors (a vertex sees at most Δ used colors);
    Johansson draws from [0, Δ+1) so the same bound holds by
    construction.
    """
    from gms_spark.graph.build import degrees

    max_deg = degrees(graph).agg(F.max("degree")).first()[0]
    res = variant(graph)
    assert is_proper(graph, res.colors)
    assert res.colors.where(F.col("color").isNull()).count() == 0
    assert res.n_colors <= max_deg + 1
    assert res.colors.agg(F.max("color")).first()[0] <= max_deg


def test_compare_harness_and_determinism(edges_df_factory):
    el = undirect(load_el("triangles_3.el"))
    graph = edges_df_factory(el).persist()
    rows = {r["variant"]: r for r in compare_colorings(graph).collect()}
    assert set(rows) == {"jp_random", "jp_lf", "jp_sl", "johansson", "barenboim", "elkin"}
    for r in rows.values():
        assert r["proper"] is True
        assert r["n_colors"] >= 1 and r["rounds"] >= 1
    # determinism: a second run of a hash-driven variant is identical
    a = sorted((r["vertex"], r["color"]) for r in jp_lf(graph).colors.collect())
    b = sorted((r["vertex"], r["color"]) for r in jp_lf(graph).colors.collect())
    assert a == b


@pytest.mark.parametrize("variant", [barenboim, elkin])
def test_speculative_variants_proper_and_bounded(graph, variant):
    """Barenboim/Elkin (1-based palette {1..Δ+1}, reference convention):
    propriety, no NULLs, ≤ Δ+1 colors, and determinism (LCG draws)."""
    from gms_spark.graph.build import degrees

    max_deg = degrees(graph).agg(F.max("degree")).first()[0]
    res = variant(graph)
    assert is_proper(graph, res.colors)
    assert res.colors.where(F.col("color").isNull()).count() == 0
    assert res.n_colors <= max_deg + 1
    lohi = res.colors.agg(F.min("color").alias("lo"), F.max("color").alias("hi")).first()
    assert lohi["lo"] >= 1 and lohi["hi"] <= max_deg + 1
    a = sorted((r["vertex"], r["color"]) for r in res.colors.collect())
    b = sorted((r["vertex"], r["color"]) for r in variant(graph).colors.collect())
    assert a == b


def test_barenboim_proper_on_rmat_hub_graph(spark):
    """Speculative one-shot rounds on a skewed R-MAT graph: the per-round
    aggregates (used-color set, conflict pairs) are palette-bounded, not
    hub-degree-bounded, so power-law hubs survive."""
    from gms_spark.graph.build import build_undirected, degrees
    from gms_spark.graph.generators import rmat_el

    und = build_undirected(rmat_el(spark, scale=9, deg=8)).persist()
    max_deg = degrees(und).agg(F.max("degree")).first()[0]
    res = barenboim(und)
    assert is_proper(und, res.colors)
    assert res.n_colors <= max_deg + 1
    und.unpersist()


def test_jp_proper_on_rmat_hub_graph(spark):
    """Propriety + palette bound on a skewed R-MAT graph (power-law hubs):
    the JP round's only per-vertex aggregate is collect_set of neighbor
    COLORS — bounded by the palette, not the hub degree — so hubs flow
    through as plain edge rows with map-side partial aggregation."""
    from gms_spark.graph.build import build_undirected, degrees
    from gms_spark.graph.generators import rmat_el

    und = build_undirected(rmat_el(spark, scale=9, deg=8)).persist()
    max_deg = degrees(und).agg(F.max("degree")).first()[0]
    res = jp_random(und)
    assert is_proper(und, res.colors)
    assert res.colors.where(F.col("color").isNull()).count() == 0
    assert res.n_colors <= max_deg + 1
    und.unpersist()
