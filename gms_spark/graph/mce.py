"""Maximal clique enumeration — Eppstein-style parallel Bron–Kerbosch.

Semantics of gms/algorithms/set_based/maximal_clique_enum/: the
Eppstein variant (sequential/eppstein.h:13-46, parallel
parallel/eppsteinPAR.h:17-66) runs one ordered outer loop over vertices
— for vertex v: P = later-ordered neighbors, X = earlier-ordered
neighbors — and expands each (v, P, X) root with Tomita max-pivot
recursion (sequential/tomita.h:11-107). Output: every maximal clique,
exactly once.

Spark shape (the reference's per-root thread-local subgraphs,
sub_graph/roaring_sub_graph.h, become per-root rows): one DataFrame of
roots (v, P, X, induced adjacency of N(v)) built with two joins +
groupBy, then an Arrow-batched numpy Bron–Kerbosch–Tomita per root
inside mapInPandas. Work per root is bounded by the (degree-ordered)
out-neighborhood — the same degeneracy bound the reference exploits —
so hub vertices stay cheap and roots parallelize across the cluster.

Ordering: (degree, id) lexicographic (matches orient_by_degree), a
degeneracy-style order adequate for the output contract (the order
affects only performance, never the clique set).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gms_spark.graph.build import adjacency, degrees


def _bk_pivot(R: list[int], P: set[int], X: set[int], adj: dict[int, set[int]], out: list[list[int]]) -> None:
    """Tomita pivot BK over a python-dict subgraph (per-root, small)."""
    if not P and not X:
        out.append(sorted(R))
        return
    pivot = max(P | X, key=lambda u: len(P & adj.get(u, set())))
    for v in sorted(P - adj.get(pivot, set())):
        nv = adj.get(v, set())
        _bk_pivot(R + [v], P & nv, X & nv, adj, out)
        P = P - {v}
        X = X | {v}


def maximal_cliques(edges: DataFrame, min_size: int = 1) -> DataFrame:
    """All maximal cliques of a simple undirected graph: (clique array<long>).

    Isolated-from-edges vertices (degree 0) never appear in ``edges`` and
    are trivially maximal singletons — excluded here, matching the
    reference which enumerates over the edge-bearing graph.
    """
    deg = degrees(edges)
    d_src = deg.select(F.col("vertex").alias("src"), F.col("degree").alias("ds"))
    d_dst = deg.select(F.col("vertex").alias("dst"), F.col("degree").alias("dd"))
    tagged = edges.join(d_src, "src").join(d_dst, "dst")
    later = (F.col("ds") < F.col("dd")) | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))

    # roots: for each v, P = later-ordered nbrs, X = earlier-ordered nbrs
    p_x = tagged.groupBy(F.col("src").alias("v")).agg(
        F.sort_array(F.collect_list(F.when(later, F.col("dst")))).alias("P"),
        F.sort_array(F.collect_list(F.when(~later, F.col("dst")))).alias("X"),
    )
    # induced adjacency among N(v): explode neighbors, join their own
    # (full) neighborhoods once, restrict inside the UDF
    adj = adjacency(edges)
    nbr_adj = (
        edges.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .join(adj.withColumnRenamed("src", "u").withColumnRenamed("neigh", "u_neigh"), "u")
        .groupBy("v")
        .agg(F.collect_list(F.struct("u", "u_neigh")).alias("sub"))
    )
    roots = p_x.join(nbr_adj, "v")

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cliques: list[list[int]] = []
            for v, P, X, sub in zip(pdf["v"], pdf["P"], pdf["X"], pdf["sub"]):
                nbrs = {int(s["u"]) for s in sub}
                local = {int(s["u"]): set(int(x) for x in s["u_neigh"]) & nbrs for s in sub}
                out: list[list[int]] = []
                _bk_pivot([int(v)], set(int(x) for x in P), set(int(x) for x in X), local, out)
                cliques.extend(out)
            yield pd.DataFrame({"clique": cliques if cliques else []}, dtype=object)

    res = roots.mapInPandas(expand, "clique array<long>")
    if min_size > 1:
        res = res.where(F.size("clique") >= min_size)
    return res
