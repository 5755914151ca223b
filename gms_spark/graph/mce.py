"""Maximal clique enumeration — Eppstein-style parallel Bron–Kerbosch.

Semantics of gms/algorithms/set_based/maximal_clique_enum/: the
Eppstein variant (sequential/eppstein.h:13-46, parallel
parallel/eppsteinPAR.h:17-66) runs one ordered outer loop over vertices
— for vertex v: P = later-ordered neighbors, X = earlier-ordered
neighbors — and expands each (v, P, X) root with Tomita max-pivot
recursion (sequential/tomita.h:11-107). Output: every maximal clique,
exactly once.

Spark shape (the reference's per-root thread-local subgraphs,
sub_graph/roaring_sub_graph.h + parallel/EppsteinSubGraph.h:13-60,
become per-root rows): one DataFrame of roots (v, P, X, induced
adjacency of N(v)), then an Arrow-batched Bron–Kerbosch–Tomita per root
inside mapInPandas.

Per-root memory bound: the induced adjacency is restricted to
N(v) ∩ N(u) BEFORE any collect — i.e. it is exactly the triangles
through v, built as edges ⋈ edges + a semi-join back on (v, w). A
root's row payload is therefore 2·|E(G[N(v)])| (the induced
neighborhood's edge count), never Σ_{u∈N(v)} deg(u) — a hub whose
neighbors are mostly strangers to each other stays cheap even when
those neighbors are themselves hubs.

Ordering: ADG approximate-degeneracy ranks by default (matching the
reference's degeneracy ordering template param, eppsteinPAR.h:17-66),
(degree, id) as the cheap fallback. The order affects only per-root
work (P sizes are bounded by ~degeneracy under ADG), never the clique
set.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def _root_order(edges: DataFrame, order) -> DataFrame:
    """(vertex, ord_rank) total order for the P/X split; ``order`` may be
    a PRECOMPUTED (vertex, rank) DataFrame shared across consumers."""
    if isinstance(order, DataFrame):
        return order.select("vertex", F.col("rank").alias("ord_rank"))
    if order == "adg":
        from gms_spark.graph.orderings import adg_order

        return adg_order(edges).select("vertex", F.col("rank").alias("ord_rank"))
    if order == "degree":
        from gms_spark.graph.build import degree_rank

        return degree_rank(edges).select("vertex", F.col("rank").alias("ord_rank"))
    if order == "degeneracy":
        from gms_spark.graph.orderings import degeneracy_order

        return degeneracy_order(edges).select("vertex", F.col("rank").alias("ord_rank"))
    raise ValueError(f"unknown order {order!r}")


def mce_roots(edges: DataFrame, order: str = "adg") -> DataFrame:
    """Per-root rows (v, P, X, sub) with bounded payload (see module doc)."""
    ranks = _root_order(edges, order)
    tagged = (
        edges.join(ranks.withColumnRenamed("vertex", "src").withColumnRenamed("ord_rank", "r_src"), "src")
        .join(ranks.withColumnRenamed("vertex", "dst").withColumnRenamed("ord_rank", "r_dst"), "dst")
    )
    later = F.col("r_src") < F.col("r_dst")
    p_x = tagged.groupBy(F.col("src").alias("v")).agg(
        F.sort_array(F.collect_list(F.when(later, F.col("dst")))).alias("P"),
        F.sort_array(F.collect_list(F.when(~later, F.col("dst")))).alias("X"),
    )
    # induced adjacency among N(v) = triangles through v: (v,u,w) with
    # u,w ∈ N(v) and (u,w) ∈ E — restricted BEFORE any collect_list
    t1 = edges.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    t2 = edges.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = t1.join(t2, "u").join(
        edges.select(F.col("src").alias("v"), F.col("dst").alias("w")), ["v", "w"], "left_semi"
    )
    nbr_adj = (
        tri.groupBy("v", "u")
        .agg(F.sort_array(F.collect_list("w")).alias("u_neigh"))
        .groupBy("v")
        .agg(F.collect_list(F.struct("u", "u_neigh")).alias("sub"))
    )
    # left join: a root whose neighborhood is an independent set has no
    # triangles and an empty induced adjacency
    return p_x.join(nbr_adj, "v", "left")


def _split_edge_tasks(base: DataFrame, threshold: int) -> DataFrame:
    """Expand dense roots one BK level into per-edge subtasks.

    The reference's edge-parallel strategy
    (gms/algorithms/parallelizationStrategy/parallelize.h:38-120): a
    root whose candidate set P exceeds ``threshold`` becomes |P|
    subtasks — for the i-th candidate u (in sorted P order, matching
    BK's branch order without the level-1 pivot):
      R' = R + [u];  P' = P[i+1:] ∩ N(u);  X' = (X ∪ P[:i]) ∩ N(u).
    Exactly the standard BK branch bookkeeping, so the union of subtask
    outputs equals the root's output. Each subtask's induced adjacency
    is re-restricted to P'∪X' (payload stays bounded — the split must
    not replicate the hub's full neighborhood |P| times), and the task
    table is round-robin repartitioned so one dense root's subtasks
    spread across executors instead of straggling a single partition.
    """
    empty = F.array().cast("array<long>")
    big = base.where(F.size("P") > threshold)
    small = base.where(F.size("P") <= threshold)
    expl = (
        big.select("R", "P", "X", "sub", F.posexplode("P").alias("pos", "u"))
        .withColumn(
            "un",
            F.coalesce(
                # get(), not getItem(0): a candidate u with no neighbors
                # inside N(v) has no sub entry (empty filter result)
                F.get(F.filter("sub", lambda s: s["u"] == F.col("u")), F.lit(0)).getField("u_neigh"),
                empty,
            ),
        )
        .withColumn(
            "P2",
            F.filter(
                F.slice("P", F.col("pos") + F.lit(2), F.size("P")),
                lambda w: F.array_contains("un", w),
            ),
        )
        .withColumn(
            "X2",
            F.concat(
                F.filter("X", lambda w: F.array_contains("un", w)),
                F.filter(F.slice("P", F.lit(1), F.col("pos")), lambda w: F.array_contains("un", w)),
            ),
        )
        .withColumn("mem", F.concat("P2", "X2"))
    )
    sub2 = F.transform(
        F.filter("sub", lambda s: F.array_contains("mem", s["u"])),
        lambda s: F.struct(
            s["u"].alias("u"),
            F.filter(s["u_neigh"], lambda w: F.array_contains("mem", w)).alias("u_neigh"),
        ),
    )
    tasks = expl.select(
        F.concat("R", F.array("u")).alias("R"),
        F.col("P2").alias("P"),
        F.col("X2").alias("X"),
        sub2.alias("sub"),
    )
    nparts = int(base.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return small.unionByName(tasks).repartition(nparts)


def maximal_cliques(
    edges: DataFrame, min_size: int = 1, order: str = "adg", split_threshold: int | None = 64
) -> DataFrame:
    """All maximal cliques of a simple undirected graph: (clique array<long>).

    Isolated-from-edges vertices (degree 0) never appear in ``edges`` and
    are trivially maximal singletons — excluded here, matching the
    reference which enumerates over the edge-bearing graph.

    ``split_threshold``: roots with |P| above it are expanded one BK
    level into per-edge subtasks spread across partitions (see
    ``_split_edge_tasks``) — per-root BK work is worst-case exponential,
    and without the split one dense root can straggle its partition.
    None disables splitting.
    """
    roots = mce_roots(edges, order)
    base = roots.select(
        F.array("v").alias("R"),
        "P",
        "X",
        F.coalesce("sub", F.array().cast("array<struct<u:long,u_neigh:array<long>>>")).alias("sub"),
    )
    if split_threshold is not None:
        base = _split_edge_tasks(base, split_threshold)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cliques: list[list[int]] = []
            for R, P, X, sub in zip(pdf["R"], pdf["P"], pdf["X"], pdf["sub"]):
                local = (
                    {int(s["u"]): set(int(x) for x in s["u_neigh"]) for s in sub}
                    if sub is not None
                    else {}
                )
                out: list[list[int]] = []
                _bk_pivot([int(x) for x in R], set(int(x) for x in P), set(int(x) for x in X), local, out)
                cliques.extend(out)
            yield pd.DataFrame({"clique": cliques if cliques else []}, dtype=object)

    res = base.mapInPandas(expand, "clique array<long>")
    if min_size > 1:
        res = res.where(F.size("clique") >= min_size)
    return res
