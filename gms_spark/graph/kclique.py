"""k-clique counting — frontier expansion over the degeneracy/degree DAG.

Semantics of gms/algorithms/set_based/k_clique_count/k_clique_count_set_based.h:5-31
(recursive: cliques(k, S) = Σ_{v∈S} cliques(k-1, S ∩ N⁺(v))) and the
kClist family (gms/algorithms/non_set_based/k_clique_list/kernels/
kclisting.h:18-190). The reference parallelizes over roots with
thread-local subgraphs; our shape is a *frontier DataFrame*:

  level 2: frontier = oriented edges (u,v) with cand = N⁺(v) ∩ N⁺(u)
  level l+1: explode one candidate w, cand' = cand ∩ N⁺(w)
  count at level k = Σ |cand| at level k-1 (last member choice is free)

Each expansion is one join (frontier ⋈ adjacency) + an Arrow-batched
numpy sorted-intersection — work is bounded by the DAG's out-degrees
(≤ ~degeneracy after degree ordering), which is what keeps hub vertices
cheap at web scale. k=3 reduces exactly to the triangle kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gms_spark.graph.build import adjacency


def kclique_count(edges: DataFrame, k: int, order: str = "degree") -> int:
    """Number of k-cliques in a simple undirected (symmetrized) graph.

    ``order``: DAG orientation — 'degree' ((degree, id)) or 'adg'
    (approximate-degeneracy ranks, the reference's mining bound:
    out-degrees ≤ ~2(1+ε)·degeneracy instead of ≤ max degree ties).
    """
    if k < 1:
        return 0
    from gms_spark.graph.build import vertices

    if k == 1:
        return vertices(edges).count()
    if k == 2:
        return edges.where(F.col("src") < F.col("dst")).count()

    from gms_spark.graph.setops import batch_intersect
    from gms_spark.graph.triangles import orient

    from gms_spark.graph.build import stage_edges

    # materialize the DAG once: it feeds the adjacency aggregation AND
    # the level-2 frontier join — left lazy, the upstream graph build +
    # orientation would re-execute per reference (stage_edges guards the
    # raw input the same way inside orient's degree joins)
    dag = orient(stage_edges(edges), order).localCheckpoint(eager=True)
    adj = adjacency(dag).persist()
    adj.count()

    def intersect_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # one flattened searchsorted per batch (setops.batch_intersect)
            vals, counts, _ = batch_intersect(pdf["cand"], pdf["neigh"])
            cands = np.split(vals, np.cumsum(counts)[:-1])
            yield pd.DataFrame({"cand": cands})

    # level 2 frontier: for each oriented edge (u,v): cand = N+(u) ∩ N+(v)
    frontier = (
        dag.join(adj.withColumnRenamed("neigh", "cand"), "src")
        .join(adj.withColumnRenamed("src", "dst"), "dst", "inner")
        .select("cand", "neigh")
        .mapInPandas(intersect_stage, "cand array<long>")
        .where(F.size("cand") > 0)
    )
    level = 2
    while level < k - 1:
        # Pick the next member w from cand, re-intersect with N+(w).
        # cand ∩ N+(w) keeps only DAG-successors of w, so every clique is
        # enumerated exactly once in DAG order — no explicit w-filter
        # needed (and none would be valid: ids are original, DAG order is
        # (degree, id)).
        frontier = (
            frontier.select(F.explode("cand").alias("w"), F.col("cand"))
            .join(adj.withColumnRenamed("src", "w"), "w", "inner")
            .select("cand", "neigh")
            .mapInPandas(intersect_stage, "cand array<long>")
            .where(F.size("cand") > 0)
        )
        level += 1
    total = frontier.select(F.sum(F.size("cand")).alias("t")).first()[0]
    adj.unpersist()
    return int(total or 0)


def kclique_list(edges: DataFrame, k: int, order: str = "degree") -> DataFrame:
    """List all k-cliques: (members: sorted array<long>).

    Same DAG frontier as kclique_count but carrying the member stack
    (kClist listing semantics, gms/algorithms/non_set_based/
    k_clique_list/kernels/kclisting.h:18-190).
    """
    if k < 2:
        raise ValueError("k >= 2")
    from gms_spark.graph.setops import batch_intersect
    from gms_spark.graph.triangles import orient

    from gms_spark.graph.build import stage_edges

    dag = orient(stage_edges(edges), order).localCheckpoint(eager=True)
    if k == 2:
        return dag.select(F.array_sort(F.array("src", "dst")).alias("members"))
    adj = adjacency(dag).persist()
    adj.count()

    def intersect_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vals, counts, _ = batch_intersect(pdf["cand"], pdf["neigh"])
            cands = np.split(vals, np.cumsum(counts)[:-1])
            yield pd.DataFrame({"members": pdf["members"], "cand": cands})

    frontier = (
        dag.select(F.array("src", "dst").alias("members"), "src", "dst")
        .join(adj.withColumnRenamed("neigh", "cand"), "src")
        .join(adj.withColumnRenamed("src", "dst"), "dst", "inner")
        .select("members", "cand", "neigh")
        .mapInPandas(intersect_stage, "members array<long>, cand array<long>")
        .where(F.size("cand") > 0)
    )
    level = 2
    while level < k - 1:
        frontier = (
            frontier.select(F.explode("cand").alias("w"), "members", "cand")
            .select(F.array_append("members", F.col("w")).alias("members"), "cand", "w")
            .join(adj.withColumnRenamed("src", "w"), "w", "inner")
            .select("members", "cand", "neigh")
            .mapInPandas(intersect_stage, "members array<long>, cand array<long>")
            .where(F.size("cand") > 0)
        )
        level += 1
    out = frontier.select("members", F.explode("cand").alias("w")).select(
        F.array_sort(F.array_append("members", F.col("w"))).alias("members")
    )
    adj.unpersist()
    return out


def kclique_star_list(edges: DataFrame, k: int) -> DataFrame:
    """k-cliques plus their common outside neighbors (k-clique-stars).

    Semantics of gms/algorithms/set_based/k_clique_star_list/
    sequential/recursive.h:33-80: for each k-clique C, star(C) =
    (∩_{v∈C} N(v)) \\ C over the FULL undirected neighborhoods.
    Output: (members array<long>, star sorted array<long>).

    Plan shape: a star vertex s of clique C is adjacent to ALL k members,
    so explode members ⋈ edges and keep (C, s) groups of size exactly
    k — one equi-join + one count aggregate, never materializing any
    vertex's full neighborhood in a row (a hub member's adjacency flows
    through the shuffle as plain edge rows with map-side partial counts).
    The clique key is the sorted member array itself (kclique_list emits
    members sorted): deterministic across recomputes, unlike
    monotonically_increasing_id on a lazily-cached frame, and the join
    back is by value so neither branch depends on row order. The n_adj==k
    test requires a duplicate-free edge table — enforced here with
    distinct() (cheap next to the clique join) so a raw CLI input with
    repeated (src, dst) rows cannot inflate the count.
    """
    edges = edges.distinct()
    # materialized once (checkpoint): consumed by both the star search
    # and the final join-back
    cliques = kclique_list(edges, k).localCheckpoint(eager=True)
    common = (
        cliques.select("members", F.explode("members").alias("src"))
        .join(edges, "src")
        .where(~F.array_contains(F.col("members"), F.col("dst")))  # s ∉ C
        .groupBy("members", "dst")
        .agg(F.count("*").alias("n_adj"))
        .where(F.col("n_adj") == k)  # adjacent to every member
        .groupBy("members")
        .agg(F.sort_array(F.collect_list("dst")).alias("star"))
    )
    return cliques.join(common, "members", "left").select(
        "members", F.coalesce("star", F.array().cast("array<long>")).alias("star")
    )
