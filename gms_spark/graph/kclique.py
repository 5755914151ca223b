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


def kclique_count(edges: DataFrame, k: int) -> int:
    """Number of k-cliques in a simple undirected (symmetrized) graph."""
    if k < 1:
        return 0
    from gms_spark.graph.build import vertices

    if k == 1:
        return vertices(edges).count()
    if k == 2:
        return edges.where(F.col("src") < F.col("dst")).count()

    from gms_spark.graph.triangles import orient_by_degree

    dag = orient_by_degree(edges)
    adj = adjacency(dag).persist()
    adj.count()

    def intersect_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cands = []
            for a, b in zip(pdf["cand"], pdf["neigh"]):
                cands.append(np.intersect1d(np.asarray(a), np.asarray(b), assume_unique=True))
            out = pd.DataFrame({"cand": cands})
            yield out

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
