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

from gms_spark.graph.build import adjacency, degree_rank, orient_by_rank


def kclique_count(edges: DataFrame, k: int) -> int:
    """Number of k-cliques in a simple undirected (symmetrized) graph."""
    if k < 1:
        return 0
    from gms_spark.graph.build import vertices

    if k == 1:
        return vertices(edges).count()
    if k == 2:
        return edges.where(F.col("src") < F.col("dst")).count()

    rank = degree_rank(edges)
    dag = orient_by_rank(edges, rank)
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
        # pick the next member w from cand, re-intersect with N+(w)
        frontier = (
            frontier.select(F.explode("cand").alias("w"), F.col("cand"))
            .withColumn("cand", F.filter("cand", lambda x: x > F.col("w")))
            .join(adj.withColumnRenamed("src", "w"), "w", "inner")
            .select("cand", "neigh")
            .mapInPandas(intersect_stage, "cand array<long>")
            .where(F.size("cand") > 0)
        )
        level += 1
    total = frontier.select(F.sum(F.size("cand")).alias("t")).first()[0]
    adj.unpersist()
    return int(total or 0)
