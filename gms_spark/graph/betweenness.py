"""Betweenness centrality — Brandes algorithm, batched over sources.

Reference semantics (gms/representations/graphs/log_graph/bc.cc, Brandes
2001): bc(v) = Σ_{s≠v≠t} σ_st(v)/σ_st over unweighted shortest paths.
The reference iterates sources one at a time with a shared-memory BFS;
the Spark shape batches ALL sources (or a sampled subset — the standard
approximation at web scale, and what bc.cc's -i sampled-iterations mode
does) into one keyed frontier:

  forward:  level tables (source, vertex, sigma) grown one BFS level per
            job — every source advances in the same job, so work is
            keyed by (source, vertex) and stragglers average out across
            sources instead of serializing.
  backward: dependency deltas flow one level per job from the deepest
            frontier upward: delta_{l-1}(u) = Σ_{v∈level_l, u~v}
            σ_u/σ_v · (1 + delta_l(v)); a vertex's final delta (levels
            ≥ 1) is its per-source bc contribution.

``halve=True`` gives the textbook undirected score (each unordered pair
counted once); the raw symmetrized accumulation (reference convention)
is halve=False.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gms_spark.graph.build import vertices


def betweenness_centrality(
    edges: DataFrame,
    sources: DataFrame | list[int] | None = None,
    max_depth: int = 200,
    halve: bool = True,
) -> DataFrame:
    """(vertex, bc: double) over a simple undirected (symmetrized) graph.

    ``sources``: None = exact (all vertices); a list/DataFrame of vertex
    ids = sampled approximation, scaled by n/|S|.
    """
    spark = edges.sparkSession
    verts = vertices(edges).persist()
    n = verts.count()

    if sources is None:
        src_df = verts.select(F.col("vertex").alias("source"))
        scale = 1.0
    else:
        if isinstance(sources, list):
            src_df = spark.createDataFrame([(int(s),) for s in sources], "source long")
        else:
            src_df = sources.select(F.col(sources.columns[0]).alias("source"))
        scale = n / src_df.count()

    # ---- forward: levels[l] = (source, vertex, sigma) -----------------
    frontier = (
        src_df.select("source", F.col("source").alias("vertex"), F.lit(1.0).alias("sigma"))
        .localCheckpoint(eager=True)
    )
    seen = frontier.select("source", "vertex").localCheckpoint(eager=True)
    levels: list[DataFrame] = [frontier]
    for _ in range(max_depth):
        nxt = (
            frontier.withColumnRenamed("vertex", "src")
            .join(edges, "src")
            .groupBy("source", F.col("dst").alias("vertex"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(seen, ["source", "vertex"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        seen = seen.unionAll(nxt.select("source", "vertex")).localCheckpoint(eager=True)
        frontier = nxt

    # ---- backward: deltas level by level, deepest first ---------------
    bc_parts: list[DataFrame] = []
    L = len(levels) - 1
    delta = levels[L].select("source", "vertex", F.lit(0.0).alias("delta"))
    for l in range(L, 0, -1):
        lower = levels[l].join(delta, ["source", "vertex"], "left").fillna(0.0, ["delta"])
        contrib = (
            lower.withColumnRenamed("vertex", "dst")
            .withColumnRenamed("sigma", "sigma_v")
            .join(edges, "dst")
            .select("source", F.col("src").alias("vertex"), "sigma_v", "delta")
        )
        delta = (
            levels[l - 1]
            .join(contrib, ["source", "vertex"])
            .groupBy("source", "vertex", "sigma")
            .agg(F.sum(F.col("sigma") / F.col("sigma_v") * (1.0 + F.col("delta"))).alias("delta"))
            .select("source", "vertex", "delta")
            .localCheckpoint(eager=True)
        )
        if l - 1 >= 1:  # level-0 rows are the sources themselves (excluded)
            bc_parts.append(delta)

    factor = scale * (0.5 if halve else 1.0)
    if not bc_parts:
        return verts.select("vertex", F.lit(0.0).alias("bc"))
    allparts = bc_parts[0]
    for p in bc_parts[1:]:
        allparts = allparts.unionAll(p)
    totals = allparts.groupBy("vertex").agg((F.sum("delta") * factor).alias("bc"))
    return verts.join(totals, "vertex", "left").fillna(0.0, ["bc"]).select("vertex", "bc")
