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
    wave_size: int | None = 64,
) -> DataFrame:
    """(vertex, bc: double) over a simple undirected (symmetrized) graph.

    ``sources``: None = exact (all vertices); a list/DataFrame of vertex
    ids = sampled approximation, scaled by n/|S|.

    ``wave_size``: sources are processed in fixed-size waves (hash-
    assigned, deterministic) whose per-vertex bc partials accumulate —
    peak forward-state is O(wave_size · n) instead of O(|S| · n), which
    is what keeps the level tables shuffle-sized when |S| grows with the
    graph. None = single wave (all sources at once). Identical output
    for any wave_size (bc is a sum over sources).
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

    n_sources = src_df.count()
    factor = scale * (0.5 if halve else 1.0)
    if wave_size is not None and n_sources > wave_size:
        n_waves = (n_sources + wave_size - 1) // wave_size
        src_df = src_df.withColumn("_wave", F.pmod(F.xxhash64("source"), F.lit(n_waves))).persist()
        src_df.count()
        wave_totals: list[DataFrame] = []
        for wv in range(n_waves):
            wave_srcs = src_df.where(F.col("_wave") == wv).select("source")
            parts = _brandes_deltas(edges, wave_srcs, max_depth)
            if parts is not None:
                wave_totals.append(
                    parts.groupBy("vertex").agg(F.sum("delta").alias("delta")).localCheckpoint(eager=True)
                )
        src_df.unpersist()
        if not wave_totals:
            return verts.select("vertex", F.lit(0.0).alias("bc"))
        allw = wave_totals[0]
        for p in wave_totals[1:]:
            allw = allw.unionAll(p)
        totals = allw.groupBy("vertex").agg((F.sum("delta") * factor).alias("bc"))
        return verts.join(totals, "vertex", "left").fillna(0.0, ["bc"]).select("vertex", "bc")

    parts = _brandes_deltas(edges, src_df, max_depth)
    if parts is None:
        return verts.select("vertex", F.lit(0.0).alias("bc"))
    totals = parts.groupBy("vertex").agg((F.sum("delta") * factor).alias("bc"))
    return verts.join(totals, "vertex", "left").fillna(0.0, ["bc"]).select("vertex", "bc")


def _brandes_deltas(edges: DataFrame, src_df: DataFrame, max_depth: int) -> DataFrame | None:
    """Union of per-(source, vertex) dependency deltas (levels >= 1), or
    None when no level-1 rows exist."""
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

    if not bc_parts:
        return None
    allparts = bc_parts[0]
    for p in bc_parts[1:]:
        allparts = allparts.unionAll(p)
    return allparts.select("vertex", "delta")
