"""PageRank over per-partition CSR blocks — the explicit SpMV formulation.

The north-star design (BASELINE.json): "power iteration as
repartition-by-src SpMV over per-partition CSR blocks". The edge table
is sharded ONCE by src_block = src mod B; each block's adjacency is
compiled into a numpy CSR-like structure with the dst-side aggregation
indices PRECOMPUTED (dst_unique + int32 inverse indices), so every
superstep inside a block is three vectorized ops:

    pos      = searchsorted(block_vertices, src)    # gather scores
    contrib  = score[pos] * w
    partials = bincount(dst_inverse, weights=contrib)

— pure streaming numpy (the reference's MakeCSR + pull loop,
gms/third_party/gapbs/builder.h:260-277 + log_graph/pr.cc:45-52,
re-expressed per partition). Blocks ship to Python as Arrow batches;
per-block partials are already dst-deduplicated (the map-side combine),
then one groupBy(dst).sum closes the superstep.

This is the measured ALTERNATIVE to gms_spark.graph.pagerank's
join+aggregate formulation (whole-stage codegen); both produce
identical semantics and bench.py can compare them. The join formulation
remains the default API.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gms_spark.graph.build import degrees, vertices


@dataclass
class CsrPageRankResult:
    scores: DataFrame
    iterations: int
    deltas: list[float]


def build_csr_blocks(edges: DataFrame, num_blocks: int) -> DataFrame:
    """(block, srcs, ws, dst_unique, dst_inverse) — one row per src block.

    srcs ascending; ws = 1/out_degree aligned with srcs; dst_inverse are
    int32 positions into dst_unique (precomputed segmented-sum plan).
    """
    deg = degrees(edges)
    ew = (
        edges.join(deg.withColumnRenamed("vertex", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("degree").cast("double")).alias("w"))
        .withColumn("block", F.pmod(F.col("src"), F.lit(num_blocks)).cast("int"))
    )

    def compile_block(key, pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["src"].to_numpy(), kind="stable")
        src = pdf["src"].to_numpy()[order]
        dst = pdf["dst"].to_numpy()[order]
        w = pdf["w"].to_numpy()[order]
        dst_unique, dst_inverse = np.unique(dst, return_inverse=True)
        return pd.DataFrame(
            {
                "block": [int(key[0])],
                "srcs": [src],
                "ws": [w],
                "dst_unique": [dst_unique],
                "dst_inverse": [dst_inverse.astype(np.int64)],
            }
        )

    return ew.groupBy("block").applyInPandas(
        compile_block,
        "block int, srcs array<long>, ws array<double>, dst_unique array<long>, dst_inverse array<long>",
    )


def pagerank_csr(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    fixed_iters: int | None = None,
    num_blocks: int | None = None,
    check_every: int = 4,
) -> CsrPageRankResult:
    """Same semantics as gms_spark.graph.pagerank.pagerank (symmetrized
    input: every vertex needs out-degree ≥ 1 and in-coverage)."""
    spark = edges.sparkSession
    if num_blocks is None:
        num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    verts = vertices(edges).persist()
    n = verts.count()
    blocks = build_csr_blocks(edges, num_blocks).repartition(num_blocks, "block").persist()
    blocks.count()
    base = (1.0 - damping) / n

    def superstep(scores: DataFrame) -> DataFrame:
        sc_b = scores.withColumn("block", F.pmod(F.col("vertex"), F.lit(num_blocks)).cast("int"))

        def gather(key, sc_pdf: pd.DataFrame, bl_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(bl_pdf) == 0 or len(sc_pdf) == 0:
                return pd.DataFrame({"vertex": [], "c": []}).astype({"vertex": "int64", "c": "float64"})
            v = sc_pdf["vertex"].to_numpy()
            s = sc_pdf["score"].to_numpy()
            order = np.argsort(v, kind="stable")
            v, s = v[order], s[order]
            srcs = np.asarray(bl_pdf["srcs"].iloc[0])
            ws = np.asarray(bl_pdf["ws"].iloc[0])
            dst_unique = np.asarray(bl_pdf["dst_unique"].iloc[0])
            dst_inverse = np.asarray(bl_pdf["dst_inverse"].iloc[0])
            pos = np.searchsorted(v, srcs)
            contrib = s[pos] * ws
            partial = np.bincount(dst_inverse, weights=contrib, minlength=len(dst_unique))
            return pd.DataFrame({"vertex": dst_unique, "c": partial})

        partials = sc_b.groupBy("block").cogroup(blocks.groupBy("block")).applyInPandas(
            gather, "vertex long, c double"
        )
        return partials.groupBy("vertex").agg(
            (F.lit(base) + F.lit(damping) * F.sum("c")).alias("score")
        )

    scores = verts.select("vertex", F.lit(1.0 / n).alias("score")).persist()
    scores.count()
    deltas: list[float] = []
    iters = fixed_iters if fixed_iters is not None else max_iters
    done = 0
    while done < iters:
        k = min(check_every, iters - done)
        new = scores
        for _ in range(k):
            new = superstep(new)
        new = new.localCheckpoint(eager=True)
        done += k
        if fixed_iters is None:
            delta = (
                new.join(scores.select("vertex", F.col("score").alias("old")), "vertex")
                .agg(F.sum(F.abs(F.col("score") - F.col("old"))))
                .first()[0]
            )
            deltas.append(float(delta))
            scores.unpersist()
            scores = new
            if delta <= tol * k:
                break
        else:
            scores.unpersist()
            scores = new
    verts.unpersist()
    blocks.unpersist()
    return CsrPageRankResult(scores, done, deltas)
