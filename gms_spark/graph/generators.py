"""Synthetic graph generators — hash-per-edge-index, order-independent.

Mirrors the reference CLI generators (-g uniform|kronecker SCALE --deg D,
gms/common/cli/cli.h:110-117):
  uniform_el — Erdős–Rényi-ish: 2^scale nodes, 2^scale·deg edges
               (gms/third_party/gapbs/generator.h:64-79)
  rmat_el    — Kronecker/R-MAT with Graph500 params A=.57 B=.19 C=.19
               (generator.h:81-114)

The reference consumes a stateful RNG; we derive both endpoints of edge
i purely from mix64(seed, i) (same spirit as its per-block reseeding,
generator.h:70-77), so generation is deterministic under ANY partitioning
— a requirement the reference never had because it was single-node.
Weights follow InsertWeights semantics (generator.h:130-151): uniform
ints 1..255 per edge index.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KRAND_SEED = 27491095  # gms/third_party/gapbs/util.h:25


def _mix(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def uniform_el(spark: SparkSession, scale: int, deg: int = 16, seed: int = KRAND_SEED, partitions: int | None = None) -> DataFrame:
    """2^scale nodes, 2^scale*deg uniformly random edges."""
    n = 1 << scale
    m = n * deg
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            i = pdf["id"].to_numpy().astype(np.uint64)
            s = np.uint64(seed)
            src = _mix(i * np.uint64(2) + np.uint64(1) + s * np.uint64(0x9E3779B9)) % np.uint64(n)
            dst = _mix(i * np.uint64(2) + np.uint64(2) + s * np.uint64(0x9E3779B9)) % np.uint64(n)
            yield pd.DataFrame({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})

    return spark.range(0, m, 1, partitions).mapInPandas(gen, "src long, dst long")


def rmat_el(
    spark: SparkSession,
    scale: int,
    deg: int = 16,
    seed: int = KRAND_SEED,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    partitions: int | None = None,
) -> DataFrame:
    """R-MAT: recursive quadrant sampling, one uint64 hash per (edge, bit).

    Heavy-tailed degree distribution — the skew-stress generator for the
    salting/AQE paths (hub in-degrees grow like n^log2(1/(a+b))).
    """
    n = 1 << scale
    m = n * deg
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            i = pdf["id"].to_numpy().astype(np.uint64)
            src = np.zeros(len(i), dtype=np.uint64)
            dst = np.zeros(len(i), dtype=np.uint64)
            for bit in range(scale):
                h = _mix(i * np.uint64(scale) + np.uint64(bit) + np.uint64(seed) * np.uint64(0x9E3779B9))
                u = h.astype(np.float64) / 2**64
                src_bit = u >= (a + b)
                dst_bit = np.where(src_bit, u >= (a + b + c), u >= a)
                src = (src << np.uint64(1)) | src_bit.astype(np.uint64)
                dst = (dst << np.uint64(1)) | dst_bit.astype(np.uint64)
            yield pd.DataFrame({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})

    return spark.range(0, m, 1, partitions).mapInPandas(gen, "src long, dst long")


def insert_weights(edges: DataFrame, seed: int = KRAND_SEED) -> DataFrame:
    """Deterministic uniform int weights 1..255 (InsertWeights semantics)."""
    return edges.withColumn(
        "weight",
        (F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(255)) + 1).cast("double"),
    )
