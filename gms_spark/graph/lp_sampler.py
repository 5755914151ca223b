"""LP edge sampler — the reference's EdgeSampler semantics, distributed.

Reference (gms/algorithms/set_based/link_prediction/edge_sampler.h:24-155):
  sample()            — uniform over DIRECTED edge slots via the
                        cumulative-degree array (each undirected edge
                        holds two slots → uniform over undirected
                        edges); slot offset indexes into the sorted
                        neighborhood; result normalized to (min, max).
  sample_complement() — vertex u w.p. ∝ (n − deg(u)) via the cumulative
                        complement-degree array, then the offset-th
                        element of u's complement. The complement of u
                        INCLUDES u itself (no self-loops ⇒ u ∉ N(u)) —
                        reference quirk preserved: a sampled "non-edge"
                        can be a self-pair.

Determinism contract: the reference draws from std RNG; this engine
replaces it with seeded modular arithmetic over the draw index
(engine-agnostic int64 ops), so a DuckDB oracle replicates every sample
bit-for-bit — same policy as the MinHash coefficients.

Scale shape: the cumulative arrays become a (vertex, lo, hi) range table
built with the same per-partition-offsets trick as assign_dense_ids (no
single-partition window, no driver data); the k draws are tiny and
broadcast against it (BroadcastNestedLoopJoin — O(n·k) predicate checks
split across partitions, the right plan when k ≪ n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gms_spark.graph.build import adjacency, vertices

P31 = 2147483647
DRAW_A, DRAW_B = 1103515245, 12345


def _draws(spark, k: int, total: int, seed: int) -> DataFrame:
    """k deterministic draw targets t ∈ [0, total)."""
    return spark.range(k).select(
        F.col("id").alias("draw"),
        (((F.col("id") * DRAW_A + F.lit(seed) * DRAW_B + 7) % P31) % F.lit(total)).alias("t"),
    )


def prefix_ranges(weighted: DataFrame, vertex_col: str = "vertex", weight_col: str = "w") -> DataFrame:
    """(vertex, w, …) → (vertex, …, lo, hi): exclusive/inclusive running
    sums in vertex-id order — distributed prefix sum (range-repartition,
    per-partition totals broadcast as offsets, Arrow cumsum per batch)."""
    spark = weighted.sparkSession
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        weighted.repartitionByRange(num_partitions, F.col(vertex_col).asc())
        .sortWithinPartitions(F.col(vertex_col).asc())
        .withColumn("_pid", F.spark_partition_id())
    ).persist()
    sums = {int(r["_pid"]): int(r["s"]) for r in ranged.groupBy("_pid").agg(F.sum(weight_col).alias("s")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)
    out_schema = ranged.drop("_pid").schema.add("lo", "long").add("hi", "long")

    def add_ranges(iterator):
        pos = 0
        base = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if base is None:
                base = b_offsets.value[int(pdf["_pid"].iloc[0])]
            w = pdf[weight_col].to_numpy()
            hi = w.cumsum() + base + pos
            out = pdf.drop(columns=["_pid"]).copy()
            out["lo"] = hi - w
            out["hi"] = hi
            pos += int(w.sum())
            yield out

    # materialize the result so the intermediate cache can be released
    # here (no caller-must-unpersist contract to honor)
    out = ranged.mapInPandas(add_ranges, out_schema).localCheckpoint(eager=True)
    ranged.unpersist()
    return out


def sample_edges(edges: DataFrame, k: int, seed: int = 29) -> DataFrame:
    """k uniform draws over undirected edges: (draw, a, b) with a<=b.

    Uniform over directed slots ≡ uniform over undirected edges (two
    slots each); with replacement, like repeated reference sample().
    """
    spark = edges.sparkSession
    adj = adjacency(edges)  # (src, sorted neigh)
    weighted = adj.select(F.col("src").alias("vertex"), F.size("neigh").cast("long").alias("w"), "neigh")
    ranges = prefix_ranges(weighted)
    total = int(edges.count())
    draws = _draws(spark, k, total, seed)
    hit = ranges.join(F.broadcast(draws), (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
    v = F.element_at("neigh", (F.col("t") - F.col("lo") + 1).cast("int"))
    return hit.select(
        "draw",
        F.least(F.col("vertex"), v).alias("a"),
        F.greatest(F.col("vertex"), v).alias("b"),
    )


def sample_complement_edges(edges: DataFrame, k: int, seed: int = 31) -> DataFrame:
    """k draws over the complement: (draw, a, b), u w.p. ∝ n − deg(u).

    The offset-th complement element is found by the reference's skip
    loop (for nb in sorted N(u): if nb <= v: v += 1) — expressed as a
    sequential JVM-side fold over the sorted neighbor array. Complement
    includes u itself (reference quirk; a=b possible).

    PRECONDITION: vertex ids must be DENSE 0..n-1 (the reference's CSR
    id space, edge_sampler.h:24-155) — the skip fold walks the integer
    line, so an id gap would let it emit a non-existent vertex.
    Verified here; route sparse inputs through
    ``build.assign_dense_ids`` / ``squish`` first.
    """
    spark = edges.sparkSession
    row = vertices(edges).agg(F.count("*").alias("n"), F.max("vertex").alias("mx")).first()
    n = int(row["n"])
    if n and int(row["mx"]) != n - 1:
        raise ValueError(
            f"sample_complement_edges requires dense vertex ids 0..n-1 "
            f"(got n={n}, max id={row['mx']}); relabel via assign_dense_ids first"
        )
    adj = adjacency(edges)
    weighted = adj.select(
        F.col("src").alias("vertex"), (F.lit(n) - F.size("neigh")).cast("long").alias("w"), "neigh"
    )
    ranges = prefix_ranges(weighted)
    total = int(weighted.agg(F.sum("w")).first()[0])
    draws = _draws(spark, k, total, seed)
    hit = ranges.join(F.broadcast(draws), (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
    offset = (F.col("t") - F.col("lo")).cast("long")
    v = F.aggregate("neigh", offset, lambda acc, nb: F.when(nb <= acc, acc + 1).otherwise(acc))
    return hit.select(
        "draw",
        F.least(F.col("vertex"), v).alias("a"),
        F.greatest(F.col("vertex"), v).alias("b"),
    )
