"""Degree-aware skew handling: high-degree vertex splitting via salting.

Web graphs are Zipf-skewed: a handful of hub vertices receive a large
fraction of all edges (R-MAT/Graph500 hub in-degrees grow like
n^log2(1/(a+b)) — generators.py:69). In any gather step that aggregates
per destination (PageRank SpMV, hash-min components, label votes), every
contribution to a hub lands on ONE reduce key in ONE shuffle partition.
Map-side partial aggregation caps what survives the shuffle at
(#map partitions) rows per hub — fine at local[32], but on a
1000-executor cluster the surviving partials for the hottest hubs still
concentrate on single reducers: the classic aggregation straggler.

The explicit fix is two-stage aggregation with *degree-aware* salting:
split each hub key into ceil(degree / threshold) salt buckets keyed by
(key, _salt), aggregate partials per bucket, then re-aggregate the few
bucket rows per vertex. Only vertices whose degree on the aggregation
key exceeds the threshold are split — low-degree keys keep salt 0 and
pay nothing extra — so the second-stage exchange carries ~n rows. The
salt is computed ONCE on the static edge side (a deterministic pmod of
the contributing vertex id), never per iteration.

AQE's skew-join splitting (on in session.py) re-balances the JOIN side
at runtime; this utility covers the AGGREGATION side, which AQE does not
re-plan (a hash aggregate's key→partition mapping is fixed at shuffle
time). Consumed by ``pagerank(hub_salt_threshold=...)``; the same table
shape drops into any per-destination gather (components, labelprop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hub_split_counts(edges: DataFrame, threshold: int, key: str = "dst") -> DataFrame:
    """(key, _nsalt) for vertices whose edge count on ``key`` exceeds
    ``threshold``; _nsalt = ceil(count / threshold) buckets. At most
    m/threshold rows by construction — always broadcastable."""
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    return (
        edges.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .where(F.col("_cnt") > threshold)
        .select(key, F.ceil(F.col("_cnt") / F.lit(float(threshold))).cast("int").alias("_nsalt"))
    )


def with_hub_salt(
    edges: DataFrame,
    threshold: int,
    key: str = "dst",
    spread: str = "src",
    counts_from: DataFrame | None = None,
) -> DataFrame:
    """Add an int ``_salt`` column to an edge(-like) table: 0 for rows
    whose ``key`` vertex has ≤ threshold edges, else a deterministic
    pmod(``spread``, n_buckets) spreading the hub's rows across
    ceil(degree/threshold) buckets. Broadcast join against the (small)
    hub list, so the input's partitioning is preserved.

    ``counts_from``: count key degrees on this table instead of
    ``edges`` — pass the cheapest same-edge-set table (e.g. the staged
    raw edges when ``edges`` carries an expensive derived plan)."""
    hubs = hub_split_counts(counts_from if counts_from is not None else edges, threshold, key)
    return (
        edges.join(F.broadcast(hubs), key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_nsalt").isNotNull(), F.pmod(F.col(spread), F.col("_nsalt"))
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("_nsalt")
    )
