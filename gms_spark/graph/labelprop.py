"""Synchronous label propagation (community detection flavor).

spcl/gms has NO label-propagation kernel (verified by repo-wide search;
SURVEY §2.4) — it is required by the north rule, so these semantics are
pinned here and by the in-repo numpy oracle (tests/oracles.py), making
"labels match exactly" well-defined:

  * init: label[v] = v
  * superstep i: for every vertex v with ≥1 neighbor,
      label'[v] = the most frequent label among N(v)'s labels from the
      PREVIOUS superstep (synchronous), ties broken by SMALLEST label;
    isolated vertices keep their label.
  * run a FIXED number of supersteps (deterministic; asynchronous LP is
    order-dependent and unsuitable for an exact-match contract).

Spark shape: edges ⋈ labels → count per (vertex, label) (partial aggs
absorb hub fan-in) → per-vertex argmax via max_by on a (count, -label)
struct — a single aggregation, no window sort.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gms_spark.graph.build import vertices
from gms_spark.io.tableio import TableIO
from gms_spark.runtime.superstep import iterate


@dataclass
class LabelPropResult:
    labels: DataFrame  # (vertex: long, label: long)
    iterations: int


def label_propagation(
    edges: DataFrame,
    iters: int = 5,
    io: TableIO | None = None,
    run_id: str | None = None,
    hub_salt_threshold: int | None = None,
) -> LabelPropResult:
    """``hub_salt_threshold=k``: degree-aware split of the vote-count
    exchange (skew.py) — groupBy(vertex, label, salt).count →
    groupBy(vertex, label).sum, so a hub's raw edge fan-in spreads over
    ceil(indeg/k) reduce keys. The downstream argmax operates on the
    already-collapsed (vertex, label) rows (≤ distinct neighbor labels
    per vertex), whose surviving partials max_by pre-combines map-side."""
    from gms_spark.graph.build import stage_edges

    edges = stage_edges(edges)  # re-joined every round
    salted: list[str] = []
    if hub_salt_threshold:
        from gms_spark.graph.skew import with_hub_salt

        # re-stage: the salt join must not re-execute per round
        edges = stage_edges(with_hub_salt(edges, hub_salt_threshold))
        salted = ["_salt"]
    verts = vertices(edges)
    labels0 = verts.select("vertex", F.col("vertex").alias("label"))

    def one_round(labels: DataFrame) -> DataFrame:
        nb = edges.join(labels.withColumnRenamed("vertex", "src"), "src").select(
            F.col("dst").alias("vertex"), *salted, "label"
        )
        counts = nb.groupBy("vertex", "label", *salted).agg(F.count("*").alias("cnt"))
        if salted:
            counts = counts.groupBy("vertex", "label").agg(F.sum("cnt").alias("cnt"))
        # argmax by (cnt desc, label asc): max_by over struct(cnt, -label)
        best = counts.groupBy("vertex").agg(
            F.max_by("label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("new_label")
        )
        return labels.join(best, "vertex", "left").select(
            "vertex", F.coalesce(F.col("new_label"), F.col("label")).alias("label")
        )

    if io is None:
        # Fixed iteration count, no durable checkpoint: chain all rounds
        # lazily (plan truncated every 4) — one-ish Spark job total.
        labels = labels0
        for i in range(iters):
            labels = one_round(labels)
            if (i + 1) % 4 == 0 and i + 1 < iters:
                labels = labels.localCheckpoint(eager=True)
        labels = labels.localCheckpoint(eager=True)
        return LabelPropResult(labels, iters)

    def step(labels: DataFrame, i: int) -> tuple[DataFrame, float]:
        return one_round(labels), float("inf")

    res = iterate(labels0, step, max_iters=iters, tol=-1.0, io=io, kernel="labelprop", run_id=run_id)
    return LabelPropResult(res.state, res.iterations)
