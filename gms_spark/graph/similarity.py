"""Vertex similarity (7 metrics) + top-q link prediction.

Semantics from gms/algorithms/set_based/vertex_similarity/vertex_similarity.h:
  jaccard        c / (|A| + |B| + c)        — the GMS quirk (line 35):
                                              NOT c/|A∪B|; preserved
                                              bit-for-bit, with the
                                              textbook one exposed too
  overlap        c / min(|A|, |B|)           (:64-66)
  adamic_adar    Σ_{w∈A∩B} 1/log(deg w)      (:95-106)
  resource_alloc Σ_{w∈A∩B} 1/deg w           (:118-126)
  common_neigh   c                           (:138-141)
  total_neigh    |A ∪ B|                     (:153-156)
  pref_attach    |A| · |B|                   (:168-187)

Spark shape: NO neighborhood arrays — the common-neighbor count is a
pure relational plan (edges ⋈ edges on the shared endpoint, groupBy
pair), so Catalyst/AQE own the shuffle and hub rows partial-aggregate
map-side. Degree-weighted sums ride the same join.

Link prediction (gms/algorithms/set_based/link_prediction/link_prediction.h:42-101):
score all candidate non-edges, keep top-q. The reference scans all
non-edges serially; at web scale only 2-hop pairs can score > 0 for the
local metrics, so the candidate set IS the 2-hop join (documented
deviation; identical result set for c>0 scorers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gms_spark.graph.build import degrees


def _pair_stats(edges: DataFrame, pairs: DataFrame) -> DataFrame:
    """pairs(a,b) + (c, aa, ra, deg_a, deg_b) via relational plans only.

    ``edges`` must be staged by the caller (it is scanned by the
    common-neighbor join twice). The degree table is materialized once —
    it feeds three join sides, and left lazy each would re-run the
    groupBy over the full edge set."""
    deg = degrees(edges).localCheckpoint(eager=True)
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("w"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("w"))
    common = (
        pairs.join(e1, "a")
        .join(e2, ["b", "w"])
        .join(deg.select(F.col("vertex").alias("w"), F.col("degree").alias("deg_w")), "w")
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("c"),
            F.sum(1.0 / F.log("deg_w")).alias("aa"),
            F.sum(1.0 / F.col("deg_w")).alias("ra"),
        )
    )
    da = deg.select(F.col("vertex").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("vertex").alias("b"), F.col("degree").alias("deg_b"))
    return (
        pairs.join(common, ["a", "b"], "left")
        .join(da, "a", "left")
        .join(db, "b", "left")
        .fillna(0, ["c", "deg_a", "deg_b"])
        .fillna(0.0, ["aa", "ra"])
    )


def vertex_similarity(edges: DataFrame, pairs: DataFrame | None = None) -> DataFrame:
    """All 7 GMS metrics per pair; default pairs = the graph's edges a<b."""
    from gms_spark.graph.build import stage_edges

    # the edge table feeds the pair projection, both common-neighbor join
    # sides and the degree table — an unstaged (lazy) graph build would
    # re-execute once per reference inside the one similarity job
    edges = stage_edges(edges)
    if pairs is None:
        pairs = edges.where(F.col("src") < F.col("dst")).select(
            F.col("src").alias("a"), F.col("dst").alias("b")
        )
    s = _pair_stats(edges, pairs)
    return s.select(
        "a",
        "b",
        F.col("c").alias("common_neighbors"),
        F.round(F.col("c") / (F.col("deg_a") + F.col("deg_b") + F.col("c")), 6).alias("jaccard_gms"),
        F.round(F.col("c") / (F.col("deg_a") + F.col("deg_b") - F.col("c")), 6).alias("jaccard_textbook"),
        F.round(F.col("c") / F.least("deg_a", "deg_b"), 6).alias("overlap"),
        F.round("aa", 6).alias("adamic_adar"),
        F.round("ra", 6).alias("resource_alloc"),
        (F.col("deg_a") + F.col("deg_b") - F.col("c")).alias("total_neighbors"),
        (F.col("deg_a") * F.col("deg_b")).alias("pref_attachment"),
    )


def link_prediction_topq(edges: DataFrame, q: int = 20, metric: str = "adamic_adar") -> DataFrame:
    """Top-q non-edges by similarity score (deterministic tie-break a,b).

    Candidates: 2-hop pairs (complete for any common-neighbor-based
    metric — anything else scores 0). Anti-join removes existing edges.
    """
    from gms_spark.graph.build import stage_edges

    edges = stage_edges(edges)  # ~8 references across candidates + scoring
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("w"))
    e2 = edges.select(F.col("dst").alias("b"), F.col("src").alias("w"))
    cands = (
        e1.join(e2, "w")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .join(
            edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
            "left_anti",
        )
    )
    scored = vertex_similarity(edges, cands)
    col = {
        "adamic_adar": "adamic_adar",
        "common_neighbors": "common_neighbors",
        "jaccard_gms": "jaccard_gms",
        "resource_alloc": "resource_alloc",
    }[metric]
    # Round BEFORE ranking: float sums reduce in different orders on
    # different partitionings/engines; a 6-dp rank key + (a,b) tie-break
    # makes the top-q deterministic and oracle-comparable.
    return (
        scored.select("a", "b", F.round(F.col(col), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
        .limit(q)
    )
