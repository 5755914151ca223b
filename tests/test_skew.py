"""Degree-aware hub splitting (gms_spark/graph/skew.py).

The north rule requires skew from hub vertices to be handled explicitly
via degree-aware salting / high-degree vertex splitting. These tests pin
the two contracts: (1) the split is degree-aware — only over-threshold
keys are salted, every (key, salt) bucket holds ≤ threshold rows, and
the salt is a deterministic function of the static edge table; (2) the
salted two-stage PageRank gather is numerically the same fixpoint as the
plain gather.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gms_spark.graph.skew import hub_split_counts, with_hub_salt


def _star_plus_path(spark, spokes: int = 500, path_len: int = 40):
    """Hub vertex 0 with `spokes` in-edges plus a low-degree path —
    one pathological key, many normal ones."""
    star = [(i, 0) for i in range(1, spokes + 1)]
    path = [(i, i + 1) for i in range(1, path_len)]
    return spark.createDataFrame(star + path, "src long, dst long")


def test_hub_split_counts_only_over_threshold(spark):
    edges = _star_plus_path(spark, spokes=500)
    hubs = {r["dst"]: r["_nsalt"] for r in hub_split_counts(edges, 100).collect()}
    assert hubs == {0: 5}  # ceil(500/100); no path vertex exceeds 100


def test_with_hub_salt_bucket_bound_and_determinism(spark):
    edges = _star_plus_path(spark, spokes=500)
    salted = with_hub_salt(edges, 100).persist()
    # every (dst, salt) bucket holds <= threshold rows
    worst = (
        salted.groupBy("dst", "_salt").count().agg(F.max("count")).first()[0]
    )
    assert worst <= 100
    # the hub's rows actually spread across all 5 buckets
    assert salted.where(F.col("dst") == 0).select("_salt").distinct().count() == 5
    # non-hub rows keep salt 0
    assert salted.where((F.col("dst") != 0) & (F.col("_salt") != 0)).count() == 0
    # deterministic: salt is pmod(src, 5) for hub rows
    bad = salted.where(
        (F.col("dst") == 0) & (F.col("_salt") != F.pmod(F.col("src"), F.lit(5)))
    ).count()
    assert bad == 0
    salted.unpersist()


def test_hub_split_counts_rejects_bad_threshold(spark):
    edges = _star_plus_path(spark, spokes=10)
    with pytest.raises(ValueError):
        hub_split_counts(edges, 0)


def test_pagerank_salted_matches_plain(spark):
    from gms_spark.graph.build import build_undirected
    from gms_spark.graph.pagerank import pagerank

    und = build_undirected(_star_plus_path(spark, spokes=300)).persist()
    plain = pagerank(und, fixed_iters=6, check_every=3).scores
    salted = pagerank(und, fixed_iters=6, check_every=3, hub_salt_threshold=64).scores
    diff = (
        plain.join(salted.withColumnRenamed("score", "s2"), "vertex", "full")
        .agg(F.max(F.abs(F.col("score") - F.col("s2"))))
        .first()[0]
    )
    # two-stage summation reorders float adds; fixpoint is the same
    assert diff is not None and diff < 1e-12
    und.unpersist()


def test_components_and_labelprop_salted_bit_identical(spark):
    """min and count decompose exactly — salted results must be
    row-identical, not just close."""
    from gms_spark.graph.build import build_undirected
    from gms_spark.graph.components import connected_components
    from gms_spark.graph.labelprop import label_propagation

    # short path: the salt-equivalence property is per-round algebra, so
    # a diameter-12 path exercises it as fully as diameter-40 at a third
    # of the superstep count
    und = build_undirected(_star_plus_path(spark, spokes=300, path_len=12)).persist()

    plain_cc = connected_components(und).components
    salted_cc = connected_components(und, hub_salt_threshold=64).components
    assert plain_cc.exceptAll(salted_cc).count() == 0
    assert salted_cc.exceptAll(plain_cc).count() == 0

    plain_lp = label_propagation(und, iters=3).labels
    salted_lp = label_propagation(und, iters=3, hub_salt_threshold=64).labels
    assert plain_lp.exceptAll(salted_lp).count() == 0
    assert salted_lp.exceptAll(plain_lp).count() == 0
    und.unpersist()
