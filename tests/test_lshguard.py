"""LSH bucket-size guard: identical pair sets under ANY cap, bounded
per-task volume on boilerplate-heavy (skewed) fixtures, never silent.

The guard (gms_spark/lshguard.py) is the 100 TB defense for the three
banded-LSH tiers: MinHash (text/dedup.py), SimHash (text/dedup.py) and
hyperplane LSH (sim/ann.py). Its contract is *plan-shape only*: the
output pair set must be bit-identical to the naive (band, bucket)
self-join for every cap, while an over-cap bucket's B² candidate volume
is spread over ceil(B/cap)² join cells."""

from __future__ import annotations

import logging

import numpy as np
import pytest

import pyspark.sql.functions as F

from gms_spark.lshguard import capped_bucket_pairs, salted_bucket_join


def _naive_pairs(bdf):
    x = bdf.select(F.col("doc_id").alias("a"), "band", "bucket")
    y = bdf.select(F.col("doc_id").alias("b"), "band", "bucket")
    return {
        (r["a"], r["b"])
        for r in x.join(y, ["band", "bucket"]).where(F.col("a") < F.col("b")).collect()
    }


@pytest.fixture(scope="module")
def skewed_membership(spark):
    """2 bands; band 0 has one 40-row boilerplate bucket + small ones;
    band 1 scatters the same ids differently (cross-band dup pressure)."""
    rows = []
    for i in range(60):
        rows.append((i, 0, 7 if i < 40 else i % 5))  # 40-row hot bucket
        rows.append((i, 1, i % 9))
    return spark.createDataFrame(rows, "doc_id long, band int, bucket long").persist()


@pytest.mark.parametrize("cap", [1, 3, 7, 1000])
def test_capped_pairs_identical_for_any_cap(spark, skewed_membership, cap):
    got = {
        (r["a"], r["b"])
        for r in capped_bucket_pairs(skewed_membership, "doc_id", ["band", "bucket"], cap=cap)
        .distinct()
        .collect()
    }
    assert got == _naive_pairs(skewed_membership)


def test_capped_pairs_with_probes_identical(spark, skewed_membership):
    """Probe rows (one-directional memberships) must pair with originals
    of the same bucket — and the guard must preserve that set exactly."""
    probes = spark.createDataFrame(
        [(100 + i, 0, 7) for i in range(5)] + [(0, 0, 2), (1, 1, 3)],
        "doc_id long, band int, bucket long",
    )
    naive = _naive_pairs(skewed_membership)
    po = probes.select(F.col("doc_id").alias("pa"), "band", "bucket")
    orig = skewed_membership.select(F.col("doc_id").alias("pb"), "band", "bucket")
    naive |= {
        (min(r["pa"], r["pb"]), max(r["pa"], r["pb"]))
        for r in po.join(orig, ["band", "bucket"]).where(F.col("pa") != F.col("pb")).collect()
    }
    for cap in (2, 1000):
        got = {
            (r["a"], r["b"])
            for r in capped_bucket_pairs(
                skewed_membership, "doc_id", ["band", "bucket"], cap=cap, probe_df=probes
            )
            .distinct()
            .collect()
        }
        assert got == naive, cap


def test_block_sizes_bounded(spark, skewed_membership):
    """The hot 40-row bucket at cap=4 splits into 10 hash-blocks; no
    block may exceed a small multiple of cap (hash imbalance slack), so
    no join cell exceeds ~(slack·cap)² candidates."""
    cap = 4
    hot = skewed_membership.where((F.col("band") == 0) & (F.col("bucket") == 7))
    nb = int(np.ceil(hot.count() / cap))
    blocks = (
        hot.withColumn("_blk", F.pmod(F.xxhash64("doc_id", F.lit(0)), F.lit(nb)))
        .groupBy("_blk")
        .count()
        .collect()
    )
    assert len(blocks) > 1
    assert max(r["count"] for r in blocks) <= 3 * cap


def test_guard_logs_when_engaged(spark, skewed_membership, caplog):
    with caplog.at_level(logging.WARNING, logger="gms_spark.lshguard"):
        capped_bucket_pairs(skewed_membership, "doc_id", ["band", "bucket"], cap=4).count()
    assert any("bucket cap 4 engaged" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="gms_spark.lshguard"):
        capped_bucket_pairs(skewed_membership, "doc_id", ["band", "bucket"], cap=1000).count()
    assert not caplog.records  # silent when nothing was capped


def test_salted_bucket_join_identical(spark):
    corpus = spark.createDataFrame(
        [(i, 7 if i < 30 else i % 4) for i in range(40)], "vec_id long, bucket long"
    )
    queries = spark.createDataFrame([(100, 7), (101, 2), (102, 7), (103, 99)], "query_id long, bucket long")
    naive = {
        (r["query_id"], r["vec_id"]) for r in queries.join(corpus, "bucket").collect()
    }
    for cap in (2, 1000):
        got = {
            (r["query_id"], r["vec_id"])
            for r in salted_bucket_join(corpus, queries, ["bucket"], "vec_id", cap=cap).collect()
        }
        assert got == naive, cap


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """40 near-identical boilerplate docs (one shared template, tiny
    suffix edits) + 20 distinct docs: every LSH tier concentrates the
    template docs into hot buckets."""
    tmpl = "terms of service all rights reserved contact us privacy policy cookie notice " * 3
    rows = [(i, tmpl + f"page {i % 4}") for i in range(40)]
    rows += [(40 + i, f"unique document {i} " + " ".join(f"w{i}x{j}" for j in range(20))) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_minhash_guard_same_pairs_and_logged(spark, boilerplate_docs, caplog):
    from gms_spark.text.dedup import minhash_lsh_join

    base = {
        (r["a"], r["b"], r["jaccard"])
        for r in minhash_lsh_join(boilerplate_docs, 0.5, bucket_cap=10**9).collect()
    }
    assert base  # the boilerplate block must produce near-dups at all
    with caplog.at_level(logging.WARNING, logger="gms_spark.lshguard"):
        capped = {
            (r["a"], r["b"], r["jaccard"])
            for r in minhash_lsh_join(boilerplate_docs, 0.5, bucket_cap=4).collect()
        }
    assert capped == base
    assert any("engaged" in r.message for r in caplog.records)


def test_simhash_guard_same_pairs(spark, boilerplate_docs):
    from gms_spark.text.dedup import simhash_near_dup

    base = {
        (r["a"], r["b"], r["jaccard"])
        for r in simhash_near_dup(boilerplate_docs, 0.5, bucket_cap=10**9).collect()
    }
    capped = {
        (r["a"], r["b"], r["jaccard"])
        for r in simhash_near_dup(boilerplate_docs, 0.5, bucket_cap=4).collect()
    }
    assert capped == base and base


def test_near_dup_lsh_guard_same_pairs(spark):
    from gms_spark.sim.ann import near_dup_lsh

    rng = np.random.default_rng(3)
    base_vec = rng.normal(size=8)
    rows = []
    for i in range(30):  # 30 near-copies of one embedding — one hot bucket
        v = base_vec + rng.normal(scale=0.01, size=8)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    for i in range(20):
        v = rng.normal(size=8)
        rows.append((30 + i, (v / np.linalg.norm(v)).astype(float).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()
    base = {
        (r["a"], r["b"], r["cos"]) for r in near_dup_lsh(corpus, 0.8, bucket_cap=10**9).collect()
    }
    capped = {
        (r["a"], r["b"], r["cos"]) for r in near_dup_lsh(corpus, 0.8, bucket_cap=3).collect()
    }
    assert capped == base and len(base) >= 30 * 29 / 4  # hot cluster found


def test_lsh_topk_guard_same_results(spark):
    from gms_spark.sim.ann import lsh_topk

    rng = np.random.default_rng(5)
    corpus = spark.createDataFrame(
        [(i, (v / np.linalg.norm(v)).astype(float).tolist()) for i, v in enumerate(rng.normal(size=(50, 8)))],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, (v / np.linalg.norm(v)).astype(float).tolist()) for i, v in enumerate(rng.normal(size=(5, 8)))],
        "query_id long, qvec array<float>",
    )
    base = {
        (r["query_id"], r["vec_id"], r["cos"])
        for r in lsh_topk(corpus, queries, k=5, bucket_cap=10**9).collect()
    }
    capped = {
        (r["query_id"], r["vec_id"], r["cos"])
        for r in lsh_topk(corpus, queries, k=5, bucket_cap=2).collect()
    }
    assert capped == base and base


def test_probe_concentration_capped_and_identical(spark, skewed_membership):
    """Many probe rows on a bucket whose ORIGINALS are under cap (the
    Hamming-1 fan-in shape): the bipartite grid must engage (probe side
    over cap), bound the blocks, and keep the pair set identical."""
    # bucket (1, 3) holds ~7 originals (i % 9 == 3); aim 30 probes at it
    probes = spark.createDataFrame(
        [(200 + i, 1, 3) for i in range(30)], "doc_id long, band int, bucket long"
    )
    po = probes.select(F.col("doc_id").alias("pa"), "band", "bucket")
    orig = skewed_membership.select(F.col("doc_id").alias("pb"), "band", "bucket")
    naive = _naive_pairs(skewed_membership) | {
        (min(r["pa"], r["pb"]), max(r["pa"], r["pb"]))
        for r in po.join(orig, ["band", "bucket"]).where(F.col("pa") != F.col("pb")).collect()
    }
    for cap in (5, 1000, 10**6):
        got = {
            (r["a"], r["b"])
            for r in capped_bucket_pairs(
                skewed_membership, "doc_id", ["band", "bucket"], cap=cap, probe_df=probes
            )
            .distinct()
            .collect()
        }
        assert got == naive, cap


def test_probe_concentration_engages_guard(spark, skewed_membership, caplog):
    """Probe-side over-cap alone (originals all under cap) must flip the
    plan off the fast path — an originals-only gate would leave a P x cap
    single-task join."""
    small = skewed_membership.where((F.col("band") == 1))  # all band-1 buckets <= 7 rows
    probes = spark.createDataFrame(
        [(300 + i, 1, 3) for i in range(25)], "doc_id long, band int, bucket long"
    )
    with caplog.at_level(logging.WARNING, logger="gms_spark.lshguard"):
        capped_bucket_pairs(small, "doc_id", ["band", "bucket"], cap=8, probe_df=probes).count()
    assert any("engaged" in r.message for r in caplog.records)


def test_salted_join_query_concentration_identical(spark):
    """Query multiplicity over cap on an under-cap corpus bucket: the
    two-sided grid must engage and produce identical rows."""
    corpus = spark.createDataFrame(
        [(i, 7 if i < 5 else i % 4) for i in range(20)], "vec_id long, bucket long"
    )
    queries = spark.createDataFrame(
        [(100 + i, 7) for i in range(30)] + [(900, 2)], "query_id long, bucket long"
    )
    naive = {(r["query_id"], r["vec_id"]) for r in queries.join(corpus, "bucket").collect()}
    for cap in (3, 1000):
        got = {
            (r["query_id"], r["vec_id"])
            for r in salted_bucket_join(corpus, queries, ["bucket"], "vec_id", cap=cap).collect()
        }
        assert got == naive, cap
