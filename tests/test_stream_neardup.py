"""Streaming near-dup (streaming/neardup.py): stream-vs-batch equality
and an independent brute-force oracle for the flag semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from gms_spark.streaming.neardup import hashed_shingles, near_dup_index, stream_near_dup_pairs

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "terms of service all rights reserved contact us privacy policy"),
    (2, "completely unrelated corpus document about graph mining kernels"),
]
STREAM = [
    (100, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
    (101, "terms of service all rights reserved contact us privacy notice"),  # near-dup of 1
    (102, "fresh unseen content with no overlap whatsoever in any shingle"),
    (103, "graph mining kernels completely unrelated corpus document about"),  # shuffled 2
]


def _pairs(df):
    return {(r["doc_id"], r["corpus_id"], r["jaccard"]) for r in df.collect()}


def test_batch_flags_match_bruteforce_oracle(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    docs = spark.createDataFrame(STREAM, "doc_id long, text string")
    idx = near_dup_index(corpus).persist()
    got = _pairs(stream_near_dup_pairs(docs, idx, threshold=0.5).dropDuplicates())

    # oracle: brute-force cross join; candidate iff >=1 shared band
    # bucket, flagged iff exact jaccard of hashed shingle sets >= t
    sh = hashed_shingles("text", 3)
    s = docs.select(F.col("doc_id"), sh.alias("sh_s"))
    c = corpus.select(F.col("doc_id").alias("corpus_id"), sh.alias("sh_c"))
    bands_s = near_dup_index(docs).bands.groupBy(F.col("corpus_id").alias("doc_id")).agg(
        F.collect_set(F.struct("band", "bucket")).alias("bb_s")
    )
    bands_c = near_dup_index(corpus).bands.groupBy("corpus_id").agg(
        F.collect_set(F.struct("band", "bucket")).alias("bb_c")
    )
    inter = F.size(F.array_intersect("sh_s", "sh_c"))
    un = F.size("sh_s") + F.size("sh_c") - inter
    oracle = (
        s.crossJoin(c)
        .join(bands_s, "doc_id")
        .join(bands_c, "corpus_id")
        .where(F.size(F.array_intersect("bb_s", "bb_c")) > 0)
        .select("doc_id", "corpus_id", F.round(inter / F.greatest(un, F.lit(1)), 6).alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )
    want = _pairs(oracle)
    idx.unpersist()
    assert got == want
    ids = {d for d, _, _ in got}
    assert 100 in ids and 101 in ids and 102 not in ids  # exact dup, near-dup, fresh


def test_stream_matches_batch(spark, tmp_path):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    docs = spark.createDataFrame(STREAM, "doc_id long, text string")
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    idx = near_dup_index(corpus).persist()
    idx.count()

    batch_pairs = _pairs(stream_near_dup_pairs(spark.read.parquet(src), idx).dropDuplicates())

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = stream_near_dup_pairs(stream, idx)
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_pairs = _pairs(spark.sql("SELECT DISTINCT * FROM neardup_stream"))
    idx.unpersist()
    assert stream_pairs == batch_pairs and batch_pairs


def test_index_guard_bounds_bucket_cells(spark):
    """Boilerplate concentration: 40 corpus docs sharing one band
    signature must not form a single B-row bucket cell. With cap=8 the
    index pre-splits the bucket into ceil(40/8)=5 salt blocks (≤8 corpus
    rows per (band,bucket,salt) cell), the stream probe explodes over
    the salt range, and the flagged pair set is IDENTICAL to an
    unguarded (cap=10^9) run."""
    boiler = [(i, "terms of service all rights reserved contact us privacy policy") for i in range(40)]
    corpus = spark.createDataFrame(boiler + CORPUS[2:], "doc_id long, text string")
    docs = spark.createDataFrame(STREAM, "doc_id long, text string")

    idx = near_dup_index(corpus, bucket_cap=8).persist()
    idx.count()
    # every (band, bucket, _salt) cell is bounded near the cap — the
    # block id is a uniform hash (≈B/nb rows per block in expectation,
    # not a worst-case partition), so allow 2×cap; the unguarded cell
    # would hold all 40 rows
    cell_max = (
        idx.bands.groupBy("band", "bucket", "_salt").count().agg(F.max("count")).first()[0]
    )
    assert cell_max <= 16 < 40
    # the boilerplate bucket really is over-cap (guard engaged, 5 blocks)
    assert idx.blocks.where(F.col("_nb") == 5).count() > 0
    # shingle arrays are stored once per doc, not once per band row
    assert idx.shingles.count() == corpus.count()
    got = _pairs(stream_near_dup_pairs(docs, idx, threshold=0.5).dropDuplicates())

    unguarded = near_dup_index(corpus, bucket_cap=1 << 30).persist()
    want = _pairs(stream_near_dup_pairs(docs, unguarded, threshold=0.5).dropDuplicates())
    idx.unpersist()
    unguarded.unpersist()
    assert got == want and want  # same pairs, and the fixture does flag
