"""Streaming near-duplicate detection — the continuous-ingest twin of
the batch MinHash-LSH tier (text/dedup.py minhash_lsh_join).

The training-pipeline shape: a reference corpus is indexed ONCE (banded
MinHash buckets + in-row shingle-hash sets), and the document stream is
flagged against it with a STREAM-STATIC equi-join — Structured
Streaming's stateless join, so there is no state store, no watermark
requirement, and per-micro-batch cost is one bucket join + expression
verify. Everything on both sides is pure column expressions (shingles,
signatures, bands, the exact-Jaccard verify); the streaming plan is the
batch plan.

Stateless-signature policy: the batch tier's shingle DICTIONARY (dense
ids over the corpus vocabulary) is a batch aggregation — a stream row
cannot consult it without a stateful lookup. Here shingles hash
directly: sh = pmod(xxhash64(k-gram), 2^31-1), the same (a*s+b) mod p
LCG minhash on top (shared coefficients with the batch tier), so every
signature is computable from a row alone. Jaccard over hashed shingle
sets equals Jaccard over the dictionary ids except for xxhash64
collisions across a doc pair's vocabulary (~|sh|²/2³¹ — negligible at
document scale, and the verify is still exact over the hashed sets).

Semantics: a (stream doc, corpus doc) pair is emitted iff the pair
collides in ≥1 of the n_bands band buckets AND exact Jaccard of the
hashed shingle sets ≥ threshold. A pair colliding in SEVERAL bands is
emitted once per colliding band (stateless streams cannot deduplicate
across emissions without a state store); compose with
streaming.dedup.stream_dedup on (doc_id, corpus_id) for exactly-once
flags with watermark-bounded state, or .dropDuplicates in batch mode.

At 100 TB: the index is corpus_rows × n_bands slim rows plus one
shingle-hash array per doc — partition/persist it once and every
micro-batch joins against it; bucket skew on the STATIC side is the
same boilerplate-concentration risk as the batch tier (lshguard.py) —
monitor bucket sizes with the same sizing query when indexing a
boilerplate-heavy corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gms_spark.text.dedup import PTOK, _minhash_coeffs


def hashed_shingles(text_col: str = "text", k: int = 3):
    """In-row distinct shingle-hash array — pure expressions, stream-safe.
    Shares the batch tier's shingling expression (text/dedup.gram_array)."""
    from gms_spark.text.dedup import gram_array

    return F.array_distinct(
        F.transform(gram_array(text_col, k), lambda s: F.pmod(F.xxhash64(s), F.lit(PTOK)))
    )


def _with_bands(
    df: DataFrame, id_out: str, num_hashes: int, band_rows: int, k: int, seed: int, text_col: str
) -> DataFrame:
    """(id_out, sh, band, bucket) — one row per band, everything in-row."""
    sh = hashed_shingles(text_col, k)
    d = df.select(F.col("doc_id").alias(id_out), sh.alias("sh")).where(F.size("sh") > 0)
    mins = [
        F.array_min(
            F.transform(F.col("sh"), lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(PTOK))
        ).alias(f"m{j}")
        for j, (a, b) in enumerate(_minhash_coeffs(num_hashes, seed))
    ]
    d = d.select(id_out, "sh", *mins)
    n_bands = num_hashes // band_rows
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"m{b * band_rows + i}") for i in range(band_rows)]).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return d.select(id_out, "sh", F.explode(bands).alias("_bb")).select(
        id_out, "sh", F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket")
    )


def near_dup_index(
    corpus: DataFrame,
    num_hashes: int = 24,
    band_rows: int = 2,
    k: int = 3,
    seed: int = 7,
    text_col: str = "text",
) -> DataFrame:
    """Static index over the reference corpus: (corpus_id, sh, band,
    bucket). Build once, persist, hand to stream_near_dup_pairs —
    every micro-batch joins against it."""
    return _with_bands(corpus, "corpus_id", num_hashes, band_rows, k, seed, text_col)


def stream_near_dup_pairs(
    stream: DataFrame,
    index: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 24,
    band_rows: int = 2,
    k: int = 3,
    seed: int = 7,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, corpus_id, jaccard) for stream docs near-duplicating the
    indexed corpus — stateless stream-static LSH join + exact verify.

    Works identically on a batch DataFrame (the batch twin used by the
    equality tests); ``index`` must come from near_dup_index with the
    same (num_hashes, band_rows, k, seed)."""
    sb = _with_bands(stream, "doc_id", num_hashes, band_rows, k, seed, text_col).withColumnRenamed(
        "sh", "sh_s"
    )
    joined = sb.join(index.withColumnRenamed("sh", "sh_c"), ["band", "bucket"])
    inter = F.size(F.array_intersect("sh_s", "sh_c"))
    un = F.size("sh_s") + F.size("sh_c") - inter
    return (
        joined.select(
            "doc_id",
            "corpus_id",
            F.round(inter / F.greatest(un, F.lit(1)), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
