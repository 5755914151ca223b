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

At 100 TB: the index is corpus_rows × n_bands SLIM band rows plus ONE
shingle-hash array per doc (NearDupIndex.bands / .shingles) —
partition/persist it once and every micro-batch joins against it.
Bucket skew on the static side — the batch tier's boilerplate-
concentration risk (lshguard.py) — is capped at INDEX TIME: bucket
sizes are a property of the corpus, so over-cap buckets are pre-split
into ceil(B/cap) salt blocks and each micro-batch probe explodes over
its bucket's salt range (stateless; the per-batch sizing job the batch
guard runs is never needed). Residual risk is stream-side only: a
micro-batch that itself concentrates S probes on one bucket still pays
S × cap rows on that key — bound S by trigger sizing, which is the
stream operator's admission knob.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gms_spark.text.dedup import PTOK, _minhash_coeffs

logger = logging.getLogger("gms_spark.streaming.neardup")


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


@dataclass
class NearDupIndex:
    """Static corpus index for the streaming near-dup join.

    ``bands``:    (corpus_id, band, bucket, _salt) — SLIM band
                  memberships (no shingle arrays), with over-cap buckets
                  split into ``ceil(B/cap)`` deterministic salt blocks
                  at INDEX TIME — the lshguard cap for the one LSH join
                  whose stats job cannot run per micro-batch (bucket
                  sizes are a property of the static side, frozen here).
    ``shingles``: (corpus_id, sh) — the verify-side shingle-hash array,
                  stored ONCE per doc (the pre-r6 index duplicated it
                  per band row: n_bands× the array bytes in every
                  bucket-join task).
    ``blocks``:   (band, bucket, _nb) for over-cap buckets only; the
                  stream side explodes its probe row over 0.._nb-1 so a
                  probe meets every salt block of its bucket.
    ``cap``:      the per-(band,bucket,salt) corpus-row bound.
    """

    bands: DataFrame
    shingles: DataFrame
    blocks: DataFrame
    cap: int

    def persist(self) -> "NearDupIndex":
        self.bands.persist()
        self.shingles.persist()
        self.blocks.persist()
        return self

    def count(self) -> int:
        n = self.bands.count()
        self.shingles.count()
        self.blocks.count()
        return n

    def unpersist(self) -> "NearDupIndex":
        self.bands.unpersist()
        self.shingles.unpersist()
        self.blocks.unpersist()
        return self


def near_dup_index(
    corpus: DataFrame,
    num_hashes: int = 24,
    band_rows: int = 2,
    k: int = 3,
    seed: int = 7,
    text_col: str = "text",
    bucket_cap: int | None = None,
) -> NearDupIndex:
    """Static index over the reference corpus — build once, persist, hand
    to stream_near_dup_pairs; every micro-batch joins against it.

    Boilerplate-heavy corpora concentrate near-identical band signatures
    into giant buckets; unguarded, every stream doc colliding with such a
    bucket fans its B candidate rows (each carrying a fat shingle array)
    into ONE task per key. The batch guard's sizing job cannot run per
    micro-batch, but it does not need to: corpus bucket sizes are known
    NOW. Over-cap buckets are split into ceil(B/cap) salt blocks keyed by
    a deterministic hash of corpus_id (the capped_bucket_pairs block
    rule), and the shingle arrays move out of the band rows entirely —
    the bucket join ships slim (id, band, bucket, salt) rows and the
    verify fetches each array once via an equi-join on corpus_id."""
    from gms_spark.lshguard import DEFAULT_BUCKET_CAP

    cap = DEFAULT_BUCKET_CAP if bucket_cap is None else bucket_cap
    if cap < 1:
        raise ValueError(f"bucket_cap must be >= 1, got {cap}")
    b = _with_bands(corpus, "corpus_id", num_hashes, band_rows, k, seed, text_col)
    shingles = b.where(F.col("band") == 0).select("corpus_id", "sh")
    slim = b.select("corpus_id", "band", "bucket")
    blocks = (
        slim.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .where(F.col("_bsz") > cap)
        .select(
            "band",
            "bucket",
            F.ceil(F.col("_bsz") / F.lit(float(cap))).cast("int").alias("_nb"),
        )
    )
    bands = (
        slim.join(blocks, ["band", "bucket"], "left")
        .select(
            "corpus_id",
            "band",
            "bucket",
            F.when(
                F.col("_nb").isNotNull(),
                F.pmod(F.xxhash64("corpus_id"), F.col("_nb")).cast("int"),
            )
            .otherwise(F.lit(0))
            .alias("_salt"),
        )
    )
    return NearDupIndex(bands=bands, shingles=shingles, blocks=blocks, cap=cap)


def stream_near_dup_pairs(
    stream: DataFrame,
    index: NearDupIndex,
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
    same (num_hashes, band_rows, k, seed).

    Guarded join shape: a probe row left-joins the (tiny, static)
    over-cap block table and explodes over its bucket's 0.._nb-1 salt
    range (no blocks row → one salt 0 row — the fast path adds nothing),
    then equi-joins the slim salted index on (band, bucket, _salt): each
    join cell holds ≤ cap corpus rows, and the corpus shingle arrays
    enter only per matched candidate via the corpus_id join. All ops are
    stateless (explode + stream-static joins), so the plan stays legal
    in a micro-batch with no watermark."""
    sb = _with_bands(stream, "doc_id", num_hashes, band_rows, k, seed, text_col).withColumnRenamed(
        "sh", "sh_s"
    )
    probes = (
        sb.join(index.blocks, ["band", "bucket"], "left")
        .withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("_nb"), F.lit(1)) - 1)),
        )
        .drop("_nb")
    )
    joined = probes.join(index.bands, ["band", "bucket", "_salt"]).join(
        index.shingles.withColumnRenamed("sh", "sh_c"), "corpus_id"
    )
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
