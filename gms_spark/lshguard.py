"""Bucket-size guard for banded LSH self-joins — the boilerplate defense.

Every LSH tier in the engine (MinHash bands, SimHash bands, hyperplane
sign buckets) generates candidates with an equi-self-join on
(band, bucket). On a boilerplate-heavy web corpus — the 100 TB norm —
near-identical band signatures concentrate: a single bucket holding B
documents produces B² candidate rows in ONE join task. With B in the
millions that task never finishes; AQE's skew-join splitting cannot help
because it splits the *probe* side of a sort-merge join, while here BOTH
sides of the same key explode together.

``capped_bucket_pairs`` keeps the output pair set EXACTLY identical to
the naive self-join while bounding per-task volume:

- bucket sizes come from one partial-aggregated groupBy over the slim
  (id, band, bucket) membership table;
- buckets with ≤ cap rows take the plain self-join path (zero overhead
  for the common case);
- an over-cap bucket of B rows is split into nb = ceil(B/cap) blocks by
  a deterministic hash of the id (no window — a windowed row_number
  would itself serialize the hot bucket into one task), and the B²
  candidate volume is spread over nb² (block_i, block_j) cells of
  ~cap² candidates each — the block-nested layout of the exact
  embedding path (sim/ann.py near_dup_blocked), expressed as a pure
  equi-join so Catalyst/AQE still plan it;
- the cap decision is logged (bucket count + max size), never silent.

The guard changes WHERE the quadratic work runs (spread over the
cluster), not HOW MUCH there is: a bucket of 10M near-identical
signatures is still ~5·10¹³ candidate verifications. That mass is the
signal to raise n_planes / band width — the log line is the operator's
cue. Cost of the guard itself: one groupBy + one broadcast-or-shuffled
join against the (small) sizes table; over-cap rows are replicated nb×
per side, i.e. total shuffled rows ≈ B²/cap — exactly the candidate
volume divided by cap, the floor for any exact blocked scheme.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger("gms_spark.lshguard")

DEFAULT_BUCKET_CAP = 1024  # ≤ ~0.5M candidate rows per join cell


def capped_bucket_pairs(
    bdf: DataFrame,
    id_col: str,
    key_cols: list[str],
    cap: int = DEFAULT_BUCKET_CAP,
    seed: int = 0,
    probe_df: DataFrame | None = None,
) -> DataFrame:
    """Canonical candidate pairs (a < b) from a banded membership table.

    ``bdf``: (id_col, *key_cols) — one row per (row, band) membership.
    Returns (a, b) with a < b, NOT deduplicated across bands (callers
    keep their existing .distinct()/dropDuplicates, same as the naive
    join they replace).

    ``probe_df`` (optional): extra one-directional memberships (e.g.
    Hamming-1 multiprobe rows). A probe row (id, keys) pairs with every
    ORIGINAL row of the same bucket but not with other probes — exactly
    the probe-vs-corpus semantics of lsh_topk, applied to a self-join.

    Output invariant (tested): identical pair set to
        bdf.alias(x).join(bdf.alias(y), key_cols).where(x.id < y.id)
        [∪ probe_df.join(bdf, key_cols).where(id_p != id)]
    for ANY cap ≥ 1.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    kc = [F.col(c) for c in key_cols]

    # One exchange for bucket sizes. The stats job doubles as the plan
    # chooser: when NO bucket is over cap (the healthy-banding common
    # case) the guard machinery would only add exchanges, so we return
    # the plain self-join plan — the guard's whole cost is then this
    # one partial-agg pass (which also warms the caller's persisted
    # signature caches for the main job). Measured at sf0.1:
    # guard-always 21–34 s vs naive 11 s vs this adaptive shape ~13 s
    # on minhash_lsh_join. Skew-adaptive plan choice, AQE-style, with
    # the decision made from measured bucket sizes.
    sizes = bdf.groupBy(*kc).agg(F.count(F.lit(1)).alias("_bsz"))
    stats = sizes.where(F.col("_bsz") > cap).agg(
        F.count(F.lit(1)).alias("n_over"), F.coalesce(F.max("_bsz"), F.lit(0)).alias("max_bsz")
    ).first()
    if not stats["n_over"]:
        xs0 = bdf.select(*key_cols, F.col(id_col).alias("_xa"))
        ys0 = bdf.select(*key_cols, F.col(id_col).alias("_yb"))
        pairs = (
            xs0.join(ys0, key_cols)
            .where(F.col("_xa") < F.col("_yb"))
            .select(F.col("_xa").alias("a"), F.col("_yb").alias("b"))
        )
        if probe_df is not None:
            pp0 = (
                probe_df.select(*key_cols, F.col(id_col).alias("_xa"))
                .join(ys0, key_cols)
                .where(F.col("_xa") != F.col("_yb"))
                .select(F.least("_xa", "_yb").alias("a"), F.greatest("_xa", "_yb").alias("b"))
            )
            pairs = pairs.unionAll(pp0)
        return pairs
    logger.warning(
        "LSH bucket cap %d engaged: %d over-cap (band,bucket) groups, largest %d rows "
        "— routing through blocked sub-joins (same pairs, bounded tasks). "
        "Sustained large max sizes mean the banding is too coarse: raise n_planes/band width.",
        cap,
        stats["n_over"],
        stats["max_bsz"],
    )
    # persisted only on the skewed path: feeds the small/big split twice.
    # Materialized eagerly so Catalyst sees the (small) cached size and
    # plans broadcast/shuffled-hash joins against it instead of
    # conservative sort-merge (audited in PLANS.md §11).
    sizes = sizes.persist()
    sizes.count()

    withsz = bdf.join(sizes, key_cols)
    small = withsz.where(F.col("_bsz") <= cap).drop("_bsz")
    xs = small.select(*key_cols, F.col(id_col).alias("_xa"))
    ys = small.select(*key_cols, F.col(id_col).alias("_yb"))
    pairs = (
        xs.join(ys, key_cols)
        .where(F.col("_xa") < F.col("_yb"))
        .select(F.col("_xa").alias("a"), F.col("_yb").alias("b"))
    )

    big = withsz.where(F.col("_bsz") > cap).withColumn(
        "_nb", F.ceil(F.col("_bsz") / F.lit(float(cap))).cast("int")
    )
    # Deterministic block id — uniform over nb blocks, no window.
    blk = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.col("_nb")).cast("int")
    bb = big.withColumn("_blk", blk)
    # x replicated over all (its block, j) cells, y over all (i, its
    # block) cells: every unordered pair {u,v} meets in exactly the two
    # ordered cells (b_u,b_v) and (b_v,b_u) — or one cell when
    # b_u == b_v — and the a<b filter keeps exactly one row of it.
    bx = bb.select(
        *key_cols,
        F.col(id_col).alias("_xa"),
        F.col("_blk").alias("_bi"),
        F.explode(F.sequence(F.lit(0), F.col("_nb") - 1)).alias("_bj"),
    )
    by = bb.select(
        *key_cols,
        F.col(id_col).alias("_yb"),
        F.explode(F.sequence(F.lit(0), F.col("_nb") - 1)).alias("_bi"),
        F.col("_blk").alias("_bj"),
    )
    big_pairs = (
        bx.join(by, [*key_cols, "_bi", "_bj"])
        .where(F.col("_xa") < F.col("_yb"))
        .select(F.col("_xa").alias("a"), F.col("_yb").alias("b"))
    )
    pairs = pairs.unionAll(big_pairs)

    if probe_df is not None:
        # Probe rows pair one-directionally with originals of the same
        # bucket. Same small/big split keyed on ORIGINAL bucket sizes
        # (probe fan-in rides the same blocked cells).
        p_small = probe_df.join(sizes, key_cols).where(F.col("_bsz") <= cap).drop("_bsz")
        pp = (
            p_small.select(*key_cols, F.col(id_col).alias("_xa"))
            .join(ys, key_cols)
            .where(F.col("_xa") != F.col("_yb"))
            .select(
                F.least("_xa", "_yb").alias("a"), F.greatest("_xa", "_yb").alias("b")
            )
        )
        p_big = (
            probe_df.join(sizes, key_cols)
            .where(F.col("_bsz") > cap)
            .withColumn("_nb", F.ceil(F.col("_bsz") / F.lit(float(cap))).cast("int"))
        )
        px = p_big.select(
            *key_cols,
            F.col(id_col).alias("_xa"),
            F.explode(F.sequence(F.lit(0), F.col("_nb") - 1)).alias("_pblk"),
        )
        pyy = bb.select(*key_cols, F.col(id_col).alias("_yb"), F.col("_blk").alias("_pblk"))
        pbp = (
            px.join(pyy, [*key_cols, "_pblk"])
            .where(F.col("_xa") != F.col("_yb"))
            .select(
                F.least("_xa", "_yb").alias("a"), F.greatest("_xa", "_yb").alias("b")
            )
        )
        pairs = pairs.unionAll(pp).unionAll(pbp)
    return pairs


def salted_bucket_join(
    corpus_b: DataFrame,
    query_b: DataFrame,
    key_cols: list[str],
    corpus_id: str,
    cap: int = DEFAULT_BUCKET_CAP,
    seed: int = 0,
) -> DataFrame:
    """Query-probe × corpus bucket join with over-cap corpus buckets
    salted into ceil(B/cap) sub-buckets (query rows replicate across
    the sub-buckets; corpus rows — which carry the fat vector columns —
    are never replicated). Identical output rows to the naive
    ``query_b.join(corpus_b, key_cols)``."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    sizes = corpus_b.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).alias("_bsz")
    )
    stats = sizes.where(F.col("_bsz") > cap).agg(
        F.count(F.lit(1)).alias("n_over"), F.coalesce(F.max("_bsz"), F.lit(0)).alias("max_bsz")
    ).first()
    if not stats["n_over"]:
        # healthy buckets: the plain join IS the bounded plan — don't
        # pay the size-join/salt machinery (same adaptive shape as
        # capped_bucket_pairs)
        return query_b.join(corpus_b, key_cols)
    logger.warning(
        "LSH probe-join cap %d engaged: %d over-cap corpus buckets, largest %d rows "
        "— salting into sub-buckets (same results, bounded tasks).",
        cap,
        stats["n_over"],
        stats["max_bsz"],
    )
    sizes = sizes.persist()
    nb = F.ceil(F.col("_bsz") / F.lit(float(cap))).cast("int")
    cs = (
        corpus_b.join(sizes, key_cols)
        .withColumn("_salt", F.pmod(F.xxhash64(F.col(corpus_id), F.lit(seed)), nb).cast("int"))
        .drop("_bsz")
    )
    qs = (
        query_b.join(sizes, key_cols)
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), nb - 1)))
        .drop("_bsz")
    )
    return qs.join(cs, [*key_cols, "_salt"]).drop("_salt")
