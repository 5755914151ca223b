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
    Probe concentration is capped independently of original-row
    concentration: a bucket is over-cap if EITHER side exceeds ``cap``,
    and the probe join is blocked on a ceil(P/cap) × ceil(O/cap) grid
    (≤ cap² rows per cell) — probes inherit Hamming-1 fan-in from hot
    neighbor buckets, so an originals-only gate would leave a P×cap
    single-task join unbounded.

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
    p_sizes = (
        probe_df.groupBy(*kc).agg(F.count(F.lit(1)).alias("_psz"))
        if probe_df is not None
        else None
    )
    over = sizes.where(F.col("_bsz") > cap).select(F.col("_bsz").alias("_sz"))
    if p_sizes is not None:
        over = over.unionAll(p_sizes.where(F.col("_psz") > cap).select(F.col("_psz").alias("_sz")))
    stats = over.agg(
        F.count(F.lit(1)).alias("n_over"), F.coalesce(F.max("_sz"), F.lit(0)).alias("max_bsz")
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
        # bucket — a BIPARTITE join blocked on BOTH sides: probes split
        # into ceil(P/cap) hash blocks, originals into ceil(O/cap), and
        # the grid join on (key, probe_block, orig_block) bounds every
        # cell at ≤ cap² rows. Splitting only by original size would
        # leave a P×cap single-task join when Hamming-1 fan-in from a
        # hot neighbor bucket concentrates P probes on one key. Pair
        # (p, o) meets in exactly the (pblk(p), oblk(o)) cell. Buckets
        # with no originals drop in the inner join with `sizes` (no
        # originals = nothing to pair).
        p_sz = p_sizes.persist()
        p_sz.count()
        nbo = F.ceil(F.col("_bsz") / F.lit(float(cap))).cast("int")
        nbp = F.ceil(F.col("_psz") / F.lit(float(cap))).cast("int")
        ow = withsz.join(p_sz, key_cols)
        oy = ow.select(
            *key_cols,
            F.col(id_col).alias("_yb"),
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), nbo).cast("int").alias("_ob"),
            F.explode(F.sequence(F.lit(0), nbp - 1)).alias("_pb"),
        )
        pw = probe_df.join(sizes, key_cols).join(p_sz, key_cols)
        px = pw.select(
            *key_cols,
            F.col(id_col).alias("_xa"),
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 1)), nbp).cast("int").alias("_pb"),
            F.explode(F.sequence(F.lit(0), nbo - 1)).alias("_ob"),
        )
        probe_pairs = (
            px.join(oy, [*key_cols, "_pb", "_ob"])
            .where(F.col("_xa") != F.col("_yb"))
            .select(
                F.least("_xa", "_yb").alias("a"), F.greatest("_xa", "_yb").alias("b")
            )
        )
        pairs = pairs.unionAll(probe_pairs)
    return pairs


def salted_bucket_join(
    corpus_b: DataFrame,
    query_b: DataFrame,
    key_cols: list[str],
    corpus_id: str,
    cap: int = DEFAULT_BUCKET_CAP,
    seed: int = 0,
) -> DataFrame:
    """Query-probe × corpus bucket join with per-bucket blocking on
    BOTH sides: over-cap corpus buckets split into ceil(C/cap) salt
    blocks, over-cap QUERY multiplicity (multiprobe fan-in concentrating
    many probe rows on one bucket) into ceil(Q/cap) blocks, and the grid
    join on (key, corpus_salt, query_salt) bounds every cell at ≤ cap²
    input rows. Corpus rows — which carry the fat vector columns — are
    replicated only across the query blocks of their own bucket
    (≤ Q/cap copies, proportional to that bucket's output anyway).
    Identical output rows to the naive
    ``query_b.join(corpus_b, key_cols)``.

    Caveats:
      * ``query_b`` rows should be DISTINCT: the query-side block id is
        a hash of the full query row (query frames carry no stable id
        column in general), so duplicate rows collapse into one block
        and the ≤cap² per-cell bound degrades toward dup_count × cap
        (results stay correct — only the skew bound weakens). Current
        callers (sim/ann.py probes) emit distinct rows.
      * On the engaged path the sizes/q_sizes frames stay persisted —
        they feed the returned LAZY plan, so there is no safe point to
        unpersist them here. Long-lived sessions issuing many engaged
        joins should clear them once the returned rows are materialized
        (spark.catalog.clearCache(), or unpersist the caller's handles);
        one-shot queries are cleaned up by session teardown. Same note
        applies to capped_bucket_pairs' engaged path."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    kc = [F.col(c) for c in key_cols]
    sizes = corpus_b.groupBy(*kc).agg(F.count(F.lit(1)).alias("_bsz"))
    q_sizes = query_b.groupBy(*kc).agg(F.count(F.lit(1)).alias("_qsz"))
    over = sizes.where(F.col("_bsz") > cap).select(F.col("_bsz").alias("_sz")).unionAll(
        q_sizes.where(F.col("_qsz") > cap).select(F.col("_qsz").alias("_sz"))
    )
    stats = over.agg(
        F.count(F.lit(1)).alias("n_over"), F.coalesce(F.max("_sz"), F.lit(0)).alias("max_bsz")
    ).first()
    if not stats["n_over"]:
        # healthy buckets: the plain join IS the bounded plan — don't
        # pay the size-join/salt machinery (same adaptive shape as
        # capped_bucket_pairs)
        return query_b.join(corpus_b, key_cols)
    logger.warning(
        "LSH probe-join cap %d engaged: %d over-cap corpus/query bucket groups, largest %d rows "
        "— salting into sub-bucket grid cells (same results, bounded tasks).",
        cap,
        stats["n_over"],
        stats["max_bsz"],
    )
    sizes = sizes.persist()
    q_sizes = q_sizes.persist()
    sizes.count()
    q_sizes.count()
    nbc = F.ceil(F.col("_bsz") / F.lit(float(cap))).cast("int")
    nbq = F.ceil(F.col("_qsz") / F.lit(float(cap))).cast("int")
    # a query row hashes its own block id from its full row (query_b
    # frames carry no stable id column in general); corpus rows hash
    # theirs from corpus_id — both uniform, both deterministic
    cs = (
        corpus_b.join(sizes, key_cols)
        .join(q_sizes, key_cols)
        .withColumn("_cs", F.pmod(F.xxhash64(F.col(corpus_id), F.lit(seed)), nbc).cast("int"))
        .withColumn("_qs", F.explode(F.sequence(F.lit(0), nbq - 1)))
        .drop("_bsz", "_qsz")
    )
    qs = (
        query_b.join(sizes, key_cols)
        .join(q_sizes, key_cols)
        .withColumn(
            "_qs",
            F.pmod(F.xxhash64(*[F.col(c) for c in query_b.columns], F.lit(seed + 1)), nbq).cast("int"),
        )
        .withColumn("_cs", F.explode(F.sequence(F.lit(0), nbc - 1)))
        .drop("_bsz", "_qsz")
    )
    return qs.join(cs, [*key_cols, "_cs", "_qs"]).drop("_cs", "_qs")
