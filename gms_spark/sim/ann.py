"""Similarity search over an embedding column (array<float>).

Top-k tiers, same contract (query_id, vec_id, cos, rank):

  cosine_topk_blocked — THE exact engine: the corpus stays distributed;
                      the queries (the small side, like a broadcast-join
                      build side) are collected once and broadcast; each
                      corpus partition runs one BLAS matmul and emits its
                      local top-k per query; a global window merges.
                      No corpus collect, no row-level cross join —
                      per-partition work only, so it scales with
                      executors exactly like a broadcast hash join.
  cosine_topk       — exact brute force as a JVM-side crossJoin plan.
                      Kept ONLY as a tiny-scale independent test oracle
                      (O(Q·N) rows through the shuffle).
  lsh_topk          — random-hyperplane LSH buckets + in-bucket exact
                      re-rank: the sub-linear-per-query path (corpus
                      sharded by bucket; each query probes its bucket ±
                      multiprobe flips). Recall < 1 by construction.

All-pairs near-duplicate tiers, contract (a, b, cos) with a < b:

  near_dup_blocked  — exact all-pairs ≥ threshold via a block-nested
                      matmul: corpus packed into ~block_size row blocks,
                      block-pair join (bi ≤ bj), one BLAS multiply per
                      pair inside mapInPandas. Exact all-pairs is
                      inherently O(N²) FLOPs; this shape distributes
                      them with O(N²/block_size) replication and NOTHING
                      on the driver.
  near_dup_lsh      — banded hyperplane LSH candidates + exact in-pair
                      verification: the 100 TB sub-quadratic path.
                      Recall < 1 by construction (OR-amplified across
                      bands; tested statistically).

Ties are broken by vec_id after rounding cos to 6 decimals, making
top-k fully deterministic and engine-comparable.

Both LSH tiers run their bucket joins through gms_spark/lshguard.py:
over-cap (band, bucket) groups — the boilerplate-concentration failure
mode of any real crawl — are routed through blocked/salted sub-joins
with identical results, bounded per-task volume, and a logged cap
decision.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cos(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact brute-force top-k as a JVM crossJoin — TINY-SCALE TEST ORACLE.

    O(Q·N) rows through the shuffle; never use as the engine path. The
    production exact path is cosine_topk_blocked (same results).
    """
    q = queries.select("query_id", F.transform("qvec", lambda x: x.cast("double")).alias("qvec"))
    c = corpus.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    scored = q.crossJoin(c).select(
        "query_id", "vec_id", F.round(_cos(F.col("qvec"), F.col("embedding")), 6).alias("cos")
    )
    return _rank_topk(scored, k)


def cosine_topk_blocked(corpus: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact distributed top-k: broadcast queries × per-partition BLAS.

    The corpus NEVER leaves the executors. The queries are the small
    side — collecting and broadcasting them is exactly the build side of
    a broadcast hash join (at 100 TB the corpus has ~10^9+ rows, the
    query set has 10^2..10^5). Each corpus partition multiplies the
    broadcast query matrix against its own block and emits its LOCAL
    top-k per query (k rows per query per partition); the global window
    merge sees Q·k·num_partitions rows — trivially shuffle-sized.

    Block-local selection uses the SAME deterministic key as the global
    merge ((rounded cos desc, vec_id asc) lexsort), so the union of
    local top-ks provably contains the global top-k.
    """
    spark = corpus.sparkSession
    qp = queries.select("query_id", "qvec").toPandas()  # small side only
    qids = qp["query_id"].to_numpy()
    Q = np.stack(qp["qvec"].to_numpy()).astype(np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    b = spark.sparkContext.broadcast((qids, Q))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, Q_ = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            ids = pdf["vec_id"].to_numpy()
            S = np.round(Q_ @ M.T, 6)  # (n_queries, block)
            out_q, out_v, out_c = [], [], []
            for r in range(S.shape[0]):
                order = np.lexsort((ids, -S[r]))[:k]
                out_q.append(np.full(len(order), qids_[r]))
                out_v.append(ids[order])
                out_c.append(S[r][order])
            yield pd.DataFrame(
                {"query_id": np.concatenate(out_q), "vec_id": np.concatenate(out_v), "cos": np.concatenate(out_c)}
            )

    part = corpus.select("vec_id", "embedding").mapInPandas(run, "query_id long, vec_id long, cos double")
    return _rank_topk(part, k)


def _pack_blocks(df: DataFrame, id_col: str, vec_col: str, n_blocks: int) -> DataFrame:
    """Pack rows into ~equal hash blocks: (bid, ids array, vecs matrix)."""
    tagged = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("bid"),
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_vec"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        return pd.DataFrame(
            {
                "bid": [int(pdf["bid"].iloc[0])],
                "ids": [pdf["_id"].to_numpy()],
                "vecs": [list(pdf["_vec"])],
            }
        )

    return tagged.groupBy("bid").applyInPandas(pack, "bid long, ids array<long>, vecs array<array<double>>")


def near_dup_blocked(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 4096,
) -> DataFrame:
    """All pairs (a<b) with cosine >= threshold — distributed block matmul.

    Exact all-pairs is inherently O(N²·d) FLOPs; what matters at scale is
    WHERE they run. The corpus is packed into ~block_size-row blocks, the
    block table is self-joined on (bid_a <= bid_b) — N/B blocks →
    (N/B)²/2 block pairs, each a single BLAS multiply inside mapInPandas
    on an executor. Nothing is collected to the driver and no row-level
    cross join exists; replication factor is N/B (each block meets every
    other block once). For sub-quadratic candidate generation use
    near_dup_lsh.
    """
    n = corpus.count()
    n_blocks = max(1, (n + block_size - 1) // block_size)
    # checkpoint, not persist: both self-join sides read the blocks, and
    # there is no later point to unpersist a cache the lazy result still
    # needs (blocks are reclaimed when the frame is unreferenced)
    blocks = _pack_blocks(corpus, id_col, vec_col, n_blocks).localCheckpoint(eager=True)
    a = blocks.select(F.col("bid").alias("bid_a"), F.col("ids").alias("ids_a"), F.col("vecs").alias("vecs_a"))
    b = blocks.select(F.col("bid").alias("bid_b"), F.col("ids").alias("ids_b"), F.col("vecs").alias("vecs_b"))
    pairs = a.join(b, F.col("bid_a") <= F.col("bid_b"))

    def compare(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_a, rows_b, rows_c = [], [], []
            for bid_a, ids_a, vecs_a, bid_b, ids_b, vecs_b in zip(
                pdf["bid_a"], pdf["ids_a"], pdf["vecs_a"], pdf["bid_b"], pdf["ids_b"], pdf["vecs_b"]
            ):
                A = np.stack([np.asarray(v) for v in vecs_a])
                A /= np.linalg.norm(A, axis=1, keepdims=True)
                B = np.stack([np.asarray(v) for v in vecs_b])
                B /= np.linalg.norm(B, axis=1, keepdims=True)
                ia = np.asarray(ids_a)
                ib = np.asarray(ids_b)
                S = np.round(A @ B.T, 6)
                # emit each unordered pair once with a < b by id: hash
                # blocks are id-disjoint, so ia<ib elementwise suffices
                mask = (S >= threshold) & (ia[:, None] < ib[None, :])
                r, c = np.nonzero(mask)
                if len(r):
                    rows_a.append(ia[r])
                    rows_b.append(ib[c])
                    rows_c.append(S[r, c])
                if int(bid_a) != int(bid_b):  # the ia>ib half, reversed
                    mask2 = (S >= threshold) & (ia[:, None] > ib[None, :])
                    r2, c2 = np.nonzero(mask2)
                    if len(r2):
                        rows_a.append(ib[c2])
                        rows_b.append(ia[r2])
                        rows_c.append(S[r2, c2])
            if rows_a:
                yield pd.DataFrame(
                    {"a": np.concatenate(rows_a), "b": np.concatenate(rows_b), "cos": np.concatenate(rows_c)}
                )

    out = pairs.mapInPandas(compare, "a long, b long, cos double")
    return out


def near_dup_lsh(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_bands: int = 16,
    seed: int = 5,
    probes: int = 1,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via banded hyperplane LSH + exact verification.

    The sub-quadratic 100 TB path: n_bands independent sign-pattern
    bucketings of n_planes hyperplanes each; a pair is a candidate if it
    collides in ANY band (OR amplification), then verified with the
    exact cosine.

    Parameterization (with p = 1-θ/π the per-bit agreement prob):
    n_planes=8 gives 2^8=256 buckets per band, so a UNIFORM corpus pays
    ~N²/256 candidates per band — the old default of 4 planes (16
    buckets) made candidate volume quadratic with a 1/16 constant,
    untenable on any real corpus. Recall is restored by 1-bit
    multiprobe (``probes=1``): each vector additionally probes every
    Hamming-1 bucket one-directionally, so a band catches a pair iff
    its sign patterns differ in ≤1 of the 8 bits:
    P(band) = p^8 + 8·p^7·(1-p); over 16 bands a cos=0.8 pair is caught
    w.p. ~0.99998 and cos=0.5 ~0.97 (vs 0.998/0.92 before — better
    recall AND 16× fewer uniform-bucket candidates). ``probes=0``
    disables multiprobe for the pure banding scheme.

    Skew: boilerplate corpora concentrate embeddings into few buckets;
    ``bucket_cap`` (default lshguard.DEFAULT_BUCKET_CAP) routes over-cap
    buckets through blocked sub-joins — same pair set, bounded per-task
    candidate volume, logged (gms_spark/lshguard.py).
    """
    from gms_spark.lshguard import DEFAULT_BUCKET_CAP, capped_bucket_pairs

    base = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    # one fused Arrow pass for ALL bands (band b's planes are the same
    # _hyperplanes(dim, n_planes, seed + 7919*b) the per-band loop used)
    # persist: the guard's bucket-stats job plus each join branch read
    # this table — without the cache every read redoes the full corpus
    # hyperplane matmul (minhash_lsh_join persists its sigs the same way)
    banded = lsh_memberships(base, "vid", "vec", n_planes, n_bands, seed, table_col="band").persist()
    probe_df = None
    if probes > 0:
        # full 1-bit multiprobe: one-directional (probe rows pair with
        # originals, not with other probes — the lsh_topk convention)
        flips = F.array(*[F.lit(1 << p) for p in range(n_planes)])
        probe_df = banded.select(
            "vid", "band", F.explode(flips.cast("array<long>")).alias("_f"), "bucket"
        ).select("vid", "band", F.col("bucket").bitwiseXOR(F.col("_f")).alias("bucket"))
    cap = DEFAULT_BUCKET_CAP if bucket_cap is None else bucket_cap
    cand = capped_bucket_pairs(
        banded, "vid", ["band", "bucket"], cap=cap, probe_df=probe_df
    ).dropDuplicates(["a", "b"])
    va = base.select(F.col("vid").alias("a"), F.col("vec").alias("vec_a"))
    vb = base.select(F.col("vid").alias("b"), F.col("vec").alias("vec_b"))
    verified = (
        cand.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            F.round(
                _cos(
                    F.transform("vec_a", lambda x_: x_.cast("double")),
                    F.transform("vec_b", lambda x_: x_.cast("double")),
                ),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
    return verified


def _hyperplanes(dim: int, n_planes: int, seed: int = 5) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes via splitmix mixing."""
    idx = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    x = (idx + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    u = (x.astype(np.float64) / 2**64) * 2.0 - 1.0
    return u.reshape(n_planes, dim)


def lsh_memberships(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    n_tables: int,
    seed: int = 5,
    table_col: str = "table",
) -> DataFrame:
    """(id, table, bucket) membership rows for n_tables independent
    sign-pattern bucketings — ONE Arrow pass over the input (a single
    stacked matmul against all tables' hyperplanes) instead of one
    mapInPandas scan per table. Table t's planes are exactly
    ``_hyperplanes(dim, n_planes, seed + 7919*t)``, so the buckets are
    bit-identical to calling lsh_buckets per table."""
    first = df.select(F.size(vec_col)).first()
    dim = int(first[0])
    H = np.concatenate(
        [_hyperplanes(dim, n_planes, seed + 7919 * t) for t in range(n_tables)], axis=0
    )  # (n_tables*n_planes, dim)
    bh = df.sparkSession.sparkContext.broadcast(H)
    weights = (1 << np.arange(n_planes - 1, -1, -1, dtype=np.int64))  # MSB-first like lsh_buckets

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        H_ = bh.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (V @ H_.T) > 0  # (B, T*P)
            signs = signs.reshape(len(pdf), n_tables, n_planes)
            buckets = (signs.astype(np.int64) * weights).sum(axis=2)  # (B, T)
            ids = np.repeat(pdf[id_col].to_numpy(), n_tables)
            tables = np.tile(np.arange(n_tables, dtype=np.int32), len(pdf))
            yield pd.DataFrame({id_col: ids, table_col: tables, "bucket": buckets.reshape(-1)})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(run, f"{id_col} {id_type}, {table_col} int, bucket long")


def lsh_buckets(df: DataFrame, vec_col: str, n_planes: int = 12, seed: int = 5) -> DataFrame:
    """Add a random-hyperplane bucket id (sign pattern) per row."""
    first = df.select(F.size(vec_col)).first()
    dim = int(first[0])
    H = _hyperplanes(dim, n_planes, seed)
    bh = df.sparkSession.sparkContext.broadcast(H)
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        H_ = bh.value
        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (V @ H_.T) > 0
            bucket = np.zeros(len(pdf), dtype=np.int64)
            for p in range(H_.shape[0]):
                bucket = (bucket << 1) | signs[:, p].astype(np.int64)
            out = pdf.copy()
            out["bucket"] = bucket
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields) + ", bucket long"
    return df.mapInPandas(run, schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 5,
    probes: int | None = None,
    n_tables: int = 16,
    bucket_cap: int | None = None,
) -> DataFrame:
    """ANN: multi-table LSH bucket join + exact candidate re-rank.

    The textbook multi-table design: ``n_tables`` INDEPENDENT
    sign-pattern bucketings (per-table recall r compounds to
    1-(1-r)^T), each probed at the query's own bucket plus (multiprobe)
    every Hamming-distance-1 bucket. A single table forces the
    recall-vs-bucket-count tradeoff (few planes = recall but ~2^4
    buckets = quadratic candidate mass); multiple 2^8-bucket tables get
    both.

    Scale shape: the bucket join moves ONLY slim membership rows
    (id, table, bucket) — the corpus vectors never ride the probe join;
    candidates are deduplicated across tables first and the embeddings
    are joined back once for the exact re-rank. Over-cap corpus buckets
    (boilerplate concentration) are salted into ceil(B/cap) sub-buckets
    — identical results, bounded per-task join volume, logged
    (gms_spark/lshguard.py). Recall < 1 by construction (tested
    statistically, not exact-matched).
    """
    from gms_spark.lshguard import DEFAULT_BUCKET_CAP, salted_bucket_join

    if probes is None:
        probes = n_planes  # full 1-bit multiprobe by default
    base = corpus.select("vec_id", "embedding")
    qbase = queries.select("query_id", "qvec")
    # one fused Arrow pass per side for ALL tables (not one scan per table)
    cb = lsh_memberships(base, "vec_id", "embedding", n_planes, n_tables, seed).persist()
    qb = lsh_memberships(qbase, "query_id", "qvec", n_planes, n_tables, seed)
    if probes > 0:
        flips = F.array(*([F.lit(0)] + [F.lit(1 << p) for p in range(min(probes, n_planes))]))
        qb = qb.select(
            "query_id", "table", "bucket", F.explode(flips.cast("array<long>")).alias("_f")
        ).select("query_id", "table", F.col("bucket").bitwiseXOR(F.col("_f")).alias("bucket"))
    cap = DEFAULT_BUCKET_CAP if bucket_cap is None else bucket_cap
    cand = (
        salted_bucket_join(cb, qb, ["table", "bucket"], "vec_id", cap=cap)
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])  # across tables and probes
    )
    joined = (
        cand.join(base, "vec_id")
        # no forced broadcast: a large query set with fat vectors can
        # exceed the broadcast cap / driver memory — let Catalyst/AQE
        # pick (it still broadcasts when qbase's measured size is small)
        .join(qbase, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _cos(
                    F.transform("qvec", lambda x: x.cast("double")),
                    F.transform("embedding", lambda x: x.cast("double")),
                ),
                6,
            ).alias("cos"),
        )
    )
    return _rank_topk(joined, k)


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> tuple[np.ndarray, DataFrame]:
    """IVF coarse quantizer → (centroids C×d unit-norm, corpus + cid).

    Seed centroids are a deterministic hash-order corpus sample (no RNG —
    same policy as the MinHash/LSH coefficients); ``lloyd_iters`` rounds
    of distributed Lloyd refinement follow: assignment is a vectorized
    per-partition argmax against the BROADCAST centroid matrix
    (mapInPandas — the corpus never moves), the recompute is ONE
    groupBy(cid) mean. Centroids live on the driver between rounds —
    they are model parameters (C·d floats, like any ML coefficient
    table), not data.

    At 100 TB: corpus-side work is a single pass per Lloyd round with a
    C×d broadcast; the only shuffle is the C-group mean. The cell list
    (cid column) then bucket-partitions the corpus for probing.
    """
    spark = corpus.sparkSession
    sample = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_centroids)
        .toPandas()
    )
    cents = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    out_schema = f"{id_col} long, {vec_col} array<float>, cid long"

    def assigner(cents_arr: np.ndarray):
        b = spark.sparkContext.broadcast(cents_arr)

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C = b.value
            for pdf in batches:
                if not len(pdf):
                    continue
                M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                M /= np.linalg.norm(M, axis=1, keepdims=True)
                cid = np.argmax(M @ C.T, axis=1)  # ties → smallest cid (argmax first hit)
                yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), vec_col: pdf[vec_col], "cid": cid})

        return assign

    assigned = corpus.select(id_col, vec_col)
    for _ in range(lloyd_iters):
        assigned_i = corpus.select(id_col, vec_col).mapInPandas(assigner(cents), out_schema)
        means = (
            assigned_i.select("cid", F.posexplode(F.transform(vec_col, lambda x: x.cast("double"))).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.transform("pm", lambda s: s.getField("m")).alias("mean"))
            .toPandas()
        )
        new = cents.copy()  # empty cells keep their previous centroid
        for _, row in means.iterrows():
            v = np.asarray(row["mean"], dtype=np.float64)
            n = np.linalg.norm(v)
            if n > 0:
                new[int(row["cid"])] = v / n
        cents = new
    assigned = corpus.select(id_col, vec_col).mapInPandas(assigner(cents), out_schema)
    return cents, assigned


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 2,
    seed: int = 11,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest cells only.

    Query-side cell selection is a driver-side Q×C argsort (queries and
    centroids are both the small side); the candidate set is
    corpus-cells ⋈ broadcast(probes) — per-query work scales with the
    probed fraction, not the corpus. Exact cosine re-rank inside the
    candidates (same rounding/tie policy as the exact engine, so
    n_probe = n_centroids reproduces cosine_topk_blocked EXACTLY — the
    pytest identity check).

    Recall < 1 for n_probe < n_centroids by construction → no SQL
    oracle; statistical recall + the exhaustive-probe identity are the
    pytest contract (same policy as lsh_topk).
    """
    spark = corpus.sparkSession
    cents, assigned = ivf_index(corpus, n_centroids, lloyd_iters, seed=seed)
    qp = queries.select("query_id", "qvec").toPandas()  # small side only
    qids = qp["query_id"].to_numpy()
    Q = np.stack(qp["qvec"].to_numpy()).astype(np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Q @ cents.T
    probe_rows = [
        (int(qids[i]), int(c)) for i in range(len(qids)) for c in np.argsort(-sims[i], kind="stable")[:n_probe]
    ]
    probes = spark.createDataFrame(probe_rows, "query_id long, cid long")
    bq = spark.sparkContext.broadcast((qids, Q))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, Q_ = bq.value
        idx = {int(q): i for i, q in enumerate(qids_)}
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            qrows = Q_[[idx[int(q)] for q in pdf["query_id"]]]
            cos = np.round(np.einsum("ij,ij->i", qrows, M), 6)
            yield pd.DataFrame({"query_id": pdf["query_id"], "vec_id": pdf["vec_id"], "cos": cos})

    cand = assigned.join(F.broadcast(probes), "cid").select("query_id", "vec_id", "embedding")
    scored = cand.mapInPandas(score, "query_id long, vec_id long, cos double")
    return _rank_topk(scored, k)
