"""Document deduplication operators over a documents(doc_id, text) table.

Not present in the reference (spcl/gms is a graph library); these are the
training-data-pipeline operators a 100 TB corpus needs, built on the same
design rules as the graph kernels: JVM-side built-ins for everything hot,
engine-agnostic *arithmetic* hashing so results are deterministic and
independently checkable (the DuckDB oracles replicate the exact pipeline).

Operators:
  exact_dedup           — hash/groupBy on full text
  shingle_ids           — word k-grams → int64 ids via a dense token
                          dictionary + polynomial combine (mod p)
  jaccard_join          — EXACT set-similarity join on shingle sets with
                          length + prefix filtering (AllPairs/PPJoin-lite):
                          deterministic, no recall loss, prunes hub shingles
  minhash_lsh_join      — MinHash signatures + banded LSH candidates +
                          exact verification; every hash is (a*s+b) mod p
                          integer arithmetic, so the whole pipeline is
                          reproducible anywhere
  simhash64             — 64-bit SimHash per doc (numpy, Arrow-batched)
  simhash_near_dup      — banded simhash buckets + exact Jaccard verify

Scale notes: all joins are equi-joins on shingle/band keys (shuffle
partitioned by key); ultra-frequent shingles are the skew risk, handled
by prefix filtering (jaccard_join) / banding (LSH). Nothing collects to
the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PTOK = 2147483647  # 2^31-1 hash modulus: (a*s+b) products of <2^31 values stay in int64


def tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, token) — whitespace tokenization, position-preserving."""
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token")
    ).where(F.col("token") != "")


def gram_array(text_col: str = "text", k: int = 3):
    """In-row array<string> of word k-grams — the ONE shingling
    expression every dedup tier shares (batch dictionary path here,
    stateless streaming path in streaming/neardup.py)."""
    a = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return F.when(
        F.size(a) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(a) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(a, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_strings(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, sh_str) — distinct word-k-gram strings, JVM-side only."""
    return docs.select("doc_id", F.explode(gram_array(text_col, k)).alias("sh_str")).distinct()


def shingle_dict(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Dense shingle ids 1..V, lexicographic (== dense_rank() over sh_str).

    Uses the distributed dense-id assigner (graph/build.py) — no
    single-partition window; a web-scale shingle vocabulary is itself a
    big table. Lexicographic order makes the dictionary independently
    reproducible (the DuckDB oracles recompute it with dense_rank).
    """
    from gms_spark.graph.build import assign_dense_ids

    sh = shingle_strings(docs, k, text_col).select("sh_str").distinct()
    return assign_dense_ids(sh, [F.col("sh_str").asc()]).select(
        "sh_str", (F.col("id") + 1).alias("shingle")
    )


def shingle_ids(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle: long) — distinct word-k-gram ids via the dict.

    Ids are dense_rank over the lexicographic shingle-string order —
    the same dictionary `shingle_dict` publishes — computed with the
    duplicate-carrying dense-rank assigner: one range shuffle of the
    (doc_id, sh_str) rows replaces the former vocabulary-distinct
    exchange + string equi-join back (the two heaviest stages of the
    dictionary build; measured ~4.8 s of every dedup query at sf0.1).
    """
    from gms_spark.graph.build import dense_rank_ids

    # staged: repartitionByRange executes its child TWICE (the range-
    # boundary sampling pass, then the real exchange) — unstaged, the
    # whole shingle explode+distinct would run once per pass
    ss = shingle_strings(docs, k, text_col).localCheckpoint(eager=True)
    return dense_rank_ids(ss, "sh_str").select(
        "doc_id", (F.col("id") + 1).alias("shingle")
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate clusters: (canonical_id, n_dups) per distinct text.

    One partial-aggregated groupBy on the text hash → scales to any
    corpus (group key is the text itself here for exactness; at 100 TB
    you groupBy (xxhash64(text), length(text)) first and verify inside
    groups — same plan shape).
    """
    return docs.groupBy(F.col(text_col).alias("text")).agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies")
    )


def _verified_pairs(cands: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact-verify candidate (a,b) pairs against full shingle sets.

    ``sh`` is the exploded (doc_id, shingle) table. The candidate set is
    materialized once (it feeds the id projection AND the verify join),
    and the per-doc shingle ARRAYS are aggregated only for docs that
    actually appear in a candidate pair — at corpus scale the candidate
    mass is ∝ duplicates, so the heavy collect_list/array_sort pass must
    not run over the whole corpus (it previously did)."""
    cands = cands.localCheckpoint(eager=True)
    ids = (
        cands.select(F.col("a").alias("doc_id"))
        .unionAll(cands.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sets = (
        sh.join(ids, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("shingle")).alias("sh"))
    )
    sa = sets.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    j = cands.join(sa, "a").join(sb, "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        j.select("a", "b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_join(docs: DataFrame, threshold: float = 0.8, k: int = 3, text_col: str = "text") -> DataFrame:
    """EXACT all-pairs Jaccard similarity join on word-k-gram sets.

    AllPairs prefix filtering: order each doc's shingles by ascending
    global frequency (rarest first, ties by shingle id); if
    J(A,B) >= t then the first ⌊(1-t)·|A|⌋+1 shingles of A and B must
    share an element — so the candidate join only touches prefixes,
    skipping the huge posting lists of common shingles. Deterministic,
    100% recall (unlike LSH), and the frequency ordering is itself a
    skew mitigation.
    """
    sh = shingle_ids(docs, k, text_col).persist()
    # Eager: freq/ordered/sizes/prefix(×2)/verify all reference sh — left
    # lazy, the branches of the one big candidate job race to fill the
    # cache and each re-runs the dictionary join (incl. its mapInPandas
    # id-assignment stage) instead of reading it.
    sh.count()
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ordered = (
        sh.join(freq, "shingle")
        .withColumn("r", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "shingle")))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    prefix = (
        ordered.join(sizes, "doc_id")
        .where(F.col("r") <= F.floor((1.0 - threshold) * F.col("sz")) + 1)
        .select("doc_id", "shingle")
        # both self-join sides scan the prefix table; materialized once
        # (its frequency window + size join would otherwise run twice)
        .localCheckpoint(eager=True)
    )
    cands = (
        prefix.alias("x")
        .join(prefix.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    return _verified_pairs(cands, sh, threshold)


def _minhash_coeffs(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs < 2^31-1 for h_j(s) = (a*s + b) mod p."""
    out = []
    for j in range(1, num_hashes + 1):
        a = (j * 2654435761 + seed * 40503 + 1) % PTOK
        b = (j * 97531 + seed * 7919 + 7) % PTOK
        out.append((a or 1, b))
    return out


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 24,
    k: int = 3,
    seed: int = 7,
    text_col: str = "text",
    sh: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, m0..m{H-1}) MinHash signature — H JVM-side min-aggregates.

    No UDF: each hash is a codegen'd arithmetic expression over the
    exploded shingle rows; one shuffle (groupBy doc_id) produces the
    whole signature. Pass ``sh`` to reuse an already-materialized
    shingle table (the dictionary build is the expensive stage).
    """
    if sh is None:
        sh = shingle_ids(docs, k, text_col)
    aggs = [
        F.min((F.col("shingle") * F.lit(a) + F.lit(b)) % F.lit(PTOK)).alias(f"m{j}")
        for j, (a, b) in enumerate(_minhash_coeffs(num_hashes, seed))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_join(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 24,
    band_rows: int = 2,
    k: int = 3,
    seed: int = 7,
    text_col: str = "text",
    bucket_cap: int | None = None,
) -> DataFrame:
    """MinHash + banded LSH candidates + exact Jaccard verification.

    Banding: num_hashes/band_rows bands; docs sharing any band bucket are
    candidates; candidates are verified EXACTLY, so false positives cost
    only compute, and recall at J>=t is 1-(1-t^r)^b (≈0.995 at t=0.5
    with r=2,b=12). Entirely deterministic given (seed, num_hashes).

    ``bucket_cap`` (default lshguard.DEFAULT_BUCKET_CAP): boilerplate-
    heavy corpora concentrate near-identical signatures into giant
    (band, bucket) groups; the guard routes over-cap buckets through
    blocked sub-joins — SAME pair set, bounded per-task candidate
    volume, cap decision logged. See gms_spark/lshguard.py.
    """
    from gms_spark.lshguard import DEFAULT_BUCKET_CAP, capped_bucket_pairs

    sh = shingle_ids(docs, k, text_col).persist()  # one dictionary build for sigs AND verification
    sigs = minhash_signatures(docs, num_hashes, k, seed, text_col, sh=sh).persist()
    n_bands = num_hashes // band_rows
    # One in-row explode instead of an n_bands-way unionAll of selects:
    # the union scanned the cached signature table once PER BAND per
    # consumer (guard sizing + both self-join sides = 3 consumers × 12
    # bands = 36 scans); the explode reads it once per consumer. Same
    # (doc_id, band, bucket) row set.
    band_structs = []
    for bi in range(n_bands):
        cols = [F.col(f"m{bi * band_rows + r}") for r in range(band_rows)]
        acc = cols[0]
        for c in cols[1:]:
            acc = (acc * F.lit(131071) + c) % F.lit(PTOK)
        band_structs.append(F.struct(F.lit(bi).cast("int").alias("band"), acc.alias("bucket")))
    bdf = sigs.select("doc_id", F.explode(F.array(*band_structs)).alias("_bb")).select(
        "doc_id", F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket")
    )
    cap = DEFAULT_BUCKET_CAP if bucket_cap is None else bucket_cap
    cands = capped_bucket_pairs(bdf, "doc_id", ["band", "bucket"], cap=cap).distinct()
    return _verified_pairs(cands, sh, threshold)


def simhash64(docs: DataFrame, k: int = 1, seed: int = 11, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash: long) — 64-bit SimHash over shingle ids.

    Bit votes are the engine's deterministic arithmetic-hash policy
    (same as the MinHash coefficients, coloring priorities and LP
    draws): vote_j(s) = ((s·a_j + b_j) mod 2^31-1) mod 2 with the
    (a_j, b_j) of ``_minhash_coeffs(64, seed)`` — plain int64 modular
    arithmetic, so a DuckDB oracle replays every fingerprint bit
    exactly (no wrapping uint64 products anywhere). Arrow-batched
    numpy, O(shingles × 64) vectorized; products stay < 2^51 (shingle
    ids are dense, coefficients < 2^31).
    """
    sh = shingle_ids(docs, k, text_col)
    grouped = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shingles"))
    coeffs = _minhash_coeffs(64, seed)
    A = np.array([a for a, _ in coeffs], dtype=np.int64)
    B = np.array([b for _, b in coeffs], dtype=np.int64)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.int64)
            for i, arr in enumerate(pdf["shingles"]):
                s = np.asarray(arr, dtype=np.int64)
                votes = ((s[:, None] * A[None, :] + B[None, :]) % PTOK) & 1
                sums = (2 * votes - 1).sum(axis=0)
                bitsset = (sums > 0).astype(np.uint64)
                out[i] = int((bitsset << bits).sum(dtype=np.uint64).astype(np.int64))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(), "simhash": out})

    return grouped.mapInPandas(compute, "doc_id long, simhash long")


def simhash_near_dup(
    docs: DataFrame,
    threshold: float = 0.5,
    n_bands: int = 4,
    k: int = 3,
    seed: int = 11,
    text_col: str = "text",
    bucket_cap: int | None = None,
) -> DataFrame:
    """SimHash-banded candidates (16-bit bands) + exact Jaccard verify.

    16-bit bands give 2^16 buckets — boilerplate still concentrates, so
    the ``bucket_cap`` guard (lshguard.py) bounds per-task candidate
    volume on over-cap buckets without changing the pair set.
    """
    from gms_spark.lshguard import DEFAULT_BUCKET_CAP, capped_bucket_pairs

    # persist: the guard's sizing pass and both self-join sides scan the
    # banded frame; without the cache each scan re-runs the Arrow-batched
    # simhash stage (same persist policy as minhash_lsh_join's sigs).
    sims = simhash64(docs, k=1, seed=seed, text_col=text_col).persist()
    width = 64 // n_bands
    # In-row explode, not an n_bands-way unionAll: one pass over the
    # simhash table per consumer (see minhash_lsh_join). The simhash
    # computation is an Arrow-batched mapInPandas — scanning it once per
    # band would re-run the Python stage n_bands× per consumer.
    band_structs = [
        F.struct(
            F.lit(bi).cast("int").alias("band"),
            F.shiftrightunsigned(F.col("simhash"), bi * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("bucket"),
        )
        for bi in range(n_bands)
    ]
    bdf = sims.select("doc_id", F.explode(F.array(*band_structs)).alias("_bb")).select(
        "doc_id", F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket")
    )
    cap = DEFAULT_BUCKET_CAP if bucket_cap is None else bucket_cap
    cands = capped_bucket_pairs(bdf, "doc_id", ["band", "bucket"], cap=cap).distinct()
    sh = shingle_ids(docs, k, text_col)
    return _verified_pairs(cands, sh, threshold)


def dedup_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 24,
    band_rows: int = 2,
    k: int = 3,
    seed: int = 7,
    text_col: str = "text",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate CLUSTER resolution: LSH pairs → connected
    components → one canonical representative per cluster.

    Pairwise hits are only half of corpus-level dedup: near-duplicates
    are transitive in practice (A≈B≈C with J(A,C) below threshold), so
    the keep/purge decision must be made per connected component of the
    pair graph, not per pair — otherwise chained rewrites survive as
    "distinct" documents. Pairs come from ``minhash_lsh_join`` (banded
    LSH + exact verify, the sub-quadratic 100 TB path); clustering is
    the hash-min components kernel over the pair graph — the iterative
    part runs ONLY on docs that have at least one near-dup (a small
    fraction of the corpus), everything else never leaves the scan.
    Representative = min doc_id per cluster: deterministic and
    SQL-replayable (the DuckDB oracle computes the same fixpoint with a
    recursive min-label closure).

    Returns (doc_id, cluster, keep, cluster_size) for every doc with at
    least one near-duplicate; a doc absent from the output is its own
    singleton cluster (sparse-output contract — at corpus scale the
    output is proportional to the duplicate mass, not the corpus).
    """
    from gms_spark.graph.components import connected_components

    pairs = minhash_lsh_join(docs, threshold, num_hashes, band_rows, k, seed, text_col, bucket_cap=bucket_cap)
    # The pair table feeds the symmetrizing union TWICE; left lazy, the
    # whole LSH+verify pipeline would execute once per branch (measured
    # ~13 s per execution at sf0.1 — dedup_clusters was paying it twice).
    # Materialize the (small, ∝ duplicate mass) pair set exactly once.
    pairs = pairs.localCheckpoint(eager=True)
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    comp = connected_components(edges).components
    sizes = comp.groupBy(F.col("component").alias("cluster")).agg(
        F.count("*").alias("cluster_size")
    )
    return (
        comp.select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("cluster"),
            (F.col("vertex") == F.col("component")).alias("keep"),
        )
        .join(sizes, "cluster")
        .select("doc_id", "cluster", "keep", "cluster_size")
    )
