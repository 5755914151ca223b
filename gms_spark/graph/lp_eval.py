"""Link-prediction evaluation: deterministic split, precision, AUC.

Reference semantics (gms/algorithms/set_based/link_prediction/
evaluation.h:32-200): hide a fraction of edges (test positives), score
candidates on the remaining graph, measure (a) precision@q — how many of
the top-q predicted non-edges are hidden true edges (evaluation.h:100-124)
— and (b) AUC by comparing scores of sampled true-hidden vs false
non-edges (evaluation.h:137-174).

Differences made deterministic for a distributed setting: the reference
samples with a stateful RNG (edge_sampler.h:24-155); we split by
xxhash64(src, dst, seed) threshold — order- and partition-independent —
and compute AUC exactly — the tie-averaged pairwise probability over
ALL (hidden × sampled negative) pairs instead of Monte-Carlo trials,
evaluated by Mann–Whitney ranks (one distributed prefix sum), never a
cartesian.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gms_spark.graph.build import build_undirected
from gms_spark.graph.similarity import link_prediction_topq, vertex_similarity


def _pair_mix(a: str, b: str, seed: int):
    """Engine LCG mix of a canonical pair — the SQL-replayable hash
    policy (same int64 arithmetic contract as coloring draws / MinHash
    coefficients), for callers that need a DuckDB-twin-checkable split."""
    from gms_spark.graph.coloring import ARITH_A, ARITH_B, ARITH_C, ARITH_P

    salt = seed * ARITH_B % ARITH_P
    # Both operands pre-reduced mod P: (a%P)*A tops out near 2^61 and
    # (b%P)*C near 2^47, so the sum stays int64-safe for ANY vertex id.
    # Unreduced b*C overflows int64 once b exceeds ~2^46 — Spark wraps
    # silently while DuckDB BIGINT errors, silently diverging the split.
    # For ids < P (every sandbox graph) the hash value is unchanged.
    return (
        (F.col(a) % ARITH_P) * ARITH_A + (F.col(b) % ARITH_P) * ARITH_C + F.lit(salt).cast("long")
    ) % ARITH_P


def split_edges(
    edges: DataFrame, test_frac: float = 0.2, seed: int = 7, hasher: str = "xxhash64"
) -> tuple[DataFrame, DataFrame]:
    """(train, test) split of undirected edges; both halves canonical a<b.

    Hash-threshold split: deterministic under any partitioning (the
    distributed replacement for the reference's RNG edge sampler).
    ``hasher="lcg"`` swaps xxhash64 for the engine LCG mix — weaker as a
    hash, but bit-replayable by a SQL oracle (the lp_eval driver query).
    """
    half = edges.where(F.col("src") < F.col("dst"))
    if hasher == "lcg":
        from gms_spark.graph.coloring import ARITH_P

        cut = int(test_frac * ARITH_P)
        h = _pair_mix("src", "dst", seed)
    else:
        cut = int(test_frac * (1 << 31))
        h = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1 << 31))
    test = half.where(h < cut)
    train = half.where(h >= cut)
    return train, test


@dataclass
class LPEvalResult:
    precision_at_q: float
    auc: float
    q: int
    n_test: int


def evaluate_link_prediction(
    edges: DataFrame,
    q: int = 50,
    test_frac: float = 0.2,
    seed: int = 7,
    metric: str = "adamic_adar",
    hasher: str = "xxhash64",
) -> LPEvalResult:
    """Hide test_frac of edges, predict from the rest, score the predictions."""
    train_half, test_half = split_edges(edges, test_frac, seed, hasher=hasher)
    train = build_undirected(train_half)  # re-symmetrize the kept half
    n_test = test_half.count()

    top = link_prediction_topq(train, q=q, metric=metric)
    hits = top.join(test_half.select(F.col("src").alias("a"), F.col("dst").alias("b")), ["a", "b"], "left_semi").count()
    precision = hits / q if q else 0.0

    # AUC: P(score(hidden positive) > score(random negative)) + 0.5 ties.
    # Negatives: 2-hop non-edges of the train graph that are also not
    # hidden positives, downsampled deterministically.
    e1 = train.select(F.col("src").alias("a"), F.col("dst").alias("w"))
    e2 = train.select(F.col("dst").alias("b"), F.col("src").alias("w"))
    cands = (
        e1.join(e2, "w")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .join(train.select(F.col("src").alias("a"), F.col("dst").alias("b")), ["a", "b"], "left_anti")
    )
    pos = cands.join(test_half.select(F.col("src").alias("a"), F.col("dst").alias("b")), ["a", "b"], "left_semi")
    neg = cands.join(test_half.select(F.col("src").alias("a"), F.col("dst").alias("b")), ["a", "b"], "left_anti")
    # deterministic 25% sample, same hash policy as the split
    neg_h = _pair_mix("a", "b", seed + 1) if hasher == "lcg" else F.xxhash64("a", "b", F.lit(seed + 1))
    neg = neg.where(F.pmod(neg_h, 4) == 0)

    col = {"adamic_adar": "adamic_adar", "common_neighbors": "common_neighbors", "jaccard_gms": "jaccard_gms"}[metric]
    ps = vertex_similarity(train, pos).select(F.col(col).alias("s"), F.lit(1).alias("is_pos"))
    ns = vertex_similarity(train, neg).select(F.col(col).alias("s"), F.lit(0).alias("is_pos"))
    auc = _rank_auc(ps.unionAll(ns))
    return LPEvalResult(precision, auc, q, n_test)


def add_false_links(
    train: DataFrame, mutations: int, test: DataFrame | None = None, seed: int = 42
) -> DataFrame:
    """Mutation robustness mode (evaluation.h:176-200): replace
    ``mutations`` true edges with sampled complement (false) pairs,
    skipping pairs that are hidden test positives — the reference's
    noise-injection knob for measuring how fast precision/AUC degrade.

    ``train`` is a symmetrized edge table; returns the mutated graph in
    the same shape. Deviations, documented: the reference rebuilds its
    sampler after every single mutation (edge_sampler rebuild,
    evaluation.h:197) so draw i+1 sees the mutated graph — a sequential
    O(mutations·m) loop that cannot be the 100 TB path; we draw one
    batch from the UNMUTATED graph (distribution-equivalent for
    mutations ≪ m) with the engine's deterministic LCG draws. The
    complement sampler's self-pair quirk is dropped for insertions
    (a self-loop is not a valid undirected edge).
    """
    from gms_spark.graph.lp_sampler import sample_complement_edges, sample_edges

    half = train.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    # Keep the FIRST `mutations` distinct draws in draw order — a bare
    # .distinct().limit() is not stable across re-executions of the lazy
    # plan, so two downstream actions could see two different mutated
    # graphs. Ordering by the draw index pins the choice.
    remove = (
        sample_edges(train, k=mutations * 2, seed=seed)
        .groupBy("a", "b")
        .agg(F.min("draw").alias("draw"))
        .orderBy("draw")
        .limit(mutations)
        .select("a", "b")
    )
    add = (
        sample_complement_edges(train, k=mutations * 4, seed=seed + 1)
        .where(F.col("a") != F.col("b"))
        .join(half, ["a", "b"], "left_anti")  # complement of train by construction; belt+braces
    )
    if test is not None:
        test_half = test.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        add = add.join(test_half, ["a", "b"], "left_anti")  # evaluation.h:193-195
    add = (
        add.groupBy("a", "b")
        .agg(F.min("draw").alias("draw"))
        .orderBy("draw")
        .limit(mutations)
        .select("a", "b")
    )
    n_rm, n_add = remove.count(), add.count()
    if n_rm < mutations or n_add < mutations:
        raise ValueError(
            f"add_false_links: oversample produced only {n_rm} removals / "
            f"{n_add} insertions for {mutations} requested mutations; "
            "raise the oversample factor or lower `mutations`"
        )
    # one stable mutated graph for EVERY downstream action
    mutated_half = half.join(remove, ["a", "b"], "left_anti").unionByName(add).localCheckpoint(eager=True)
    return build_undirected(mutated_half.select(F.col("a").alias("src"), F.col("b").alias("dst")))


def _rank_auc(scored: DataFrame) -> float:
    """Exact tie-averaged AUC via Mann–Whitney ranks — identical value to
    the positivexnegative pairwise comparison but computed from ONE
    distributed prefix sum over score groups (O(distinct scores) state)
    instead of an O(npos*nneg) cartesian.

    AUC = (R_pos - npos(npos+1)/2) / (npos*nneg), where R_pos sums the
    tie-averaged 1-based ranks of the positives in the combined ordering.
    """
    from gms_spark.graph.lp_sampler import prefix_ranges

    g = scored.groupBy("s").agg(F.count("*").alias("w"), F.sum("is_pos").alias("np"))
    ranged = prefix_ranges(g, vertex_col="s", weight_col="w")
    row = ranged.agg(
        F.sum(F.col("np") * (F.col("lo") + (F.col("w") + 1) / 2.0)).alias("r_pos"),
        F.sum("np").alias("npos"),
        F.sum(F.col("w") - F.col("np")).alias("nneg"),
    ).first()
    npos, nneg = int(row["npos"] or 0), int(row["nneg"] or 0)
    if npos == 0 or nneg == 0:
        return 0.5
    return float((row["r_pos"] - npos * (npos + 1) / 2.0) / (npos * nneg))
