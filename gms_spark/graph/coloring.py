"""Graph-coloring menu — the reference's largest non-set-based component.

Reference variants (gms/algorithms/non_set_based/coloring/, 3,498 LoC):
Jones–Plassmann v1–v4 (coloring_jones_v1.h:17-70 … v4: same independent-
set round, different priority functions), Johansson palette sampling
(coloring_johansson.h), Barenboim/Elkin and dense/sparse refinements.
The JP family differs ONLY in the priority order; we implement the
shared round as one kernel (`jp_color`) and ship the priority menu:

  jp_random  — v1: seeded-hash priority (the classic JP)
  jp_lf      — v2 largest-first: priority (degree, hash) — high-degree
               vertices color first, empirically fewer colors
  jp_sl      — v3 smallest-last flavor: ADG approximate-degeneracy rank
               DESCENDING (deepest core colors first), the parallel
               stand-in for the sequential smallest-last order

  johansson  — palette sampling: every uncolored vertex draws a
               deterministic pseudo-random color from [0, Δ+1); keeps it
               iff no neighbor holds/drew the same color this round.
               O(log n) rounds w.h.p.; ≤ Δ+1 colors by construction.

`compare_colorings` is the harness of gms/benchmarks/coloring.cc:32-131:
run each variant on the same graph and report (variant, n_colors,
rounds, proper).

Spark shape: each round is ONE join + aggregate over the edge table
(vertex state keyed by vertex id; hub neighborhoods partial-aggregate
map-side), exactly the superstep discipline of the other kernels — no
per-vertex loops, no adjacency materialization.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from gms_spark.graph.build import degrees, vertices
from gms_spark.runtime.superstep import iterate


@dataclass
class ColoringResult:
    colors: DataFrame  # (vertex, color)
    rounds: int
    n_colors: int


def jp_color(edges: DataFrame, prio: DataFrame, max_iters: int = 500, kernel: str = "coloring") -> ColoringResult:
    """Jones–Plassmann rounds over an arbitrary priority table.

    ``prio``: (vertex, prio) — any orderable column; ties broken by
    vertex id (struct comparison), so ANY priority is a total order and
    the loop always terminates in ≤ n rounds.

    Per round, every uncolored vertex whose (prio, id) is the strict
    maximum among its uncolored neighbors takes the smallest color
    unused by its colored neighbors (coloring_jones_v1.h:17-70).
    """
    # the edge table is re-joined EVERY round — materialize it once
    # instead of re-deriving an arbitrary upstream plan per superstep
    from gms_spark.graph.build import stage_edges

    edges = stage_edges(edges)
    state0 = vertices(edges).join(prio, "vertex").select("vertex", F.lit(None).cast("long").alias("color"), "prio")

    def step(state: DataFrame, i: int):
        unc = state.where(F.col("color").isNull())
        nbr = edges.join(
            state.select(F.col("vertex").alias("src"), F.col("color").alias("n_color"), F.col("prio").alias("n_prio")),
            "src",
        ).select(F.col("dst").alias("vertex"), "n_color", "n_prio", F.col("src").alias("n_vertex"))
        agg = nbr.groupBy("vertex").agg(
            F.max(F.when(F.col("n_color").isNull(), F.struct("n_prio", "n_vertex"))).alias("max_unc"),
            F.sort_array(F.collect_set("n_color")).alias("used"),
        )
        cand = (
            unc.join(agg, "vertex", "left")
            .where(
                F.col("max_unc").isNull()
                | (F.struct(F.col("prio").alias("n_prio"), F.col("vertex").alias("n_vertex")) > F.col("max_unc"))
            )
            .select(
                "vertex",
                F.coalesce(
                    F.filter(
                        F.sequence(F.lit(0), F.greatest(F.coalesce(F.size("used"), F.lit(0)), F.lit(0))),
                        lambda c: ~F.array_contains(F.coalesce(F.col("used"), F.array().cast("array<long>")), c.cast("long")),
                    ).getItem(0),
                    F.lit(0),
                )
                .cast("long")
                .alias("new_color"),
            )
        )
        # the uncolored count rides the round's own materialization via
        # df.observe (iterate truncates per round — truncate_plan keeps
        # stats real; bare checkpoints compound size estimates
        # exponentially, see runtime/superstep.py): ONE job per round.
        obs = Observation()
        new = (
            state.join(cand, "vertex", "left")
            .select("vertex", F.coalesce("color", "new_color").alias("color"), "prio")
            .observe(obs, F.sum(F.when(F.col("color").isNull(), 1).otherwise(0)).alias("delta"))
        )
        return new, obs

    res = iterate(state0, step, max_iters=max_iters, tol=0.0, kernel=kernel, truncate_every=1)
    if res.deltas and res.deltas[-1] > 0:
        raise RuntimeError(f"{kernel}: {int(res.deltas[-1])} vertices uncolored after {max_iters} rounds")
    colors = res.state.select("vertex", "color")
    n_colors = colors.agg(F.countDistinct("color")).first()[0]
    return ColoringResult(colors, res.iterations, int(n_colors))


def jp_random(edges: DataFrame, seed: int = 27491095, max_iters: int = 500) -> ColoringResult:
    """JP v1: seeded pseudo-random priorities (delegates to the shared
    kernel). The reference draws priorities from std RNG
    (coloring_jones_v1.h:17-70); per this engine's determinism contract
    (same policy as the MinHash coefficients and LP sampler draws) the
    RNG is replaced by an LCG mix — engine-agnostic int64 arithmetic, so
    a DuckDB oracle replays every round bit-for-bit."""
    prio = vertices(edges).select("vertex", _arith_prio(seed).alias("prio"))
    return jp_color(edges, prio, max_iters, kernel="coloring_jp_random")


#: arithmetic-mix constants shared with the SQL oracle twins
ARITH_A, ARITH_B, ARITH_P = 1103515245, 12345, 2147483647


def _arith_prio(seed: int):
    """LCG-mix priority expression — plain int64 modular arithmetic, so
    a DuckDB oracle can replay it bit-for-bit (the engine-wide stand-in
    for the reference's std RNG draws)."""
    # seed*B is pre-reduced mod P driver-side (int32-literal-safe);
    # (x + y % P) % P == (x + y) % P, so the SQL twin needs no change
    return ((F.col("vertex") % ARITH_P) * ARITH_A + F.lit(seed * ARITH_B % ARITH_P).cast("long")) % ARITH_P


def jp_lf(edges: DataFrame, seed: int = 27491095, max_iters: int = 500) -> ColoringResult:
    """JP v2 largest-first: priority = (degree, mix) — hubs color first."""
    prio = degrees(edges).select(
        "vertex",
        F.struct(F.col("degree").alias("d"), _arith_prio(seed).alias("h")).alias("prio"),
    )
    return jp_color(edges, prio, max_iters, kernel="coloring_jp_lf")


def jp_sl(edges: DataFrame, eps: float = 0.1, max_iters: int = 500) -> ColoringResult:
    """JP v3 smallest-last flavor: ADG degeneracy rank DESCENDING.

    The sequential smallest-last order colors the deepest-core vertices
    first; the parallel stand-in is the ADG batch peel rank reversed
    (high rank = peeled last = deepest core = highest priority).
    """
    from gms_spark.graph.orderings import adg_order

    prio = adg_order(edges, eps=eps).select("vertex", F.col("rank").alias("prio"))
    return jp_color(edges, prio, max_iters, kernel="coloring_jp_sl")


def johansson(edges: DataFrame, seed: int = 5, max_iters: int = 500) -> ColoringResult:
    """Johansson palette sampling (coloring_johansson.h).

    Round i: every uncolored vertex draws color mix(v, i, seed) mod
    (Δ+1); it KEEPS the draw iff no neighbor already holds that color
    and no uncolored neighbor drew the same value this round (symmetric
    drop — progress w.h.p. since the palette strictly exceeds every
    degree). Deterministic given the seed — the draw is the engine-wide
    LCG mix (SQL-replayable, like the MinHash coefficients), with the
    round index folded in; ≤ Δ+1 colors by construction.
    """
    from gms_spark.graph.build import stage_edges

    edges = stage_edges(edges)
    max_deg = int(degrees(edges).agg(F.max("degree")).first()[0])
    palette = max_deg + 1
    state0 = vertices(edges).select("vertex", F.lit(None).cast("long").alias("color"))

    def step(state: DataFrame, i: int):
        draw = F.pmod(
            (
                (F.col("vertex") % ARITH_P) * ARITH_A
                + F.lit(i * 2654435761 % ARITH_P).cast("long")
                + F.lit(seed * ARITH_B % ARITH_P).cast("long")
            )
            % ARITH_P,
            F.lit(palette),
        ).cast("long")
        picked = state.select(
            "vertex", "color", F.when(F.col("color").isNull(), draw).alias("pick")
        )
        nbr = edges.join(
            picked.select(F.col("vertex").alias("src"), F.col("color").alias("n_color"), F.col("pick").alias("n_pick")),
            "src",
        ).select(F.col("dst").alias("vertex"), "n_color", "n_pick")
        conflicts = (
            nbr.join(picked.select("vertex", "pick"), "vertex")
            .where(F.col("pick").isNotNull() & ((F.col("n_color") == F.col("pick")) | (F.col("n_pick") == F.col("pick"))))
            .select("vertex")
            .distinct()
        )
        # observed uncolored count rides the round's job — see jp_color
        obs = Observation()
        new = (
            picked.join(conflicts.withColumn("_bad", F.lit(1)), "vertex", "left")
            .select(
                "vertex",
                F.coalesce("color", F.when(F.col("_bad").isNull(), F.col("pick"))).alias("color"),
            )
            .observe(obs, F.sum(F.when(F.col("color").isNull(), 1).otherwise(0)).alias("delta"))
        )
        return new, obs

    res = iterate(state0, step, max_iters=max_iters, tol=0.0, kernel="coloring_johansson", truncate_every=1)
    if res.deltas and res.deltas[-1] > 0:
        raise RuntimeError(f"johansson: {int(res.deltas[-1])} vertices uncolored after {max_iters} rounds")
    colors = res.state.select("vertex", "color")
    n_colors = colors.agg(F.countDistinct("color")).first()[0]
    return ColoringResult(colors, res.iterations, int(n_colors))


def is_proper(edges: DataFrame, colors: DataFrame) -> bool:
    """Verifier: no monochromatic edge (coloring_common.h:28-203)."""
    bad = (
        edges.join(colors.withColumnRenamed("vertex", "src").withColumnRenamed("color", "c_src"), "src")
        .join(colors.withColumnRenamed("vertex", "dst").withColumnRenamed("color", "c_dst"), "dst")
        .where(F.col("c_src") == F.col("c_dst"))
        .count()
    )
    return bad == 0


def compare_colorings(edges: DataFrame, variants: list[str] | None = None) -> DataFrame:
    """The coloring.cc:32-131 harness: run each variant, report
    (variant, n_colors, rounds, proper) — deterministic given seeds."""
    from gms_spark.graph.traversal import jones_plassmann

    runners = {
        "jp_random": lambda: jones_plassmann(edges),
        "jp_lf": lambda: jp_lf(edges),
        "jp_sl": lambda: jp_sl(edges),
        "johansson": lambda: johansson(edges),
    }
    names = variants or list(runners)
    rows = []
    for name in names:
        res = runners[name]()
        rows.append((name, int(res.n_colors), int(res.rounds), is_proper(edges, res.colors)))
    spark = edges.sparkSession
    return spark.createDataFrame(rows, "variant string, n_colors long, rounds long, proper boolean")
