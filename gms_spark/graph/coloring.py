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

  barenboim  — speculative one-shot rounds over free-palette index
               draws, higher-id-wins conflicts, the reference's
               hi/lo-degree phase schedule (coloring_barenboim.h).
  elkin      — multi-color palette sampling with the d_i probability
               recurrence and a Barenboim finisher (coloring_elkin.h).

  (JP v4's semantics ≡ v3 — it differs only in a lock-free ready-queue
  scheduler, a shared-memory execution device with no DataFrame analog;
  the dense/sparse decomposition is a documented exclusion, SURVEY §2.4.)

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
from gms_spark.runtime.superstep import iterate, truncate_plan


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


#: extra LCG multiplier for per-color draws (Elkin sampling); plain
#: int64 arithmetic so the SQL twins replay it bit-for-bit
ARITH_C = 69069
ROUND_SALT = 2654435761


def _round_salt(i: int, seed: int) -> int:
    """Per-round additive salt (pre-reduced, int64-literal-safe)."""
    return (i * ROUND_SALT + seed * ARITH_B) % ARITH_P


def _neighbor_used(edges: DataFrame, state: DataFrame) -> DataFrame:
    """(vertex, used): ascending distinct colors held by v's neighbors."""
    nbr = edges.join(
        state.select(F.col("vertex").alias("src"), F.col("color").alias("n_color")), "src"
    ).select(F.col("dst").alias("vertex"), "n_color")
    return nbr.groupBy("vertex").agg(F.sort_array(F.collect_set("n_color")).alias("used"))


def barenboim(
    edges: DataFrame,
    seed: int = 11,
    max_iters: int = 500,
    state0: DataFrame | None = None,
) -> ColoringResult:
    """Barenboim speculative (Δ+1)-coloring (coloring_barenboim.h:9-170).

    Reference semantics, Spark-first:
      * palette(v) = {1..Δ+1} minus neighbor-held colors — never
        materialized: the round draws a palette INDEX r and resolves the
        r-th free color with a skip-fold over the sorted used set
        (O(|used|) per vertex, not O(Δ); the reference's per-vertex
        palette vectors, coloring_common_barenboim_elkin.h:79-92, are
        O(n·Δ) memory and would be the hub-array hazard here).
      * one-shot round (one_shot_coloring :9-88): every ACTIVE uncolored
        vertex draws; a draw survives iff no HIGHER-id neighbor drew the
        same color (:44-47); survivors commit.
      * phase schedule (:91-170): ceil(log Δ / log(16/15)) rounds over
        everyone, then the remaining uncolored split at uncolored-degree
        Δ̂ = ln n into high/low sets, each run ceil(5·ln Δ̂ / log(4/3))
        rounds, then a cleanup loop (progress ≥ 1/round: the highest-id
        active vertex can never lose its draw).
      * std RNG draws → the engine LCG mix (SQL-replayable, same
        determinism contract as JP/Johansson). Colors are 1..Δ+1
        (reference convention: 0/NULL = uncolored).
    """
    import math

    from gms_spark.graph.build import stage_edges

    edges = stage_edges(edges)
    max_deg = int(degrees(edges).agg(F.max("degree")).first()[0] or 0)
    palette_n = max_deg + 1
    verts = vertices(edges)
    state = (
        state0 if state0 is not None
        else verts.select("vertex", F.lit(None).cast("long").alias("color"))
    )
    state = truncate_plan(state)
    n = verts.count()

    def one_shot(state: DataFrame, active: DataFrame | None, i: int):
        """One speculative round; returns (new_state, Observation of the
        uncolored-after and newly-colored counts)."""
        salt = _round_salt(i, seed)
        cand = state.where(F.col("color").isNull())
        if active is not None:
            cand = cand.join(active, "vertex", "left_semi")
        cand = (
            cand.join(_neighbor_used(edges, state), "vertex", "left")
            .select("vertex", F.coalesce("used", F.array().cast("array<long>")).alias("used"))
        )
        psize = (F.lit(palette_n) - F.size("used")).cast("long")
        r = ((F.col("vertex") % ARITH_P) * ARITH_A + F.lit(salt).cast("long")) % ARITH_P % psize
        # r-th free color of {1..Δ+1}\used: skip-fold over ascending used
        chosen = F.aggregate(
            "used", (r + 1).cast("long"), lambda acc, c: F.when(c <= acc, acc + 1).otherwise(acc)
        )
        cand = cand.select("vertex", chosen.alias("chosen"))
        pairs = (
            edges.join(
                cand.select(F.col("vertex").alias("src"), F.col("chosen").alias("src_chosen")), "src"
            ).join(
                cand.select(F.col("vertex").alias("dst"), F.col("chosen").alias("dst_chosen")), "dst"
            )
        )
        # dst loses iff a HIGHER-id neighbor drew the same color
        conf = (
            pairs.where((F.col("src") > F.col("dst")) & (F.col("src_chosen") == F.col("dst_chosen")))
            .select(F.col("dst").alias("vertex"))
            .distinct()
        )
        keep = cand.join(conf, "vertex", "left_anti").select("vertex", F.col("chosen").alias("new_color"))
        obs = Observation()
        new = (
            state.join(keep, "vertex", "left")
            .select("vertex", F.coalesce("color", "new_color").alias("color"))
            .observe(
                obs,
                F.sum(F.when(F.col("color").isNull(), 1).otherwise(0)).alias("delta"),
            )
        )
        return new, obs

    def run_phase(state: DataFrame, active: DataFrame | None, rounds: int, i0: int):
        uncolored = None
        i = i0
        for _ in range(rounds):
            new, obs = one_shot(state, active, i)
            new = truncate_plan(new)
            uncolored = int(obs.get["delta"] or 0)
            state.unpersist()
            state = new
            i += 1
            if uncolored == 0:
                break
        return state, uncolored, i

    # phase 1: everyone, ceil(log Δ / log(16/15)) rounds (:105-110)
    p1 = max(1, math.ceil(math.log(max(max_deg, 2)) / math.log(16.0 / 15.0)))
    state, uncolored, i = run_phase(state, None, min(p1, max_iters), 0)

    if uncolored:
        # split remaining uncolored at uncolored-degree Δ̂ = ln n (:117-151)
        delta_hat = max(1.0, math.log(max(n, 2)))
        unc = state.where(F.col("color").isNull()).select("vertex")
        udeg = (
            edges.join(unc.withColumnRenamed("vertex", "src"), "src", "left_semi")
            .join(unc.withColumnRenamed("vertex", "dst"), "dst", "left_semi")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.count("*").alias("ud"))
        )
        split = unc.join(udeg, "vertex", "left").fillna(0, ["ud"]).localCheckpoint(eager=True)
        hi = split.where(F.col("ud") > delta_hat).select("vertex")
        lo = split.where(F.col("ud") <= delta_hat).select("vertex")
        p2 = max(1, math.ceil(5 * math.log(delta_hat + 1.0) / math.log(4.0 / 3.0)))
        if hi.limit(1).count():
            state, uncolored, i = run_phase(state, hi, p2, i)
        if uncolored and lo.limit(1).count():
            state, uncolored, i = run_phase(state, lo, p2, i)
        # cleanup: everyone uncolored until done (:160-166)
        if uncolored:
            state, uncolored, i = run_phase(state, None, max_iters - i, i)

    if uncolored:
        raise RuntimeError(f"barenboim: {uncolored} vertices uncolored after {i} rounds")
    colors = state.select("vertex", "color")
    n_colors = int(colors.agg(F.countDistinct("color")).first()[0])
    return ColoringResult(colors, i, n_colors)


def elkin(edges: DataFrame, seed: int = 13, max_iters: int = 500) -> ColoringResult:
    """Elkin (Δ+1)-coloring by multi-color palette sampling
    (coloring_elkin.h:10-150 + the Barenboim finisher of the direct
    interface :186-199).

    Per round every uncolored v samples EACH free palette color
    independently w.p. p_i = ((d_i+εΔ)/(d_i+1))/|palette(v)| (:57-80;
    d_i follows the reference recurrence :38-45); v commits to a random
    sampled color that no LOWER-id uncolored neighbor sampled (:84-112,
    set-difference rule — note the direction is opposite to Barenboim's
    higher-id-wins). When a round makes no progress the remaining
    vertices finish with the Barenboim one-shot kernel, exactly like the
    reference's direct interface. Draws use the engine LCG mix
    (SQL-replayable); palettes are evaluated as lazy filters over
    sequence(1, Δ+1) — O(Δ) work per uncolored vertex per round, the
    same bound as the reference's per-vertex palette scan.
    """
    import math

    from gms_spark.graph.build import stage_edges

    edges = stage_edges(edges)
    max_deg = int(degrees(edges).agg(F.max("degree")).first()[0] or 0)
    palette_n = max_deg + 1
    n = vertices(edges).count()

    # reference parameter dance (coloring_elkin.h:19-45)
    eps = (math.log(max(n, 2)) ** 2) / max(max_deg, 1)
    while eps >= 1:
        eps /= 2
    while eps < 0.5:
        eps *= 2
    eps_delta = eps * max(max_deg, 1)
    ln_n = math.log(max(n, 2))
    if abs(math.log(eps_delta)) < 1e-9 or eps_delta <= ln_n:
        gamma = 0.0  # degenerate tiny-graph regime; t collapses to εΔ
    else:
        gamma = math.log(eps_delta / ln_n) / math.log(eps_delta)
    t = eps_delta ** (1.0 - gamma)

    def d_next(d: float) -> float:
        alpha = math.exp(-(d + eps_delta) / (8.0 * (d + 1.0)))
        if d > t:
            return max(1.01 * alpha * d, t)
        return t / eps_delta * d

    state = truncate_plan(
        vertices(edges).select("vertex", F.lit(None).cast("long").alias("color"))
    )
    d_i = float(max_deg)
    i = 0
    uncolored = n
    while uncolored and i < max_iters:
        p_pre = (d_i + eps_delta) / (d_i + 1.0)
        d_i = d_next(d_i)
        salt = _round_salt(i, seed)
        cand = (
            state.where(F.col("color").isNull())
            .join(_neighbor_used(edges, state), "vertex", "left")
            .select("vertex", F.coalesce("used", F.array().cast("array<long>")).alias("used"))
        )
        psize = (F.lit(palette_n) - F.size("used")).cast("long")
        # sample color c iff mix(v,c,i)/P < p_pre/psize  ⇔  mix·psize < p_pre·P
        thresh = F.lit(int(p_pre * ARITH_P)).cast("long")
        samp = cand.select(
            "vertex",
            F.filter(
                F.sequence(F.lit(1).cast("long"), F.lit(palette_n).cast("long")),
                lambda c: (~F.array_contains("used", c))
                & (
                    ((F.col("vertex") % ARITH_P) * ARITH_A + c * ARITH_C + F.lit(salt).cast("long"))
                    % ARITH_P
                    * psize
                    < thresh
                ),
            ).alias("samp"),
        )
        low = (
            edges.join(
                samp.select(F.col("vertex").alias("src"), F.col("samp").alias("n_samp")), "src"
            )
            .where(F.col("src") < F.col("dst"))
            .select(F.col("dst").alias("vertex"), "n_samp")
            .groupBy("vertex")
            .agg(F.array_distinct(F.flatten(F.collect_list("n_samp"))).alias("lower"))
        )
        avail = samp.join(low, "vertex", "left").select(
            "vertex",
            F.array_except("samp", F.coalesce("lower", F.array().cast("array<long>"))).alias("avail"),
        )
        pick_salt = _round_salt(i, seed + 1)
        pick = F.when(
            F.size("avail") > 0,
            F.element_at(
                "avail",
                (
                    ((F.col("vertex") % ARITH_P) * ARITH_A + F.lit(pick_salt).cast("long"))
                    % ARITH_P
                    % F.size("avail")
                    + 1
                ).cast("int"),
            ),
        )
        keep = avail.select("vertex", pick.alias("new_color")).where(F.col("new_color").isNotNull())
        obs = Observation()
        new = (
            state.join(keep, "vertex", "left")
            .select("vertex", F.coalesce("color", "new_color").alias("color"))
            .observe(obs, F.sum(F.when(F.col("color").isNull(), 1).otherwise(0)).alias("delta"))
        )
        new = truncate_plan(new)
        newly = uncolored - int(obs.get["delta"] or 0)
        uncolored = int(obs.get["delta"] or 0)
        state.unpersist()
        state = new
        i += 1
        if uncolored and newly == 0:
            break  # no progress — hand off (made_progress, :113)

    if uncolored:
        res = barenboim(edges, seed=seed, max_iters=max_iters - i, state0=state)
        return ColoringResult(res.colors, i + res.rounds, res.n_colors)
    colors = state.select("vertex", "color")
    n_colors = int(colors.agg(F.countDistinct("color")).first()[0])
    return ColoringResult(colors, i, n_colors)


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
        "barenboim": lambda: barenboim(edges),
        "elkin": lambda: elkin(edges),
    }
    names = variants or list(runners)
    rows = []
    for name in names:
        res = runners[name]()
        rows.append((name, int(res.n_colors), int(res.rounds), is_proper(edges, res.colors)))
    spark = edges.sparkSession
    return spark.createDataFrame(rows, "variant string, n_colors long, rounds long, proper boolean")
