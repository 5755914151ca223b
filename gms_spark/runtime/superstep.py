"""Generic superstep loop: iterate(state, step_fn) with checkpoint/resume.

The Spark replacement for the reference's in-memory kernel loops
(e.g. PageRank's trial loop gms/representations/graphs/log_graph/pr.cc:38-59,
CC's change-flag loop cc.cc:41-59): each superstep is one Spark job over
DataFrames; convergence is a driver-side decision on a scalar the step
reports (delta-norm / changed-count), exactly where the reference reads
its error/change flag.

Scale design notes:
  * The state DataFrame is persisted each step and the previous one
    unpersisted, so the working set is two small per-vertex tables.
  * The logical plan is truncated every step — either by the checkpoint
    write-then-read (when a TableIO is given) or by localCheckpoint —
    so plan depth does not grow with iteration count (a classic failure
    mode of iterative DataFrame code).
  * With a TableIO, every iteration commits an atomic snapshot plus
    per-partition lineage rows (iteration, partition id, rows, delta
    norm, wall ms); a relaunch with the same (io, run_id) resumes from
    the last committed iteration — kill-and-resume yields identical
    final results (tested in tests/test_superstep_resume.py).
"""

from __future__ import annotations

import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from gms_spark.io.tableio import TableIO


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    deltas: list[float]
    resumed_from: int | None = None


def truncate_plan(df: DataFrame) -> DataFrame:
    """Hard-truncate a superstep state's plan WITHOUT poisoning stats.

    ``localCheckpoint`` alone inherits the child plan's sizeInBytes
    ESTIMATE (Spark propagates originStats through the checkpoint). A
    chained superstep then multiplies the inherited estimates at every
    join, so the estimate's BigInt grows exponentially in DIGIT COUNT
    round over round — by round ~20 the driver spends most of its time
    inside Catalyst's SizeInBytesOnlyStatsPlanVisitor doing million-digit
    BigInteger products (measured: 98 s for ONE coloring superstep over a
    5,000-vertex graph, executors idle the whole time). Persisting the
    checkpointed frame and materializing it makes downstream stats come
    from the ACTUAL cached bytes — flat per-round cost (0.8 s/round on
    the same graph). Callers must eventually ``unpersist()`` the result.

    Scope note (measured, do not "fix" again): the explosion needs a
    JOIN-BEARING plan segment between truncations — each join multiplies
    the two sides' inherited estimates. Chains of bare
    ``localCheckpoint(eager=True)`` at CHUNK boundaries (pagerank/
    components check_every paths, one fused join per chunk) stay flat:
    measured at depth 20 on the sf0.1 doc graph, bare chaining runs
    100 supersteps in 19.8 s vs 28.5 s with truncate_plan at every
    boundary — the extra persist+count pass costs more than the
    (non-exploding) estimate chain. Use truncate_plan inside superstep
    loops with join-heavy per-round plans; keep bare localCheckpoint at
    bounded chunk boundaries.
    """
    out = df.localCheckpoint(eager=True).persist()
    out.count()
    return out


def _partition_counts(df: DataFrame) -> list[tuple[int, int]]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .count()
        .collect()
    )
    return [(int(r["partition_id"]), int(r["count"])) for r in rows]


def resolve_delta(delta) -> float:
    """Resolve a step's delta AFTER its state materialized.

    Steps may return the convergence scalar three ways:
      float            — computed eagerly inside the step (legacy: a
                         second Spark job per superstep);
      Observation      — attached to the new state via ``df.observe``;
                         the metric (alias ``delta``) is collected BY the
                         materialization action itself (persist+count,
                         localCheckpoint(eager=True) and parquet writes
                         all fire it — verified empirically), so each
                         superstep is ONE job, no extra driver round trip;
      callable () -> float — for deltas derived from an observation plus
                         driver state (e.g. BFS's new-minus-old count);
      Column           — an aggregate over the FINAL state's columns,
                         resolved by ``iterate`` itself on the
                         materialized state (never here). The fastest
                         form for per-round-truncated kernels: the
                         aggregate action IS the materialization, so a
                         truncated round is ONE job (an Observation
                         through a lazy localCheckpoint resolves to
                         None — the CollectMetrics node is buried in
                         the checkpointed RDD; measured, do not retry).
    """
    if isinstance(delta, Column):
        raise TypeError("Column deltas are resolved by iterate() on the materialized state")
    if isinstance(delta, Observation):
        v = delta.get["delta"]
        return float(v) if v is not None else 0.0  # null agg == empty state
    if callable(delta):
        return float(delta())
    return float(delta)


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], tuple[DataFrame, object]],
    max_iters: int,
    tol: float = 0.0,
    io: TableIO | None = None,
    kernel: str = "kernel",
    run_id: str | None = None,
    lineage_detail: bool = True,
    truncate_every: int = 3,
) -> SuperstepResult:
    """Run ``step(state, i) -> (new_state, delta)`` until delta <= tol.

    ``delta`` semantics are kernel-defined (L1 norm for PageRank, changed
    row count for CC/LP); the loop stops when ``delta <= tol`` or after
    ``max_iters`` supersteps. ``delta`` may be a float, an ``Observation``
    riding the new state, or a 0-arg callable — see ``resolve_delta``.

    ``truncate_every`` trades the hard-truncation job against chained-plan
    analysis cost: a persisted-but-uncheckpointed state chain still
    propagates sizeInBytes estimates through the LOGICAL plan, so
    Catalyst's per-action analysis cost grows superlinearly with chain
    depth (measured on an 11-superstep PageRank, 8 cores: per-step
    materialization 0.8s at depth 1 → 2.1s → 5.8s → 12.3s at depth 5).
    Measured totals small-graph / scale-14 R-MAT: every=1 → 8.3s/4.4s,
    every=2 → 5.8/3.3, every=3 → 5.1/3.3 (best), every=6 → 27.0/28.7.
    """
    spark = state.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    table = f"{kernel}_state_{run_id}"
    deltas: list[float] = []
    start_iter = 0
    resumed_from = None

    if io is not None:
        last = io.last_committed(table)
        if last is not None:
            state = io.read(spark, table, last)
            start_iter = last + 1
            resumed_from = last
            prior = [r for r in io.lineage_rows() if r.get("run_id") == run_id and r.get("kernel") == kernel]
            by_iter: dict[int, float] = {}
            for r in prior:
                by_iter[int(r["iteration"])] = float(r["delta_norm"])
            deltas = [by_iter[i] for i in sorted(by_iter) if i <= last]
            if deltas and deltas[-1] <= tol:
                return SuperstepResult(state, start_iter, deltas, resumed_from)

    state = state.persist()
    state.count()

    i = start_iter
    while i < max_iters:
        t0 = time.time()
        new_state, delta = step(state, i)
        if io is not None and isinstance(delta, Column):
            # No current kernel combines a durable TableIO with a Column
            # delta (pagerank/components/labelprop all use Observations,
            # whose metrics the parquet write fires). Wiring it is easy —
            # aggregate the committed re-read — but dead paths rot:
            # implement it when a kernel needs it.
            raise NotImplementedError("Column deltas are not supported with durable io")
        if io is not None:
            # The parquet job fires any Observation riding new_state;
            # resolve inside the meta callback (exactly once) so the
            # commit marker still records the delta.
            holder: dict[str, float] = {}

            def _meta():
                holder["delta"] = resolve_delta(delta)
                return {"delta": holder["delta"]}

            io.write(new_state, table, i, meta=_meta)
            delta = holder["delta"]
            committed = io.read(spark, table, i).persist()
            committed.count()
            wall_ms = (time.time() - t0) * 1000.0
            parts = _partition_counts(committed) if lineage_detail else [(-1, committed.count())]
            io.append_lineage(
                spark,
                [
                    {
                        "kernel": kernel,
                        "run_id": run_id,
                        "iteration": i,
                        "partition_id": pid,
                        "rows": cnt,
                        "delta_norm": float(delta),
                        "wall_ms": wall_ms,
                        "committed_at": time.time(),
                    }
                    for pid, cnt in parts
                ],
            )
            state.unpersist()
            state = committed
        else:
            # No durable checkpoint: persist each step (keeps Catalyst's
            # outputPartitioning metadata, so the next superstep's joins
            # on the same key need NO extra shuffle) and hard-truncate the
            # plan only every `truncate_every` steps — localCheckpoint
            # erases partitioning info, which would force a reshuffle of
            # the state side every superstep. Keep the chain SHORT: see
            # the docstring's measured analysis-cost growth per depth.
            if isinstance(delta, Column):
                # ONE job per superstep: the aggregate action computes
                # the plan, fills the cache (and the lazy localCheckpoint
                # on truncation rounds), and returns the delta scalar —
                # no separate count pass. Requires the delta to be an
                # aggregate over the FINAL state's columns.
                if truncate_every > 0 and (i + 1) % truncate_every == 0:
                    new_state = new_state.localCheckpoint(eager=False).persist()
                else:
                    new_state = new_state.persist()
                delta = float(new_state.agg(delta.alias("delta")).first()["delta"] or 0)
            else:
                if truncate_every > 0 and (i + 1) % truncate_every == 0:
                    new_state = truncate_plan(new_state)
                else:
                    new_state = new_state.persist()
                    new_state.count()
                delta = resolve_delta(delta)  # fired by the materialization above
            state.unpersist()
            state = new_state
        deltas.append(float(delta))
        i += 1
        if delta <= tol:
            break

    return SuperstepResult(state, i, deltas, resumed_from)
