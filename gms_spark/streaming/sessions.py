"""Gap-based sessionization — batch twin + custom stateful streaming op.

The reference (spcl/gms) is batch-only graph mining with no event/session
notion; this module belongs to the beyond-reference training-data-pipeline
tier (task brief: Structured Streaming with ``applyInPandasWithState`` for
custom stateful operators).

Shared semantics (both paths): events of one user, ordered by
``(ts, event_id)``, belong to the same session while the gap between
consecutive events is <= ``gap_seconds``; a larger gap starts a new
session. Gap arithmetic is exact integer microseconds/nanoseconds — no
float timestamps anywhere.

Batch plan shape (100 TB): ONE exchange. The two analytic windows and the
final ``groupBy(user_id, session_idx)`` all run on the same
``HashPartitioning(user_id)`` — Catalyst recognizes that partitioning by
``user_id`` satisfies the clustering requirement of the superset group
key, so no second shuffle is planned (asserted in
``tests/test_sessions.py::test_batch_plan_single_exchange``). There is no
hub key by construction: the partition key is ``user_id``, and one user's
rows are processed by a streaming window sort, not materialized per-row
in memory.

Streaming: ``applyInPandasWithState`` keyed by ``user_id`` with
event-time timeout. State = the one open session accumulator
``(start_ns, last_ns, n, sum_value)``. A micro-batch's rows are folded
VECTORIZED (numpy diff/cumsum + pandas groupby — no per-row Python):
all gap-closed sessions are emitted immediately; the trailing open
session is kept in state and closed either by a later batch's gap or by
the watermark passing ``last + gap`` (event-time timeout).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long, sum_value double"
)
_STATE_SCHEMA = "start_ns long, last_ns long, n long, sv double"


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Batch sessionization via window functions (single shuffle).

    Returns (user_id, session_idx, session_start, session_end, n_events,
    sum_value); ``session_idx`` is the 1-based per-user session counter in
    time order. Deterministic: the flag column depends only on the sorted
    ts multiset, and the aggregates are order-independent.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap_us = int(gap_seconds) * 1_000_000
    # exact integer-microsecond gap arithmetic; the cast tolerates both
    # TIMESTAMP and TIMESTAMP_NTZ inputs (session tz is UTC)
    prev_us = F.unix_micros(F.lag(ts_col).over(w).cast("timestamp"))
    new_sess = (
        F.when(prev_us.isNull() | (F.unix_micros(F.col(ts_col).cast("timestamp")) - prev_us > gap_us), 1)
        .otherwise(0)
    )
    numbered = events.withColumn("_new", new_sess).withColumn(
        "session_idx",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return numbered.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum(value_col), 4).alias("sum_value"),
    )


def stream_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin: emit each session exactly once, when it closes.

    ``stream`` must carry (user_id, ts timestamp, value, event_id). Output
    schema = the batch schema minus ``session_idx`` (a per-user global
    counter is not knowable online without emitting per-session state
    churn; join the batch twin when an index is needed).

    Late-data contract: cross-batch disorder WITHIN one open session is
    handled (the carry merge min/maxes the bounds); an event arriving
    after its session was already emitted — i.e. later than both the
    session-closing gap and the watermark — cannot be retro-merged under
    append-mode streaming and opens a new session, exactly like Spark's
    built-in ``session_window``. Size ``watermark`` to the expected
    disorder (the '0 seconds' default assumes per-user event-time order
    across micro-batches); rows older than the watermark are dropped by
    Spark before reaching the operator.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ns = int(gap_seconds) * 1_000_000_000

    def _emit(rows: list[tuple]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": np.array([r[0] for r in rows], dtype=np.int64),
                "session_start": pd.to_datetime(np.array([r[1] for r in rows], dtype=np.int64)),
                "session_end": pd.to_datetime(np.array([r[2] for r in rows], dtype=np.int64)),
                "n_events": np.array([r[3] for r in rows], dtype=np.int64),
                "sum_value": np.round(np.array([r[4] for r in rows], dtype=np.float64), 4),
            }
        )

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        if state.hasTimedOut:
            start_ns, last_ns, n, sv = state.get
            state.remove()
            yield _emit([(uid, start_ns, last_ns, n, sv)])
            return

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts = pdf["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        vals = pdf["value"].to_numpy().astype(np.float64)

        carry = state.get if state.exists else None
        # session boundary flags, vectorized; flag[0] also consults the
        # open-session state carried across micro-batches
        flags = np.empty(len(ts), dtype=bool)
        flags[0] = carry is None or ts[0] - carry[1] > gap_ns
        if len(ts) > 1:
            flags[1:] = np.diff(ts) > gap_ns
        sess = np.cumsum(flags)  # 0 = continuation of the carried session

        g = pd.DataFrame({"s": sess, "ts": ts, "v": vals}).groupby("s", sort=True)
        agg = g.agg(start=("ts", "min"), last=("ts", "max"), n=("ts", "size"), sv=("v", "sum"))
        if carry is not None and agg.index[0] == 0:
            # merge the carried open session with its in-batch continuation;
            # min/max (not blind carry-over) so a batch whose first events
            # PREDATE the carried accumulator (cross-batch disorder within
            # the gap) still yields correct session bounds
            agg.loc[0, "start"] = min(carry[0], int(agg.loc[0, "start"]))
            agg.loc[0, "last"] = max(carry[1], int(agg.loc[0, "last"]))
            agg.loc[0, "n"] += carry[2]
            agg.loc[0, "sv"] += carry[3]
            carry = None

        closed = []
        if carry is not None:  # carried session ended by the batch's first gap
            closed.append((uid, carry[0], carry[1], carry[2], carry[3]))
        rows = list(agg.itertuples())
        for r in rows[:-1]:
            closed.append((uid, int(r.start), int(r.last), int(r.n), float(r.sv)))
        tail = rows[-1]
        state.update((int(tail.start), int(tail.last), int(tail.n), float(tail.sv)))
        timeout_ms = (int(tail.last) + gap_ns) // 1_000_000
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield _emit(closed)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
