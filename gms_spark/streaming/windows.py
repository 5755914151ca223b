"""Event-time windowed aggregation — batch plan + Structured Streaming twin.

The reference is purely batch (SURVEY §2.5: no streams anywhere in
spcl/gms); this module is the engine's forward-looking streaming surface
for the events/telemetry side of a crawl pipeline. The SAME windowing
expression powers both paths, so the batch query (driver-verifiable
against SQL) pins the streaming semantics:

  * tumbling_agg(df)          — batch: group by window(ts, size)
  * stream_tumbling_agg(sdf)  — readStream twin: adds a watermark for
    late data and state eviction; append-mode sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg(df: DataFrame, size: str, keys: list[str], streaming: bool = False):
    # Structured Streaming forbids exact distinct aggregation (state would
    # be unbounded); the streaming twin uses HyperLogLog and says so in
    # the column name.
    users = (
        F.approx_count_distinct("user_id").alias("approx_n_users")
        if streaming
        else F.countDistinct("user_id").alias("n_users")
    )
    out = df.groupBy(F.window("ts", size).alias("w"), *keys).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        users,
    )
    return out.select(F.col("w.start").alias("window_start"), *keys, "n_events", "sum_value", out.columns[-1])


def tumbling_agg(events: DataFrame, size: str = "1 hour", keys: list[str] | None = None) -> DataFrame:
    """Batch tumbling-window aggregate over events(ts, user_id, event_type, value)."""
    return _agg(events, size, keys if keys is not None else ["event_type"])


def stream_tumbling_agg(
    stream: DataFrame, size: str = "1 hour", watermark: str = "2 hours", keys: list[str] | None = None
) -> DataFrame:
    """Streaming twin: identical aggregation with a watermark for late rows.

    Usage: spark.readStream... → stream_tumbling_agg → writeStream
    (append mode; windows finalize once the watermark passes them).
    """
    return _agg(
        stream.withWatermark("ts", watermark), size, keys if keys is not None else ["event_type"], streaming=True
    )
