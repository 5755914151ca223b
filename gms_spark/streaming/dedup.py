"""Streaming first-seen dedup — the continuous-ingest twin of the batch
dedup tier (text/dedup.py exact_dedup, urls.py url_dedup).

A crawl never stops arriving; exact dedup over an unbounded stream needs
bounded state. ``dropDuplicatesWithinWatermark`` keeps one state row per
key only until the event-time watermark passes it, so memory rides the
duplicate-arrival horizon (how far apart duplicate fetches of the same
url can be), not the stream length — the standard Structured Streaming
contract for this operator. Anything stateless composes upstream:
`canonical_url_stream_dedup` canonicalizes messy urls IN the stream
(pure column expressions work identically in streaming plans) and
dedups on the canonical form, so the batch query `url_dedup` pins the
semantics the stream must reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from gms_spark.urls import canonicalize_url


def stream_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving row per key within the watermark horizon.

    State per key is dropped once event time moves `watermark` past it —
    a duplicate arriving later than that re-emits (by design: bounded
    state is the price of an unbounded stream; size the watermark to the
    pipeline's duplicate-arrival window).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def canonical_url_stream_dedup(
    stream: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Canonicalize urls in-stream, then first-seen dedup on the
    canonical form: the streaming twin of urls.py url_dedup."""
    canon = stream.withColumn("canonical", canonicalize_url(url_col))
    return stream_dedup(canon, ["canonical"], ts_col=ts_col, watermark=watermark)
