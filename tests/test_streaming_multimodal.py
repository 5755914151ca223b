"""Structured Streaming twin + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gms_spark.multimodal.media import decode_media, frame_sample, synth_media
from gms_spark.streaming.windows import stream_tumbling_agg, tumbling_agg

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    """The streaming twin must produce the batch result once drained."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in tumbling_agg(ev, "1 hour").collect()
    }

    src = str(tmp_path / "events_in")
    ev.write.parquet(src)
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the cast
    # is value-preserving and the batch twin groups identically
    stream = spark.readStream.schema(ev.schema).parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))
    out = stream_tumbling_agg(stream, "1 hour", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in spark.sql("select * from win_test").collect()
    }
    # append mode emits only watermark-closed windows; with availableNow +
    # 0s watermark all but the final window close — compare the overlap
    # and require near-complete coverage.
    assert len(got) >= len(batch) - 10
    for k, v in got.items():
        assert batch[k] == v


def test_media_decode_plumbing(spark):
    media = synth_media(spark, 30)
    feats = decode_media(media, codec="fake")
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == 5 for r in rows)
    # deterministic across partitionings
    again = {r["media_id"]: tuple(r["features"]) for r in decode_media(media.repartition(7), codec="fake").collect()}
    assert {r["media_id"]: tuple(r["features"]) for r in rows} == again


def test_real_codec_is_explicit_stub(spark):
    media = synth_media(spark, 3)
    with pytest.raises(NotImplementedError):
        decode_media(media, codec="real")


def test_frame_sample_plan(spark):
    media = synth_media(spark, 30)
    fs = frame_sample(media, every_ms=1000)
    rows = fs.collect()
    vids = media.where(F.col("media_type") == "video").collect()
    assert {r["media_id"] for r in rows} == {r["media_id"] for r in vids}
    for v in vids:
        expected = v["duration_ms"] // 1000 + 1
        got = [r for r in rows if r["media_id"] == v["media_id"]]
        assert len(got) == expected
        assert all(r["frame_ts_ms"] == r["frame_idx"] * 1000 for r in got)
