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


def test_ppm_wav_roundtrip():
    """Pure-numpy container codecs: encode → decode is exact."""
    import numpy as np

    from gms_spark.multimodal.media import decode_ppm, decode_wav, encode_ppm, encode_wav

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(px)) == px).all()
    # header with comments + odd whitespace still parses
    hand = b"P6\n# a comment\n2 1\n# more\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    assert (decode_ppm(hand) == np.array([[[1, 2, 3], [4, 5, 6]]])).all()
    s = rng.integers(-3000, 3000, 300).astype(np.int16)
    out, rate = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000 and (out == s).all()


def test_numpy_codec_end_to_end(spark):
    """The decode seam runs END-TO-END: real container bytes → decoded
    pixel/sample arrays → features, no NotImplementedError anywhere
    (the round-3 'seam never exercised' gap)."""
    import numpy as np

    from gms_spark.multimodal.media import decode_media, synth_encoded_media

    media = synth_encoded_media(spark, 20)
    rows = {r["media_id"]: r for r in decode_media(media, codec="numpy").collect()}
    assert len(rows) == 20
    # independently recompute media_id 0 (PPM) and 1 (WAV) features
    rng = np.random.default_rng(3 * 1_000_003 + 0)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8).astype(np.float64)
    got = rows[0]["features"]
    assert abs(got[0] - px.mean()) < 1e-9 and got[4] == 64.0
    rng = np.random.default_rng(3 * 1_000_003 + 1)
    s = rng.integers(-3000, 3000, 256 + 37 % 512).astype(np.int16).astype(np.float64)
    got1 = rows[1]["features"]
    assert abs(got1[0] - s.mean()) < 1e-9 and got1[4] == float(len(s))
    # unknown container bytes raise at the dispatch, not silently pass
    from gms_spark.multimodal.media import _numpy_decode

    try:
        _numpy_decode(b"\x00\x01garbage")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_lcg_media_checksums(spark):
    """synth_lcg_media's value contract: the decoded pixel/sample stats
    equal the analytic LCG formula — the invariant the media_decode
    driver oracle hash-checks (entry _media_decode_sql)."""
    import numpy as np

    from gms_spark.graph.coloring import ARITH_A, ARITH_B, ARITH_C, ARITH_P
    from gms_spark.multimodal.media import media_checksums, synth_lcg_media

    seed = 3
    salt = seed * ARITH_B % ARITH_P
    rows = {r["media_id"]: r for r in media_checksums(synth_lcg_media(spark, 10, seed=seed)).collect()}
    assert len(rows) == 10
    for i in (0, 1, 4, 7):
        if i % 2 == 0:
            nv = (8 + i % 24) * (8 + (i * 7) % 24) * 3
            j = np.arange(nv, dtype=np.int64)
            vals = ((i % ARITH_P) * ARITH_A + j * ARITH_C + salt) % ARITH_P % 256
        else:
            nv = 256 + (i * 37) % 512
            j = np.arange(nv, dtype=np.int64)
            vals = ((i % ARITH_P) * ARITH_A + j * ARITH_C + salt) % ARITH_P % 4001 - 2000
        r = rows[i]
        assert (r["n_values"], r["value_sum"], r["value_min"], r["value_max"]) == (
            nv, int(vals.sum()), int(vals.min()), int(vals.max())
        )


def test_resize_ppm_nearest():
    """Floor-map nearest-neighbor: out[y, x] == in[(y*h)//oh, (x*w)//ow],
    checked element-by-element against the definition, down- and up-sampling."""
    import numpy as np

    from gms_spark.multimodal.media import resize_ppm

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    for ow, oh in ((5, 7), (20, 3), (13, 9), (1, 1)):
        out = resize_ppm(px, ow, oh)
        assert out.shape == (oh, ow, 3)
        for y in range(oh):
            for x in range(ow):
                assert (out[y, x] == px[(y * 9) // oh, (x * 13) // ow]).all()


def test_resize_media_end_to_end(spark):
    """resize_media: images decode → resize → re-encode through the real
    PPM codec (checked vs a local numpy replay of the same payloads);
    audio rows pass through byte-identical — their checksums equal the
    un-resized decode's. This is the invariant the media_resize driver
    oracle hash-checks (entry _media_resize_sql)."""
    import numpy as np

    from gms_spark.multimodal.media import (
        decode_ppm,
        media_checksums,
        resize_media,
        resize_ppm,
        synth_lcg_media,
    )

    n, ow, oh = 12, 5, 7
    media = synth_lcg_media(spark, n, seed=3)
    plain = {r["media_id"]: r for r in media_checksums(media).collect()}
    resized = {
        r["media_id"]: r
        for r in media_checksums(resize_media(media, ow, oh)).collect()
    }
    assert set(resized) == set(range(n))
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for i in range(n):
        if i % 2 == 0:
            want = resize_ppm(decode_ppm(payloads[i]), ow, oh).astype(np.int64).ravel()
            r = resized[i]
            assert (r["n_values"], r["value_sum"], r["value_min"], r["value_max"]) == (
                want.size, int(want.sum()), int(want.min()), int(want.max())
            )
            assert r["n_values"] == ow * oh * 3
        else:
            assert resized[i] == plain[i]


def test_stream_dedup_matches_batch_keys(spark, tmp_path):
    """Streaming first-seen dedup drains to exactly the batch-distinct
    key set (row choice within a key is arrival-order-dependent by
    contract, so the equality is on keys + counts, both deterministic)."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select("ts", "user_id", "event_type")
    batch_keys = {
        (r["user_id"], r["event_type"])
        for r in ev.select("user_id", "event_type").distinct().collect()
    }

    src = str(tmp_path / "dedup_in")
    ev.write.parquet(src)
    from gms_spark.streaming.dedup import stream_dedup

    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = stream_dedup(stream, ["user_id", "event_type"], watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select user_id, event_type from dedup_test").collect()
    got = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(got) == len(set(got)) == len(batch_keys)
    assert set(got) == batch_keys


def test_canonical_url_stream_dedup(spark, tmp_path):
    """Messy urls canonicalized IN the stream dedup to the same canonical
    set the batch url_dedup query computes on identical input."""
    from gms_spark.urls import canonicalize_url, messy_urls, url_dedup

    n = 60
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    # ts offset off epoch 0: the initial streaming watermark IS epoch 0
    # and the late filter drops rows with ts <= watermark, so a row at
    # exactly 1970-01-01T00:00:00 silently vanishes (measured)
    m = messy_urls(docs, group=3, seed=11).withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id") * 60 + 86400)
    )
    batch_canon = {
        r["canonical"] for r in url_dedup(m, url_col="raw_url").select("canonical").collect()
    }

    src = str(tmp_path / "urls_in")
    m.select("doc_id", F.col("raw_url").alias("url"), "ts").write.parquet(src)
    from gms_spark.streaming.dedup import canonical_url_stream_dedup

    stream = spark.readStream.schema("doc_id long, url string, ts timestamp").parquet(src)
    # watermark wider than the data's 60-min ts span: availableNow may
    # split the input into several micro-batches in arbitrary file order,
    # and rows older than an already-advanced watermark are dropped as
    # late (correct streaming semantics, wrong for an equality test)
    out = canonical_url_stream_dedup(stream, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("urldedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["canonical"] for r in spark.sql("select canonical from urldedup_test").collect()]
    assert len(got) == len(set(got)) == len(batch_canon)
    assert set(got) == batch_canon
