"""Gap sessionization: batch vs DuckDB oracle, plan shape, streaming twin."""

from __future__ import annotations

import contextlib
import io
import os
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from gms_spark.streaming.sessions import sessionize, stream_sessionize

SF = "/root/testdata/sf0.001"
GAP = 1800


def _oracle_sql(gap_seconds: int) -> str:
    gap_us = gap_seconds * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM numbered GROUP BY user_id, session_idx
"""


def _batch_key_map(rows):
    return {
        (r["user_id"], r["session_idx"]): (
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["sum_value"], 4),
        )
        for r in rows
    }


def test_batch_matches_duckdb(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = _batch_key_map(sessionize(ev, GAP).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    exp = {}
    for u, s, st, en, n, sv in con.execute(_oracle_sql(GAP)).fetchall():
        exp[(u, s)] = (st, en, n, round(sv, 4))
    assert got == exp
    assert len(got) > 10


def test_batch_plan_single_exchange(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sessionize(ev, GAP).explain(mode="simple")
    n_exchange = len(re.findall(r"Exchange hashpartitioning", buf.getvalue()))
    # windows + final groupBy all reuse HashPartitioning(user_id)
    assert n_exchange == 1, buf.getvalue()


def _expected_closed(batch_rows):
    """Batch sessions minus each user's final (still-open) session."""
    last_idx = {}
    for r in batch_rows:
        last_idx[r["user_id"]] = max(last_idx.get(r["user_id"], 0), r["session_idx"])
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["sum_value"], 4))
        for r in batch_rows
        if r["session_idx"] != last_idx[r["user_id"]]
    }


def _run_stream(spark, src: str, name: str, max_files: int | None = None):
    ev_schema = spark.read.parquet(f"{SF}/events.parquet").schema
    reader = spark.readStream.schema(ev_schema)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))
    q = (
        stream_sessionize(stream, GAP)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["sum_value"], 4))
        for r in spark.sql(f"select * from {name}").collect()
    }


def test_stream_single_batch_closes_all_but_tail(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn("ts", F.col("ts").cast("timestamp"))
    batch = sessionize(ev, GAP).collect()
    src = str(tmp_path / "ev_in")
    ev.coalesce(1).write.parquet(src)

    got = _run_stream(spark, src, "sess_one")
    # during the (single) data batch the watermark is still 0, so the gap
    # logic alone closes every non-tail session; the trailing no-data
    # micro-batch then advances the watermark to max(ts) and fires
    # event-time timeouts for tail sessions idle past the gap — so `got`
    # is the closed set plus some tail sessions, never anything else
    closed = _expected_closed(batch)
    all_sessions = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["sum_value"], 4))
        for r in batch
    }
    assert closed <= got <= all_sessions
    assert len(got) > len(closed)  # timeouts did close idle tails
    assert len(closed) > 10


def test_stream_state_carries_across_batches(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn("ts", F.col("ts").cast("timestamp"))
    batch = sessionize(ev, GAP).collect()
    all_sessions = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["sum_value"], 4))
        for r in batch
    }
    mid = ev.selectExpr("percentile(unix_micros(ts), 0.5) p").collect()[0]["p"]

    src = tmp_path / "ev_in2"
    src.mkdir()
    for name, pred in [("b0", F.unix_micros("ts") < mid), ("b1", F.unix_micros("ts") >= mid)]:
        out = tmp_path / f"w_{name}"
        ev.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        part.rename(src / f"{name}.parquet")
    # file source picks files oldest-mtime-first: pin the intended order
    now = os.path.getmtime(src / "b1.parquet")
    os.utime(src / "b0.parquet", (now - 120, now - 120))

    got = _run_stream(spark, str(src), "sess_two", max_files=1)
    # sessions spanning the batch boundary must merge through state; the
    # second batch may additionally close idle users' final sessions via
    # event-time timeout — so: closed ⊆ got ⊆ all batch sessions
    assert _expected_closed(batch) <= got
    assert got <= all_sessions


def test_stream_merge_handles_cross_batch_disorder(spark, tmp_path):
    """A later micro-batch whose first event PREDATES the carried open
    session (within the gap, inside the watermark slack) must min/max
    the merged session bounds, not blindly keep the carried ones."""
    import datetime as dt
    import os

    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)
    b0 = [(1, t(100), 1.0, 1), (1, t(200), 2.0, 2)]
    # 50s predates the carried (100..200) session; 5000s closes it by gap
    b1 = [(1, t(50), 4.0, 3), (1, t(5000), 8.0, 4)]
    schema = "user_id long, ts timestamp, value double, event_id long"

    src = tmp_path / "dis_in"
    src.mkdir()
    for name, rows in [("b0", b0), ("b1", b1)]:
        out = tmp_path / f"w_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        part.rename(src / f"{name}.parquet")
    now = os.path.getmtime(src / "b1.parquet")
    os.utime(src / "b0.parquet", (now - 120, now - 120))

    stream = (
        spark.readStream.schema(spark.createDataFrame(b0, schema).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_sessionize(stream, GAP, watermark="1000 seconds")
        .writeStream.format("memory")
        .queryName("sess_disorder")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["sum_value"], 4))
        for r in spark.sql("select * from sess_disorder").collect()
    }
    assert (1, t(50), t(200), 3, 7.0) in got, got
