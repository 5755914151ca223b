"""Deterministic synthesis of Common-Crawl-style ``pages``.

Schema per BASELINE.json input_hint:
    pages(url: string, warc_ts: timestamp, html: binary, text: string,
          lang: string)

Everything is a pure function of (row index i, n, seed) via splitmix64
integer mixing — order-independent and partition-deterministic, the same
design as the reference generators (gms/third_party/gapbs/generator.h:64-124
hash per edge index; fixed seed gms/third_party/gapbs/util.h:25). The link
targets are Zipf-skewed so a handful of hub pages receive very high
in-degree — this deliberately exercises the salting / skew paths.

The single-process :func:`page_record` is the oracle; the Spark path
(:func:`synth_pages`) calls the same function per Arrow batch, so both
paths are byte-identical by construction.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MASK64 = (1 << 64) - 1
_EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)


def mix64(x: int) -> int:
    """splitmix64 finalizer — the engine's deterministic hash primitive."""
    x = (x + 0x9E3779B97F4A7C15) & MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK64
    return x ^ (x >> 31)


def page_url(i: int, n_sites: int) -> str:
    return f"https://site{i % n_sites}.example/p/{i}"


def page_links(i: int, n: int, seed: int) -> list[str]:
    """Deterministic out-link target urls for page i (may repeat / self)."""
    h = mix64(i * 0x2545F4914F6CDD1D + seed)
    k = 3 + (h % 8)  # 3..10 anchors
    hub_cut = max(1, n // 100)
    out = []
    n_sites = max(1, n // 10)
    for j in range(k):
        hj = mix64(h + 0x9E3779B97F4A7C15 * (j + 1))
        if hj % 10 < 3:  # 30% of links go to hub pages (Zipf-ish head)
            t = hj % hub_cut
        else:
            t = hj % n
        out.append(page_url(t, n_sites))
    return out


def page_record(i: int, n: int, seed: int = 42) -> dict:
    """The reference generator for one page row."""
    n_sites = max(1, n // 10)
    url = page_url(i, n_sites)
    links = page_links(i, n, seed)
    h = mix64(i ^ seed)
    words = [f"w{mix64(h + 31 * j) % 997}" for j in range(10 + h % 20)]
    parts = [f"<html><head><title>t{i}</title></head><body>"]
    for j, tgt in enumerate(links):
        parts.append(f"<p>{' '.join(words[j % len(words):(j % len(words)) + 5])}</p>")
        parts.append(f'<a href="{tgt}">a{j}</a>')
    parts.append(f"<p>{' '.join(words)}</p></body></html>")
    html = "".join(parts).encode("utf-8")
    lang = "de" if h % 17 == 0 else "en"
    from gms_spark.extract import extract  # shared: text column IS the oracle output

    text = extract(html, url).text
    return {
        "url": url,
        "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
        "html": html,
        "text": text,
        "lang": lang,
    }


PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def synth_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed pages synthesis: spark.range → Arrow-batched generator.

    Scales to any n: each partition generates its own index range with no
    shared RNG state (contrast with a driver-side loop, which would not).
    """
    if partitions is None:
        partitions = max(4, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [page_record(int(i), n, seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, PAGES_SCHEMA)
