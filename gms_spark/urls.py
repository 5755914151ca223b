"""URL canonicalization — the web-pipeline stage between crawl and graph.

A Common-Crawl-scale link graph is built from urls that name the same
page in many spellings (case-folded hosts, default ports, fragments,
tracking parameters, trailing slashes). Canonicalizing BEFORE the
vertex dictionary is built is what keeps one page from becoming five
vertices; it sits right next to the href extractor (`gms_spark.extract`)
in the pages → edges pipeline.

Everything here is pure JVM expressions (regexp/split/sort_array) — no
Python in the hot path, whole-stage-codegen friendly, embarrassingly
parallel (no shuffle). The canonical form implemented:

  1. fragment dropped (``#...``)
  2. scheme and host lowercased (path and query case preserved)
  3. default port stripped (``:80`` for http, ``:443`` for https)
  4. ``utm_*`` tracking parameters dropped; remaining query parameters
     sorted bytewise; ``?`` dropped when none remain
  5. trailing ``/``s stripped from the path

`messy_urls` synthesizes deterministic messy spellings from the engine
LCG mix (the same SQL-replayable arithmetic contract as the coloring
draws and media payloads), so the `url_dedup` driver query is fully
hash-checked against an analytic DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical spelling of an absolute http(s) url (module contract).

    Pure column expressions; safe to call inside any select/withColumn.
    Non-url strings degrade gracefully (empty scheme/host extracts).
    """
    u = F.regexp_replace(F.col(url) if isinstance(url, str) else url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), r"/+$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.startswith("utm_"),
    )
    q = F.array_join(F.sort_array(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, url_col: str = "url", key_col: str = "doc_id") -> DataFrame:
    """Exact dedup by canonical url: one partial-agg groupBy (the same
    single-shuffle shape as text exact_dedup). Returns
    (canonical, n_docs, keep_doc) with keep_doc = min key — the
    deterministic representative convention used across the dedup tier."""
    return (
        df.select(F.col(key_col), canonicalize_url(url_col).alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(key_col).alias("keep_doc"),
        )
    )


def host_of(url: Column | str) -> Column:
    """Hostname of an (ideally canonical) url — port/path/query dropped.
    The grouping key for page-graph → host-graph rollups."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]+)", 1)


# ---- deterministic messy-url synthesis (oracle-replayable) ------------

MESSY_PARAMS = ["b=2", "utm_source=x", "a=1", "utm_campaign=y"]  # raw order


def messy_urls(docs: DataFrame, group: int = 3, seed: int = 11) -> DataFrame:
    """(doc_id, raw_url): messy spellings of canonical page urls, every
    ``group`` consecutive doc_ids aiming at the same target page
    ``https://site{t%10}.example/p/{t}`` (t = doc_id div group).

    Mess decisions come from the engine LCG mix
    h(k) = ((doc_id % P)·A + k·C + seed·B % P) % P — pure int64 column
    arithmetic, so a SQL oracle replays every decision bit-for-bit:
      h(1)%2: scheme case    h(2)%2: host case    h(3)%3==0: :443 port
      h(4)%7<2: trailing /   h(5+j)%2==0: include MESSY_PARAMS[j]
      h(9)%5<2: fragment
    """
    from gms_spark.graph.coloring import ARITH_A, ARITH_B, ARITH_C, ARITH_P

    salt = seed * ARITH_B % ARITH_P
    i = F.col("doc_id").cast("long")

    def h(k: int) -> Column:
        return ((i % ARITH_P) * ARITH_A + F.lit(k * ARITH_C + salt).cast("long")) % ARITH_P

    t = F.expr(f"CAST(doc_id DIV {group} AS LONG)")
    hostname = F.concat(F.lit("site"), (t % 10).cast("string"), F.lit(".example"))
    scheme = F.when(h(1) % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https"))
    host = F.when(h(2) % 2 == 0, F.upper(hostname)).otherwise(hostname)
    port = F.when(h(3) % 3 == 0, F.lit(":443")).otherwise(F.lit(""))
    slash = F.when(h(4) % 7 < 2, F.lit("/")).otherwise(F.lit(""))
    # concat_ws skips nulls — absent params just vanish from the join
    qs = F.concat_ws(
        "&",
        *[
            F.when(h(5 + j) % 2 == 0, F.lit(p)).otherwise(F.lit(None))
            for j, p in enumerate(MESSY_PARAMS)
        ],
    )
    query = F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit(""))
    frag = F.when(h(9) % 5 < 2, F.concat(F.lit("#s"), (h(9) % 5).cast("string"))).otherwise(
        F.lit("")
    )
    raw = F.concat(
        scheme, F.lit("://"), host, port, F.lit("/p/"), t.cast("string"), slash, query, frag
    )
    return docs.select(F.col("doc_id").cast("long").alias("doc_id"), raw.alias("raw_url"))
