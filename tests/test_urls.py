"""URL canonicalization + canonical-url dedup (gms_spark/urls.py)."""

import pytest

from gms_spark.graph.coloring import ARITH_A, ARITH_B, ARITH_C, ARITH_P
from gms_spark.urls import canonicalize_url, host_of, messy_urls, url_dedup

CASES = [
    # case-fold scheme+host only; default port; utm drop; param sort; fragment
    (
        "HTTPS://WWW.Example.COM:443/Path/Sub/?b=2&utm_source=x&a=1#frag",
        "https://www.example.com/Path/Sub?a=1&b=2",
    ),
    ("http://Host:80/", "http://host"),
    ("http://host:8080/x/", "http://host:8080/x"),  # non-default port kept
    ("https://host/p?utm_source=x&utm_campaign=y", "https://host/p"),
    ("https://host/p///", "https://host/p"),
    ("https://host", "https://host"),
    ("https://host/P/5", "https://host/P/5"),  # path case preserved
    ("https://host:443/a?z=1&y=2", "https://host/a?y=2&z=1"),
]


def test_canonicalize_url_cases(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def _py_mess(doc_id: int, group: int, seed: int):
    """Python replay of messy_urls' LCG decisions → (raw, canonical)."""
    salt = seed * ARITH_B % ARITH_P

    def h(k):
        return ((doc_id % ARITH_P) * ARITH_A + k * ARITH_C + salt) % ARITH_P

    t = doc_id // group
    hostname = f"site{t % 10}.example"
    scheme = "HTTPS" if h(1) % 2 == 0 else "https"
    host = hostname.upper() if h(2) % 2 == 0 else hostname
    port = ":443" if h(3) % 3 == 0 else ""
    slash = "/" if h(4) % 7 < 2 else ""
    params = [
        p
        for j, p in enumerate(["b=2", "utm_source=x", "a=1", "utm_campaign=y"])
        if h(5 + j) % 2 == 0
    ]
    query = "?" + "&".join(params) if params else ""
    frag = f"#s{h(9) % 5}" if h(9) % 5 < 2 else ""
    raw = f"{scheme}://{host}{port}/p/{t}{slash}{query}{frag}"
    kept = sorted(p for p in params if not p.startswith("utm_"))
    canonical = f"https://site{t % 10}.example/p/{t}" + ("?" + "&".join(kept) if kept else "")
    return raw, canonical


def test_messy_urls_canonicalize_end_to_end(spark):
    """messy_urls → canonicalize_url recovers the analytic canonical form
    for every doc — the invariant the url_dedup driver oracle hashes."""
    import pyspark.sql.functions as F

    n, group, seed = 40, 3, 11
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    m = messy_urls(docs, group=group, seed=seed)
    rows = {
        r["doc_id"]: (r["raw_url"], r["c"])
        for r in m.select("doc_id", "raw_url", canonicalize_url("raw_url").alias("c")).collect()
    }
    assert len(rows) == n
    seen_mess = set()
    for i in range(n):
        raw_want, canon_want = _py_mess(i, group, seed)
        raw_got, canon_got = rows[i]
        assert raw_got == raw_want, f"doc {i}: raw {raw_got!r} != {raw_want!r}"
        assert canon_got == canon_want, f"doc {i}: canonical {canon_got!r} != {canon_want!r}"
        seen_mess.add(raw_got != canon_got)
    # the generator actually exercises the mess (some raw == canonical is
    # fine; all-equal would mean the test proves nothing)
    assert True in seen_mess

    dd = {r["canonical"]: (r["n_docs"], r["keep_doc"]) for r in url_dedup(m, "raw_url").collect()}
    # replay the dedup in python
    want = {}
    for i in range(n):
        c = _py_mess(i, group, seed)[1]
        cnt, keep = want.get(c, (0, i))
        want[c] = (cnt + 1, min(keep, i))
    assert dd == want


def test_collapse_vertices_and_host_of(spark):
    """Graph coarsening vs a hand-computed rollup; host_of on canonicals."""
    import pyspark.sql.functions as F

    from gms_spark.graph.build import collapse_vertices

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (1, 0)], "src long, dst long"
    )
    # groups: {0,1} -> a, {2,3} -> b
    mapping = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b")], "vertex long, group string"
    )
    got = {(r["src"], r["dst"]): r["weight"] for r in collapse_vertices(edges, mapping).collect()}
    # a->b: (0,2),(1,2) ; b->a: (3,0) ; self loops (0,1),(1,0),(2,3) dropped
    assert got == {("a", "b"): 2, ("b", "a"): 1}
    withloops = {
        (r["src"], r["dst"]): r["weight"]
        for r in collapse_vertices(edges, mapping, drop_self_loops=False).collect()
    }
    assert withloops == {("a", "b"): 2, ("b", "a"): 1, ("a", "a"): 2, ("b", "b"): 1}

    # Second-level rollup (e.g. hosts -> domains) must SUM the weights
    # produced by the first collapse, not re-count parallel edges to 1.
    mapping2 = spark.createDataFrame([("a", "top"), ("b", "top2")], "vertex string, group string")
    first = collapse_vertices(edges, mapping)  # (a,b,2), (b,a,1)
    second = {
        (r["src"], r["dst"]): r["weight"]
        for r in collapse_vertices(first, mapping2, drop_self_loops=False).collect()
    }
    assert second == {("top", "top2"): 2, ("top2", "top"): 1}

    df = spark.createDataFrame(
        [("https://site3.example/p/9?a=1",), ("http://h.x:8080/q",)], "url string"
    )
    assert [r["h"] for r in df.select(host_of("url").alias("h")).collect()] == [
        "site3.example",
        "h.x",
    ]
