"""Dedup / text-analysis operators on the driver's documents table (sf0.001)."""

from __future__ import annotations

import numpy as np
import pytest

from gms_spark.text.analysis import fingerprint, language_id, quality_score, token_stats
from gms_spark.text.dedup import (
    exact_dedup,
    jaccard_join,
    minhash_lsh_join,
    shingle_ids,
    simhash64,
    simhash_near_dup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


def brute_jaccard_pairs(docs_pdf, k=3, threshold=0.3):
    sets = {}
    for _, r in docs_pdf.iterrows():
        toks = [t for t in r["text"].split(" ") if t]
        sets[r["doc_id"]] = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if round(j, 6) >= threshold:
                out[(a, b)] = round(j, 6)
    return out


def test_exact_dedup(docs):
    res = exact_dedup(docs)
    assert res.count() == docs.select("text").distinct().count()


def test_jaccard_join_exact_vs_brute(docs):
    want = brute_jaccard_pairs(docs.toPandas(), threshold=0.3)
    got = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_join(docs, threshold=0.3).collect()}
    assert got.keys() == want.keys()
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=1e-6)


def test_minhash_lsh_finds_planted_dups(docs):
    want = brute_jaccard_pairs(docs.toPandas(), threshold=0.3)
    got = {(r["a"], r["b"]) for r in minhash_lsh_join(docs, threshold=0.3).collect()}
    # LSH verified-pairs ⊆ exact; with r=2,b=12 recall ≈ 1 at J≥0.3
    assert got <= set(want)
    assert len(got) >= 0.9 * len(want)


def test_simhash_deterministic_and_near_dup(docs):
    s1 = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    s2 = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert s1 == s2
    pairs = simhash_near_dup(docs, threshold=0.3)
    want = brute_jaccard_pairs(docs.toPandas(), threshold=0.3)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert got <= set(want)


def test_token_stats(docs):
    row = token_stats(docs).where("doc_id = 0").first()
    text = docs.where("doc_id = 0").first()["text"]
    toks = [t for t in text.split(" ") if t]
    assert row["n_tokens"] == len(toks)
    assert row["n_chars"] == len(text)
    assert row["est_subwords"] == sum((len(t) + 3) // 4 for t in toks)


def test_quality_and_langid_and_fingerprint_shapes(docs):
    n = docs.count()
    q = quality_score(docs)
    assert q.count() == n
    assert q.where("score > 1.0 or score < 0.0").count() == 0
    li = language_id(docs)
    assert li.count() == n
    assert li.where("lang_pred is null").count() == 0
    fp = fingerprint(docs)
    assert fp.count() == n
    # deterministic
    fp2 = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert {r["doc_id"]: r["fp"] for r in fp.collect()} == fp2


def test_shingle_ids_dense(docs):
    sh = shingle_ids(docs)
    mx = sh.agg({"shingle": "max"}).first()[0]
    distinct = sh.select("shingle").distinct().count()
    assert mx == distinct  # dense 1..V


def test_dedup_clusters_transitive(spark):
    """Cluster resolution groups TRANSITIVE near-dups (A~B~C with A,C
    below threshold) and keeps exactly the min doc_id per cluster —
    checked against a brute-force union-find over brute-force pairs."""
    from gms_spark.text.dedup import dedup_clusters

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup_clusters(docs, threshold=0.3, num_hashes=24, band_rows=2, seed=7)
    got = {int(r["doc_id"]): (int(r["cluster"]), bool(r["keep"]), int(r["cluster_size"])) for r in out.collect()}

    # brute force: exact pairs (LSH at r=2,b=12 has ~0 miss probability at
    # J>=0.3 for this corpus — asserted below by equality, not assumed)
    pdf = docs.toPandas()
    pairs = brute_jaccard_pairs(pdf, k=3, threshold=0.3)
    # LSH candidates can only MISS pairs, never invent them; equality of
    # the resulting clustering asserts no miss changed connectivity
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    want = {}
    for root, members in comp.items():
        lab = min(members)
        for m in members:
            want[m] = (lab, m == lab, len(members))
    assert got == want
    # the fixture corpus must actually exercise transitivity: at least
    # one cluster larger than a single pair
    assert any(sz > 2 for (_, _, sz) in got.values())


def test_top_ngrams_hand_corpus(spark):
    """n-gram window + counts + deterministic tie-break on a corpus
    small enough to verify by hand; short docs contribute nothing."""
    from gms_spark.text.analysis import top_ngrams

    docs = spark.createDataFrame(
        [
            (0, "a b c a b c"),      # "a b c" x2, "b c a", "c a b"
            (1, "a b c"),            # "a b c" x1
            (2, "b c"),              # shorter than n: no 3-grams
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = [(r["ngram"], r["freq"], r["n_docs"]) for r in top_ngrams(docs, n=3, k=3).collect()]
    assert rows == [("a b c", 3, 2), ("b c a", 1, 1), ("c a b", 1, 1)]
