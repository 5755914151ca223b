"""Text-analysis operators: language id, quality scoring, token stats,
document fingerprints.

All four are pure JVM-side column expressions (no UDFs): they stay inside
whole-stage codegen, and being arithmetic/built-in only, the DuckDB
oracles replicate them exactly. Every heuristic here is deliberately
simple and *pinned* — the value is the deterministic, scale-free plan
shape, not linguistic accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny pinned stopword lists (the heuristic's spec, not a library import).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "por"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "du", "est", "dans"],
}
LANGS = sorted(STOPWORDS)


def _toks(text_col: str):
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_hits) — stopword-vote n-gram-free lang id.

    argmax over per-language stopword hit counts; ties (incl. all-zero)
    resolve to the alphabetically first language among the tied, or
    'und' when no stopword hits at all.
    """
    t = _toks(text_col)
    hit_cols = {
        lang: F.size(F.filter(t, lambda x: x.isin(words))).cast("long").alias(f"hits_{lang}")
        for lang, words in STOPWORDS.items()
    }
    d = docs.select("doc_id", *hit_cols.values())
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANGS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANGS:  # alphabetical: first match wins ties
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return d.select("doc_id", pred.alias("lang_pred"), best.alias("lang_hits"))


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, distinct_ratio, mean_token_len, score).

    score = distinct_ratio * least(n_tokens, 64)/64 — rewards length up
    to a cap and penalizes repetition (the classic boilerplate signal).
    """
    t = _toks(text_col)
    d = docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
        F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).alias("total_chars"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("distinct_ratio"),
        F.round(F.col("total_chars") / F.col("n_tokens"), 6).alias("mean_token_len"),
        F.round(
            (F.col("n_distinct") / F.col("n_tokens"))
            * (F.least(F.col("n_tokens"), F.lit(64)) / F.lit(64.0)),
            6,
        ).alias("score"),
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars, est_subwords).

    est_subwords = Σ ceil(len(tok)/4) — a BPE-ish length-based budget
    estimate (≈ GPT-style 4 chars/token) without any vocab dependency.
    """
    t = _toks(text_col)
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.ceil(F.length(x) / 4.0)).alias(
            "est_subwords"
        ),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — position-weighted arithmetic fingerprint.

    fp = Σ_i (i+1)·(ascii(first char)·31 + len(tok_i)) mod 2^31-1: a
    rolling-hash-style content fingerprint stable across engines (no
    murmur/xxhash dependence), usable as a cheap pre-dedupe key.
    """
    toks = docs.select("doc_id", F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")).where(
        F.col("tok") != ""
    )
    term = (F.col("pos") + 1) * (F.ascii(F.col("tok")) * 31 + F.length("tok"))
    return toks.groupBy("doc_id").agg((F.sum(term) % F.lit(2147483647)).alias("fp"))


def top_ngrams(docs: DataFrame, n: int = 3, k: int = 20, text_col: str = "text") -> DataFrame:
    """Corpus-wide top-k word n-grams — the boilerplate detector of a
    training-data pipeline (an n-gram recurring across many documents is
    shared template text worth stripping before training).

    Pure JVM expressions: tokenize once, slide the n-window with
    transform(sequence) + slice (no explode-then-self-join — the n-gram
    is assembled inside the row before the ONE exploding projection),
    then a single partial-agg groupBy. Output (ngram, freq, n_docs),
    top-k by (freq DESC, ngram ASC) — the tie-break makes the cut
    deterministic and engine-agnostic.
    """
    toks = _toks(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("freq"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("freq").desc(), F.col("ngram"))
        .limit(k)
    )
