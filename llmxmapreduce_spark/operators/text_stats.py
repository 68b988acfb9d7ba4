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


def lower_ws_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens — THE shared tokenizer expression for
    every hashed/feature path (vocab build + id encoding, DSIR features,
    LM training + scoring, badword gate).  One copy on purpose: these
    consumers must tokenize in lockstep or vocab ids silently
    desynchronize from encoder tokens (review finding)."""
    return F.split(F.trim(F.lower(text)), r"\s+")


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
    short-text partial-gram edge cases).  (r13 note: a slice+array_join-
    per-index formulation was measured 2-3× SLOWER than this chain —
    per-element array slicing doesn't pay off; consumers that only need
    gram EQUALITY, not gram text, use the string-free multi-arg xxhash64
    window family in operators/decontamination.py instead.)"""
    words = ws_tokens(F.lower(text))
    g = words
    for j in range(1, n):
        g = F.zip_with(
            g,
            F.slice(words, j + 1, F.greatest(F.size(words) - j, F.lit(1))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.slice(g, 1, F.greatest(F.size(words) - (n - 1), F.lit(1)))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_gram_n: int = 2,
    dup_gram_n: int = 5,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, §A1.1):
    documents dominated by repeated lines or n-grams are low-value training
    data.  Adds four columns per document (0.0 when the document is empty):

    - ``dup_line_frac``       — repeated-line occurrences beyond the first /
      total non-empty lines (what a perfect per-doc line-dedup would delete)
    - ``dup_line_char_frac``  — same, weighted by line length in chars
    - ``top_{k}gram_frac``    — occurrences of the single most frequent word
      k-gram / total k-grams (k = ``top_gram_n``)
    - ``dup_{m}gram_frac``    — occurrences of m-grams appearing more than
      once / total m-grams (m = ``dup_gram_n``)

    Plan: explode → count aggregate (partial+final, map-side combine) per
    (doc, line) / (doc, gram) → per-doc rollup → joined back on id.  Each
    signal is one shuffle keyed on (id, token); no per-document quadratic
    expression work, so a pathological 1M-line document costs the same per
    line as a normal one.  Tokenization matches ``ngram_shingles``
    (lowercase, whitespace split), so the numbers line up with the
    MinHash/Jaccard dedup family."""
    t = F.col(text_col)
    top_col = f"top_{top_gram_n}gram_frac"
    dup_col = f"dup_{dup_gram_n}gram_frac"

    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    lc = (
        df.select(F.col(id_col), F.explode(lines).alias("ln"))
        .groupBy(id_col, "ln")
        .agg(F.count("*").alias("c"))
    )
    line_stats = lc.groupBy(id_col).agg(
        ((F.sum("c") - F.count("*")) / F.sum("c")).alias("dup_line_frac"),
        (
            F.sum(F.when(F.col("c") > 1, (F.col("c") - 1) * F.length("ln")).otherwise(0))
            / F.sum(F.col("c") * F.length("ln"))
        ).alias("dup_line_char_frac"),
    )

    # Whitespace-normalize before shingling: Spark split keeps a trailing
    # empty token when the text ends in whitespace, which would seed
    # phantom grams ("word ") — collapse runs to single spaces and trim so
    # tokenization is exactly str.split() semantics.
    cleaned = F.trim(F.regexp_replace(t, r"\s+", " "))

    def gram_counts(n: int) -> DataFrame:
        # r13: group on string-free multi-arg xxhash64 window hashes
        # instead of gram strings (decontamination._window_hash_array —
        # same equivalence classes; only COUNTS leave this subquery, so
        # the gram text is never needed).  The words array is projected
        # as its own column first: a captured expression tree would
        # re-run the split once per window position (measured 7× blow-up
        # on the decontamination path).  Empty/whitespace-only text
        # (cleaned = '') formerly shingled to [""] and was filtered by
        # gram length; here it is excluded up front — identical rows.
        from llmxmapreduce_spark.operators.decontamination import (
            _window_hash_array)

        words = F.split(F.lower(F.col("__ct")), " ")
        src = df.select(
            F.col(id_col), cleaned.alias("__ct")
        ).filter(F.length("__ct") > 0).select(
            F.col(id_col), words.alias("__wd"))
        return (
            src.select(
                F.col(id_col),
                F.explode(_window_hash_array(F.col("__wd"), n)).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count("*").alias("c"))
        )

    top_stats = gram_counts(top_gram_n).groupBy(id_col).agg(
        (F.max("c") / F.sum("c")).alias(top_col)
    )
    dup_stats = gram_counts(dup_gram_n).groupBy(id_col).agg(
        (F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c")).alias(dup_col)
    )
    out = (
        df.join(line_stats, id_col, "left")
        .join(top_stats, id_col, "left")
        .join(dup_stats, id_col, "left")
    )
    return out.fillna(
        0.0, subset=["dup_line_frac", "dup_line_char_frac", top_col, dup_col]
    )


def repetition_stats_fast(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_gram_n: int = 2,
    dup_gram_n: int = 5,
) -> DataFrame:
    """Arrow production twin of :func:`repetition_stats` — identical output
    (test-pinned), ~6× the throughput at sf1.

    Every signal is PER-DOCUMENT, so the explode → groupBy(id, token) plan
    shuffles ~150M token rows for stats computable in one pass over each
    row: this variant runs a Counter per document inside ``mapInPandas``
    (no shuffle, no exchange — the output partitioning is the input's).
    Keep the expression/explode variant as the engine-portable twin the
    DuckDB gate can mirror."""
    import pandas as pd

    from collections import Counter

    top_col = f"top_{top_gram_n}gram_frac"
    dup_col = f"dup_{dup_gram_n}gram_frac"
    other = [c for c in df.columns if c != text_col]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + (", dup_line_frac double, dup_line_char_frac double, "
         f"{top_col} double, {dup_col} double")

    def grams(toks: list[str], n: int) -> list[str]:
        if len(toks) >= n:
            return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        return [" ".join(toks)] if toks else []

    def stats(text: str):
        # strip(' ') — not strip() — to match Catalyst trim (spaces only)
        lines = [ln.strip(" ") for ln in (text or "").split("\n")]
        lines = [ln for ln in lines if ln]
        if lines:
            lc = Counter(lines)
            n_lines = len(lines)
            dup_line = (n_lines - len(lc)) / n_lines
            tot_chars = sum(c * len(ln) for ln, c in lc.items())
            dup_chars = sum((c - 1) * len(ln) for ln, c in lc.items() if c > 1)
            dup_line_char = dup_chars / tot_chars if tot_chars else 0.0
        else:
            dup_line = dup_line_char = 0.0
        toks = (text or "").lower().split()
        g_top = Counter(grams(toks, top_gram_n))
        top_frac = max(g_top.values()) / g_top.total() if g_top else 0.0
        g_dup = Counter(grams(toks, dup_gram_n))
        dup_frac = (
            sum(c for c in g_dup.values() if c > 1) / g_dup.total()
            if g_dup else 0.0
        )
        return dup_line, dup_line_char, top_frac, dup_frac

    def run(batches):
        for pdf in batches:
            vals = [stats(t) for t in pdf[text_col]]
            res = pd.DataFrame(
                vals,
                columns=["dup_line_frac", "dup_line_char_frac", top_col, dup_col],
                index=pdf.index,
            )
            yield pd.concat([pdf, res], axis=1)

    return df.mapInPandas(run, out_schema)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Deflate-ratio repetitiveness signal (the "gzip ratio" heuristic
    of crawl-curation pipelines, e.g. Dolma §Appendix / RefinedWeb-class
    filters): ``len(zlib.compress(utf8)) / len(utf8)``.  Templated spam,
    keyword stuffing, and machine-generated boilerplate compress far
    below natural prose (EN prose ≈ 0.35-0.45 at level 6; heavy
    repetition → < 0.2), while random-ish payloads (minified JS, base64
    blobs) sit near or above 1.0 — both tails are drop candidates.

    Complements :func:`repetition_stats`: the n-gram fractions see exact
    repeats; deflate's LZ77 window also prices near-repeats and long-
    range structure.  Per-document, so the plan is one ``mapInPandas``
    pass — no shuffle, output partitioning is the input's; the byte work
    is zlib's C loop, Arrow-batched.  Null text → null; empty → null
    (no bytes to price, and 0-byte ratios would pollute quantiles).
    """
    import zlib

    import pandas as pd

    other_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{other_schema}, {out_col} double"

    def ratio(t):
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return None
        return len(zlib.compress(raw, level)) / len(raw)

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [ratio(t) for t in pdf[text_col]], index=pdf.index,
                dtype="float64")
            yield pdf

    return df.mapInPandas(run, out_schema)


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


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    nfc: bool = True,
    collapse_whitespace: bool = True,
) -> DataFrame:
    """Canonical text normalization for the HASH-KEYED operators (exact
    dedup, fingerprints, MinHash, decontamination — CCNet/C4-style): strip
    control and zero-width characters, collapse whitespace runs to single
    spaces, trim, and (optionally) Unicode NFC-compose.

    ORDERING CAVEAT: whitespace collapse destroys LINE structure, so run
    the line-based operators (Gopher/C4 ``quality_filters``,
    ``span_dedup``'s sentence split across lines) on the RAW text first —
    or pass ``collapse_whitespace=False`` to get only the control-strip +
    NFC passes, which are line-safe.

    The control/zero-width strip and whitespace collapse are Catalyst
    ``regexp_replace`` (whole-stage codegen); NFC composition has no
    Spark builtin, so it runs as one Arrow batch pass
    (``unicodedata.normalize`` — the same normal form as DuckDB's
    ``nfc_normalize``, which the twin test pins).  With ``nfc=False``
    the operator is pure Catalyst, zero Python.
    """
    out = out_col or text_col
    # C0/C1 controls (minus \t\n\r, which the whitespace pass handles)
    # + zero-width space/joiners + BOM
    cleaned = F.regexp_replace(
        F.col(text_col),
        "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f​‌‍﻿]",
        "")
    if collapse_whitespace:
        cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    res = df.withColumn(out, cleaned)
    if not nfc:
        return res

    def compose(batches):
        import unicodedata

        for pdf in batches:
            pdf[out] = pdf[out].map(
                lambda s: unicodedata.normalize("NFC", s)
                if isinstance(s, str) else s)
            yield pdf

    return res.mapInPandas(compose, res.schema)
