"""Document-level quality filter rulesets: Gopher + C4 (scale extension).

The two canonical published pretraining-data filter rule sets, as pure
Catalyst column expressions (whole-stage codegen, zero shuffle, zero
Python) — the per-document complement to the corpus-level dedup stack:

- **Gopher rules** (Rae et al., "Scaling Language Models: Methods,
  Analysis & Insights from Training Gopher", arXiv:2112.11446, App. A1.1):
  word-count bounds, mean-word-length band, symbol-to-word ratio,
  bullet-/ellipsis-line ratios, alphabetic-word ratio, required-stopword
  count.  (The repetition-based Gopher rules live in
  ``text_stats.repetition_stats``.)
- **C4 rules** (Raffel et al., "Exploring the Limits of Transfer Learning
  with a Unified Text-to-Text Transformer", arXiv:1910.10683, §2.2):
  terminal-punctuation line retention, minimum sentence count, lorem
  ipsum / curly-brace / "javascript"-line page drops.

Every signal is an integer count or an int/int division, so the columns
reproduce bit-identically in any engine — the correctness gate is a
DuckDB twin over the same parquet (tests/test_quality_filters.py), the
same pattern as ``repetition_stats``.

100 TB framing: one projected scan, no exchange in the plan (test-pinned);
the boolean verdicts are cheap enough to fuse into any ingest pipeline's
first pass, and the signal columns (not just the verdict) are emitted so
thresholds can be re-tuned without re-scanning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# same tokenization as the dedup/hash family — ONE definition repo-wide
from llmxmapreduce_spark.operators.text_stats import ws_tokens as _words

# Gopher A1.1's required-word screen: a document must contain at least
# ``min_required_stopwords`` of these.
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLET_RE = r"^\s*[-*•]"          # line starts with -, * or •
_ELLIPSIS_RE = r"(\.\.\.|…)\s*$"   # line ends with ... or …
_TERMINAL_RE = r'[.!?"]\s*$'            # C4: line ends in terminal punct


def _lines(text: Column) -> Column:
    return F.split(text, r"\n")


def gopher_signals(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_required_stopwords: int = 2,
) -> DataFrame:
    """Append the Gopher A1.1 signal columns + ``gopher_pass`` verdict.

    Thresholds default to the paper's published values (50–100k words,
    mean word length 3–10, ≤10% '#'/'…' symbols per word, ≤90% bullet
    lines (the paper removes docs with MORE than 90%), ≤30% ellipsis
    lines, ≥80% words with an alphabetic char, ≥2 of
    the 8 required stopwords).  All ratios are exact int/int doubles.
    """
    t = F.col(text_col)
    words = _words(t)
    lines = _lines(t)
    n_words = F.size(words)
    n_lines = F.size(lines)
    # total word length / n_words — sum of token lengths, not chars-minus-
    # separators, so runs of whitespace can't skew the mean
    total_word_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_word_len = total_word_len / n_words
    n_symbols = F.regexp_count(t, F.lit("#")) + \
        F.regexp_count(t, F.lit(r"(\.\.\.|…)"))
    symbol_word_ratio = n_symbols / n_words
    n_bullet_lines = F.size(F.filter(lines, lambda ln: ln.rlike(_BULLET_RE)))
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(_ELLIPSIS_RE)))
    bullet_line_ratio = n_bullet_lines / n_lines
    ellipsis_line_ratio = n_ellipsis_lines / n_lines
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_word_ratio = n_alpha_words / n_words
    lower_words = F.transform(words, F.lower)
    n_required = sum(
        (F.array_contains(lower_words, sw).cast("int")
         for sw in REQUIRED_STOPWORDS),
        start=F.lit(0),
    )
    gopher_pass = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_word_ratio <= max_symbol_word_ratio)
        & (bullet_line_ratio <= max_bullet_line_ratio)
        & (ellipsis_line_ratio <= max_ellipsis_line_ratio)
        & (alpha_word_ratio >= min_alpha_word_ratio)
        & (n_required >= min_required_stopwords)
    )
    return df.withColumns({
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_word_len.cast("double"),
        "symbol_word_ratio": symbol_word_ratio.cast("double"),
        "bullet_line_ratio": bullet_line_ratio.cast("double"),
        "ellipsis_line_ratio": ellipsis_line_ratio.cast("double"),
        "alpha_word_ratio": alpha_word_ratio.cast("double"),
        "n_required_stopwords": n_required.cast("int"),
        "gopher_pass": gopher_pass,
    })


def c4_signals(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Append the C4 §2.2 signal columns + ``c4_pass`` verdict and the
    line-filtered ``c4_clean_text``.

    Line rule (retention): keep only lines that end in terminal
    punctuation AND contain ≥ ``min_line_words`` words; drop any line
    containing the word "javascript".  Page rules (drop the document):
    fewer than ``min_sentences`` sentences (terminal-punct marks as the
    proxy), "lorem ipsum" anywhere, or a curly brace anywhere.
    ``c4_clean_text`` is the surviving-lines rejoin — the column a real
    ingest pipeline feeds forward.
    """
    t = F.col(text_col)
    lines = _lines(t)
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(_TERMINAL_RE)
        & (F.size(F.split(F.trim(ln), r"\s+")) >= min_line_words)
        & ~F.lower(ln).contains("javascript"),
    )
    n_sentences = F.regexp_count(t, F.lit("[.!?]"))
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    c4_pass = (
        (n_sentences >= min_sentences) & ~has_lorem & ~has_brace
        & (F.size(kept) > 0)
    )
    return df.withColumns({
        "n_kept_lines": F.size(kept).cast("int"),
        "n_sentences": n_sentences.cast("int"),
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "c4_clean_text": F.concat_ws("\n", kept),
        "c4_pass": c4_pass,
    })


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    rules: tuple[str, ...] = ("gopher", "c4"),
    keep_clean_text: bool = False,
    **thresholds,
) -> DataFrame:
    """Apply the selected rulesets and keep only passing documents, with
    the original schema (signals are internal here; use the ``*_signals``
    functions directly to keep them for threshold tuning).

    ``keep_clean_text`` (requires the ``"c4"`` ruleset): replace
    ``text_col`` in the output with ``c4_clean_text`` — C4 §2.2 REMOVES
    offending lines (no terminal punctuation, < 5 words, "javascript",
    …) rather than only gating whole pages; without this flag the line
    rule acts as a document gate and the bad lines survive into
    downstream stages."""
    import inspect

    if keep_clean_text and "c4" not in rules:
        raise TypeError("quality_filter: keep_clean_text requires the "
                        "'c4' ruleset (it IS C4's line removal)")
    out = df
    orig_cols = df.columns
    g_keys = set(inspect.signature(gopher_signals).parameters) - {"df", "text_col"}
    c_keys = set(inspect.signature(c4_signals).parameters) - {"df", "text_col"}
    unknown = set(thresholds) - g_keys - c_keys
    if unknown:
        raise TypeError(f"quality_filter: unknown thresholds {sorted(unknown)}")
    # a threshold for a ruleset that is NOT running would be silently
    # ignored — the caller believes a filter applies when nothing does
    orphaned = set()
    if "gopher" not in rules:
        orphaned |= set(thresholds) & g_keys
    if "c4" not in rules:
        orphaned |= set(thresholds) & c_keys
    if orphaned:
        raise TypeError(
            f"quality_filter: thresholds {sorted(orphaned)} target a "
            f"ruleset not in rules={rules!r}")
    if "gopher" in rules:
        g_kw = {k: v for k, v in thresholds.items() if k in g_keys}
        out = gopher_signals(out, text_col, **g_kw).filter("gopher_pass")
    if "c4" in rules:
        c_kw = {k: v for k, v in thresholds.items() if k in c_keys}
        out = c4_signals(out, text_col, **c_kw).filter("c4_pass")
        if keep_clean_text:
            out = out.withColumn(text_col, F.col("c4_clean_text"))
    return out.select(*orig_cols)
