"""Named corpus-curation presets — public recipes on the existing knobs.

Each preset returns a :class:`~llmxmapreduce_spark.pipelines.corpus_prep.
CorpusPrepConfig` wired to match a published pipeline's documented
choices, so "run a C4-style / Gopher-style / RefinedWeb-style prep" is
one call instead of a dozen threshold decisions.  They compose ONLY
operators this repo already ships (each field cites where the stage
lives); a preset is configuration, not new semantics.

Sources (public papers; parameters as published):
- **C4** (Raffel et al. 2019, §2.2): one page per canonical URL, line
  filtering (terminal punctuation / "javascript" / lorem ipsum / code
  braces), bad-word page gate, 3-sentence minimum.
- **Gopher rules** (Rae et al. 2021, A1.1): word count 50-100k, mean
  word length 3-10, symbol/word ratios, bullet/ellipsis line limits,
  stop-word requirement.
- **RefinedWeb** (Penedo et al. 2023, §3): URL blocklist first, fuzzy
  dedup then EXACT-SUBSTRING dedup (Lee et al. 2021's 50-token window),
  Gopher-style quality rules.
- **GPT-3-style decontamination** (Brown et al. 2020, App. C):
  13-gram overlap scrub against the benchmark suite.

The thresholds are in ``quality_thresholds`` (quality_filters.py
consumes them) — callers can override any single knob by mutating the
returned config, which is a plain dataclass.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame

from llmxmapreduce_spark.pipelines.corpus_prep import CorpusPrepConfig

__all__ = [
    "c4_preset",
    "gopher_preset",
    "refinedweb_preset",
    "gpt3_decontaminated_preset",
    "PRESETS",
]


def c4_preset(badwords: DataFrame | None = None,
              seed: int = 42) -> CorpusPrepConfig:
    """C4 §2.2: canonical-URL dedup (min-id election, url_filter.py),
    line REMOVAL feeding forward (quality_filters.c4_signals), bad-word
    page gate, span dedup of 3-sentence repeats.  No perplexity LM, no
    near-dup pass (C4 predates MinHash-scale fuzzy dedup)."""
    return CorpusPrepConfig(
        url_dedup=True,
        c4_line_filter=True,
        badwords=badwords,
        quality=True,
        quality_rules=("c4",),        # pure C4: no Gopher gates
        quality_thresholds={"min_sentences": 3, "min_line_words": 5},
        redact=True,                  # C4 drops pages with PII-ish braces;
        span=3,                       # the repo's redact stage is stricter
        neardup=False,                # C4 predates fuzzy dedup; the exact
                                      # and 3-sentence span passes still run
        seed=seed,
    )


def gopher_preset(seed: int = 42) -> CorpusPrepConfig:
    """Gopher A1.1 rule set via quality_filters.gopher_signals: word
    count in [50, 100_000], mean word length in [3, 10], symbol-to-word
    and hash/ellipsis caps, ≥ 80 % alphabetic-bearing lines, stop-word
    presence.  MassiveText also near-dedups (0.8 Jaccard) — kept here."""
    return CorpusPrepConfig(
        quality=True,
        quality_rules=("gopher",),    # the pure A1.1 rule set
        quality_thresholds={
            "min_words": 50, "max_words": 100_000,
            "min_mean_word_len": 3.0, "max_mean_word_len": 10.0,
            "max_symbol_word_ratio": 0.1,
            "max_bullet_line_ratio": 0.9,
            "max_ellipsis_line_ratio": 0.3,
            "min_alpha_word_ratio": 0.8,
            "min_required_stopwords": 2,
        },
        neardup_threshold=0.8,
        neardup_verify="estimate",
        seed=seed,
    )


def refinedweb_preset(url_blocklist: DataFrame | None = None,
                      seed: int = 42) -> CorpusPrepConfig:
    """RefinedWeb §3: blocklist FIRST (costs a string compare, not a
    fetch), canonical-URL dedup, Gopher-style rules, fuzzy dedup
    (MinHash estimate verify) THEN exact-substring masking with the
    Lee-et-al 50-token window (substring_dedup.py fast path)."""
    cfg = gopher_preset(seed=seed)
    return replace(
        cfg,
        url_blocklist=url_blocklist,
        url_dedup=True,
        substring_n=50,
        neardup_threshold=0.7,
    )


def gpt3_decontaminated_preset(benchmark: DataFrame,
                               seed: int = 42) -> CorpusPrepConfig:
    """GPT-3 App. C: the quality-filtered, fuzzily-deduped corpus
    scrubbed of 13-gram overlaps with the eval suite
    (decontamination.py poly-hash fast twin).  The quality-classifier
    Pareto admission (quality_classifier.py) is a separate scoring pass
    by design — it needs a fitted weight vector, which is an input, not
    a config constant."""
    return CorpusPrepConfig(
        quality=True,
        benchmark=benchmark,
        decon_n=13,
        neardup_threshold=0.7,
        neardup_verify="estimate",
        seed=seed,
    )


PRESETS = {
    "c4": c4_preset,
    "gopher": gopher_preset,
    "refinedweb": refinedweb_preset,
    "gpt3": gpt3_decontaminated_preset,
}
