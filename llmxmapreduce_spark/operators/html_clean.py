"""P17/P18 — deterministic HTML main-content extraction + language id.

Reference: LLMxMapReduce_V3/src/mcp_server/search/clean/html_extrator.py
(JusText/Resiliparse extraction with stopword-density ≥ 0.32 block
filtering, per-language stopword sets; charset/lang detect at :48-78).

Those libraries aren't in this container; this is the same *algorithmic
idea* — tag-boundary block segmentation + stopword-density keep/drop —
expressed entirely in Catalyst higher-order functions, so it runs JVM-side
with no Python and is bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.text_stats import EN_STOPWORDS

DENSITY_THRESHOLD = 0.32  # html_extrator.py stopword-density gate
MIN_BLOCK_TOKENS = 3

# html_extrator.py:45 — languages without word-delimiting spaces: the
# reference DISABLES the stopword-density gate for these (JusText runs
# with is_boilerplate=False, Resiliparse skips the density filter), since
# whitespace tokenization yields no stopword statistics.  Block length
# becomes the only structural filter.
NON_SPACED_LANGUAGES = frozenset({"th", "zh", "ja", "ko"})

# Compact OWN-AUTHORED per-language stopword sets for the spaced
# languages the density gate supports (the reference delegates to
# justext's bundled per-language lists; these are the high-frequency
# function words of each language, sufficient for a 0.32 density gate —
# NOT copies of the reference's clean/*_stopwords.py files).
DE_STOPWORDS = (
    "der die das ein eine und oder aber wenn dann von in auf an zu für mit"
    " bei aus als ist sind war waren sein es er sie wir ihr ich nicht kein"
    " auch nur noch so wie dass im am um den dem des"
).split()
FR_STOPWORDS = (
    "le la les un une des et ou mais si alors de du dans sur à pour avec"
    " par comme est sont était être il elle ils nous vous je ne pas aussi"
    " que qui ce cette ces au aux en plus"
).split()
ES_STOPWORDS = (
    "el la los las un una unos y o pero si entonces de del en sobre a para"
    " con por como es son era ser él ella ellos nosotros yo no también que"
    " quien este esta estos al lo más"
).split()

STOPWORDS_BY_LANG = {
    "en": EN_STOPWORDS,
    "de": DE_STOPWORDS,
    "fr": FR_STOPWORDS,
    "es": ES_STOPWORDS,
}


def stopwords_for(lang: str) -> list[str]:
    """Stopword list for a spaced language (default en — the reference
    likewise falls back to English when the detector is unsure)."""
    return STOPWORDS_BY_LANG.get(lang, EN_STOPWORDS)


def strip_noise(html: Column) -> Column:
    """Remove script/style subtrees (two passes — no backreferences, so the
    same regexes run under RE2)."""
    t = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    return F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")


# Inline (phrasing-level) elements do NOT break text flow — jusText and
# every DOM-based extractor segments on BLOCK-level tags only, so
# "the <b>quick</b> fox" is ONE block, not three fragments the length
# floor would kill (round-9 divergence record: fragmented prose was the
# documented structural-divergence case).  RE2 ∩ Java dialect: no
# backreferences, non-capturing group only.
INLINE_TAGS = ("a|abbr|b|bdi|bdo|cite|code|data|dfn|em|i|kbd|mark|q|s"
               "|samp|small|span|strong|sub|sup|time|u|var|wbr")
# (?:[\s/][^>]*)? also matches space-less self-closed forms (<wbr/>,
# <b/>) — with only (?:\s[^>]*)? they fell through to the block split
# and re-fragmented prose (r10 review); still anchored so longer tag
# names (<i...> vs <img>, <s...> vs <script>) can't false-match.
_INLINE_TAG_RE = rf"(?i)</?(?:{INLINE_TAGS})(?:[\s/][^>]*)?>"


def _blocks(html: Column) -> Column:
    """Tag boundaries become block separators (inline tags removed
    in-place first — they don't split); empty blocks dropped."""
    text = F.regexp_replace(strip_noise(html), _INLINE_TAG_RE, "")
    text = F.regexp_replace(text, r"<[^>]*>", "\n")
    # NB: F.transform(arr, F.trim) would pass the element INDEX as trim's
    # second (trimStr) argument — always use an explicit single-arg lambda.
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda b: F.trim(b)),
        lambda b: b != F.lit(""),
    )


def _density(block: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    toks = F.split(block, r"\s+")
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return hits / F.size(toks)


def extract_main_content(html: Column,
                         density_threshold: float = DENSITY_THRESHOLD,
                         min_tokens: int = MIN_BLOCK_TOKENS,
                         lang: str = "en",
                         min_chars_non_spaced: int = 10) -> Column:
    """Keep blocks whose stopword density clears the JusText-style gate and
    that have at least ``min_tokens`` tokens; join with newlines.

    ``lang``: spaced languages gate on that language's stopword density
    (stopwords_for); non-spaced languages (th/zh/ja/ko) follow the
    reference's behavior of SKIPPING the density gate entirely
    (html_extrator.py:45,188-200 — is_boilerplate disabled / density
    filter ignored) and keep blocks by character length alone, since
    whitespace tokens carry no stopword signal there."""
    if lang in NON_SPACED_LANGUAGES:
        kept = F.filter(
            _blocks(html),
            lambda b: F.length(b) >= min_chars_non_spaced,
        )
        return F.concat_ws("\n", kept)
    sw = stopwords_for(lang)
    kept = F.filter(
        _blocks(html),
        lambda b: (F.size(F.split(b, r"\s+")) >= min_tokens)
        & (_density(b, sw) >= density_threshold),
    )
    return F.concat_ws("\n", kept)


def boilerplate_ratio(html: Column,
                      density_threshold: float = DENSITY_THRESHOLD,
                      min_tokens: int = MIN_BLOCK_TOKENS) -> Column:
    """Diagnostic: fraction of blocks dropped by the density gate."""
    blocks = _blocks(html)
    kept = F.filter(
        blocks,
        lambda b: (F.size(F.split(b, r"\s+")) >= min_tokens)
        & (_density(b) >= density_threshold),
    )
    return F.when(F.size(blocks) == 0, 0.0).otherwise(
        1.0 - F.size(kept) / F.size(blocks)
    )
