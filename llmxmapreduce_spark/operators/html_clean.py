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


def strip_noise(html: Column) -> Column:
    """Remove script/style subtrees (two passes — no backreferences, so the
    same regexes run under RE2)."""
    t = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    return F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")


def _blocks(html: Column) -> Column:
    """Tag boundaries become block separators; empty blocks dropped."""
    text = F.regexp_replace(strip_noise(html), r"<[^>]*>", "\n")
    # NB: F.transform(arr, F.trim) would pass the element INDEX as trim's
    # second (trimStr) argument — always use an explicit single-arg lambda.
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda b: F.trim(b)),
        lambda b: b != F.lit(""),
    )


def _density(block: Column) -> Column:
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    toks = F.split(block, r"\s+")
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return hits / F.size(toks)


def extract_main_content(html: Column,
                         density_threshold: float = DENSITY_THRESHOLD,
                         min_tokens: int = MIN_BLOCK_TOKENS) -> Column:
    """Keep blocks whose stopword density clears the JusText-style gate and
    that have at least ``min_tokens`` tokens; join with newlines."""
    kept = F.filter(
        _blocks(html),
        lambda b: (F.size(F.split(b, r"\s+")) >= min_tokens)
        & (_density(b) >= density_threshold),
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
