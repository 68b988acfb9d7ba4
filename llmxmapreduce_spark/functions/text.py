"""Text scalar operators (SURVEY.md §2.2 P1-P16) as native Spark columns.

Each function documents the reference behavior it re-expresses
(file:line relative to /root/reference).  All of these stay inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

from pyspark.sql import Column
from pyspark.sql import functions as F

NO_INFORMATION = "[NO INFORMATION]"

# ---------------------------------------------------------------------------
# P1 — remove_chunk (reference: LLMxMapReduce_V1/pipeline.py:10-27)
# ---------------------------------------------------------------------------

def contains_marker(text: Column, marker: str = NO_INFORMATION) -> Column:
    """Case-insensitive containment of the no-information sentinel."""
    return F.upper(text).contains(marker.upper())


def keep_informative(text: Column, question_has_marker: bool = False,
                     marker: str = NO_INFORMATION) -> Column:
    """Predicate keeping rows that carry information.

    The reference skips the filter entirely when the *question* itself
    contains the marker (pipeline.py:19-20) — that escape hatch is the
    constant ``question_has_marker`` decided once per query.
    """
    if question_has_marker:
        return F.lit(True)
    return ~contains_marker(text, marker)


# ---------------------------------------------------------------------------
# P3 — citation stripping (reference: src/data_structure/digest.py:183-196)
# ---------------------------------------------------------------------------

def strip_citations(txt: Column) -> Column:
    """Delete ``[...]`` citation spans and the ``# References`` tail."""
    no_refs = F.regexp_replace(txt, r"(?s)#\s*References.*$", "")
    return F.regexp_replace(no_refs, r"\[[^\]]*\]", "")


# ---------------------------------------------------------------------------
# P4/P5 — length truncation + abstract fallback (digest.py:34-59)
# ---------------------------------------------------------------------------

MAX_TOKEN = 800_000
CHARS_PER_TOKEN = 3.6875  # digest.py:37 char-per-token estimate


def truncate_tokens(txt: Column, txt_token: Column,
                    max_token: int = MAX_TOKEN) -> Column:
    """Cap text at ``max_token`` tokens ~ ``max_token * 3.6875`` chars."""
    max_chars = int(max_token * CHARS_PER_TOKEN)
    return F.when(txt_token > max_token, F.substring(txt, 1, max_chars)).otherwise(txt)


def abstract_fallback(abstract: Column, txt: Column, n: int = 500) -> Column:
    """``abstract = txt[:500]`` when the abstract is missing/empty."""
    return F.coalesce(F.nullif(F.trim(abstract), F.lit("")), F.substring(txt, 1, n))


# ---------------------------------------------------------------------------
# P7 — bibkey normalization (src/utils/process_str.py:131-137)
# ---------------------------------------------------------------------------

def normalize_bibkey(title: Column) -> Column:
    """title -> snake_case bibkey: lowercase, non-alnum runs -> '_', trimmed."""
    t = F.lower(F.trim(title))
    t = F.regexp_replace(t, r"[^a-z0-9]+", "_")
    return F.regexp_replace(t, r"^_+|_+$", "")


# ---------------------------------------------------------------------------
# P9 — fenced markdown block extraction (process_str.py:8-20)
# ---------------------------------------------------------------------------

def extract_md_block(text: Column, label: str = "markdown") -> Column:
    """Extract the payload of a ```label ... ``` fenced block ('' if absent).

    The reference raises MdNotFoundError; here absence yields an empty
    string so callers can build an ``ok`` column with ``!= ''``.
    """
    return F.regexp_extract(text, rf"(?s)```{label}\s*\n(.*?)```", 1)


def md_block_ok(text: Column, label: str = "markdown") -> Column:
    return extract_md_block(text, label) != F.lit("")


# ---------------------------------------------------------------------------
# P10 — heading parse (process_str.py:22-29)
# ---------------------------------------------------------------------------

def heading_depth(line: Column) -> Column:
    """'## 1.2 Title' -> 2 (count of #); 0 when not a heading."""
    return F.length(F.regexp_extract(line, r"^(#+)\s", 1))


def heading_title(line: Column) -> Column:
    """Heading text with the hashes and any leading section number removed."""
    t = F.regexp_extract(line, r"^#+\s+(.*)$", 1)
    return F.trim(F.regexp_replace(t, r"^[0-9]+(\.[0-9]+)*\.?\s*", ""))


# ---------------------------------------------------------------------------
# P11 — str2list / list2str (process_str.py:31-42)
# ---------------------------------------------------------------------------

def str2list(s: Column) -> Column:
    """'[a, b, c]' -> array('a','b','c'): strip brackets/quotes, split on ','."""
    inner = F.regexp_replace(F.trim(s), r"^\[|\]$", "")
    parts = F.split(inner, ",")
    cleaned = F.transform(parts, lambda x: F.trim(F.regexp_replace(x, "[\"']", "")))
    return F.filter(cleaned, lambda x: x != F.lit(""))


def list2str(arr: Column) -> Column:
    return F.concat(F.lit("["), F.concat_ws(", ", arr), F.lit("]"))


# ---------------------------------------------------------------------------
# P13 — answer post-processing (eval/infinitebench/process_answer.py:35-57)
# ---------------------------------------------------------------------------

def extract_answer(reply: Column) -> Column:
    """Take the text after the last 'Answer:' and strip a trailing
    'Confidence Score:' clause."""
    after = F.when(
        reply.contains("Answer:"), F.substring_index(reply, "Answer:", -1)
    ).otherwise(reply)
    return F.trim(F.regexp_replace(after, r"(?is)confidence\s+score.*$", ""))


# ---------------------------------------------------------------------------
# P14 — answer normalization (eval/infinitebench/compute_scores.py:16-49)
# ---------------------------------------------------------------------------

def normalize_answer(s: Column) -> Column:
    """Lowercase, drop punctuation and articles, collapse whitespace."""
    t = F.lower(s)
    t = F.regexp_replace(t, r"[^\w\s]", " ")
    t = F.regexp_replace(t, r"\b(a|an|the)\b", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


# ---------------------------------------------------------------------------
# P15 — sentence split (LLMxMapReduce_V1/Generator.py:134-148)
# ---------------------------------------------------------------------------

SENTENCE_BOUNDARY = r"(?<=[。！？；.?!;])"


def sentence_split(text: Column) -> Column:
    """Split on sentence punctuation, keeping the punctuation (lookbehind)."""
    return F.filter(F.split(text, SENTENCE_BOUNDARY), lambda x: F.trim(x) != F.lit(""))


# ---------------------------------------------------------------------------
# P16 — token counting (Generator.py:301-318; estimate V3
# llm_search_mcp_server.py:198-202)
# ---------------------------------------------------------------------------

def token_count_ws(text: Column) -> Column:
    """Whitespace token count (exact for whitespace-delimited text)."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def token_count_estimate(text: Column, chars_per_token: float = 4.0) -> Column:
    """The reference's cheap ``len/4`` estimate."""
    return F.ceil(F.length(text) / F.lit(chars_per_token)).cast("long")


# A BPE-ish regex tokenizer: words, numbers, or single non-space symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def token_count_bpe_ish(text: Column) -> Column:
    """Count of word/number/symbol tokens via regexp_count — a deterministic
    stand-in for a BPE tokenizer that needs no Python in the hot path."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


# ---------------------------------------------------------------------------
# C5 — chunk labeling (Generator.py:325-334)
# ---------------------------------------------------------------------------

def format_chunk_information(chunk_id: Column, text: Column) -> Column:
    return F.concat(
        F.lit("Information of Chunk "), chunk_id.cast("string"), F.lit(":\n"), text
    )


# ---------------------------------------------------------------------------
# P8 — illegal-citation scrub (process_str.py:44-110): needs difflib, so this
# one is a Python function applied via pandas UDF in operators/citations.py.
# ---------------------------------------------------------------------------

_MATH_TOKEN = "\x00MATH{}\x00"


def scrub_illegal_citations_py(text: str, valid_bibkeys: set[str],
                               ratio: float = 0.8) -> str:
    """Fuzzy-fix ``[bibkey, ...]`` citations: keep exact keys, map fuzzy
    matches (SequenceMatcher ratio > 0.8) to the closest valid key, drop the
    rest.  ``$...$`` math spans are protected with placeholders.

    Pure Python (deterministic); wrapped by a pandas UDF at the operator
    layer.  Reference: process_str.py:44-110.
    """
    if text is None:
        return None
    maths: list[str] = []

    def _stash(m: re.Match) -> str:
        maths.append(m.group(0))
        return _MATH_TOKEN.format(len(maths) - 1)

    protected = re.sub(r"\$[^$]*\$", _stash, text)

    def _fix(m: re.Match) -> str:
        keys = [k.strip() for k in m.group(1).split(",") if k.strip()]
        fixed = []
        for k in keys:
            if k in valid_bibkeys:
                fixed.append(k)
                continue
            best, best_ratio = None, ratio
            for cand in sorted(valid_bibkeys):
                r = SequenceMatcher(None, k, cand).ratio()
                if r > best_ratio:
                    best, best_ratio = cand, r
            if best is not None:
                fixed.append(best)
        return "[" + ", ".join(fixed) + "]" if fixed else ""

    scrubbed = re.sub(r"\[([^\[\]]+)\]", _fix, protected)
    return re.sub(r"\x00MATH(\d+)\x00", lambda m: maths[int(m.group(1))], scrubbed)
