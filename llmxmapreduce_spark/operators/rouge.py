"""Dependency-free ROUGE-Lsum for the longbook_sum_eng task.

The reference scores summarization with HuggingFace ``evaluate``'s rouge
(``ROUGE_SCORER`` at eval/infinitebench/compute_scores.py:13, used at
:317-324 via ``score["rougeLsum"]``).  That package isn't in this
environment, so this is a faithful port of google-research ``rouge_score``'s
summary-level ROUGE-L:

- tokenize: lowercase, split on non-alphanumeric runs
  (rouge_scorer tokenize semantics);
- sentences: newline-separated (rougeLsum's documented contract —
  "rougeLsum expects newline-separated sentences");
- for each reference sentence, the union of its LCS token positions against
  every candidate sentence; hits = Σ union sizes;
  precision = hits / |candidate tokens|, recall = hits / |reference tokens|,
  score = F1.

Pure Python per row (an Arrow-batched pandas UDF); the DP is
O(len(ref_sent) × len(cand_sent)) per sentence pair — summaries are short,
and rows are independent, so the stage scales horizontally like every other
scorer.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def rouge_tokenize(text: str) -> list[str]:
    return [t for t in _NON_ALNUM.sub(" ", (text or "").lower()).split() if t]


def _lcs_ref_indices(ref: list[str], can: list[str]) -> set[int]:
    """Indices of ``ref`` tokens participating in an LCS with ``can``
    (rouge_score ``lcs_ind``: standard DP + backtrack)."""
    m, n = len(ref), len(can)
    if m == 0 or n == 0:
        return set()
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        ri = ref[i - 1]
        row, prev = dp[i], dp[i - 1]
        for j in range(1, n + 1):
            if ri == can[j - 1]:
                row[j] = prev[j - 1] + 1
            else:
                row[j] = row[j - 1] if row[j - 1] >= prev[j] else prev[j]
    out: set[int] = set()
    i, j = m, n
    while i > 0 and j > 0:
        if ref[i - 1] == can[j - 1] and dp[i][j] == dp[i - 1][j - 1] + 1:
            out.add(i - 1)
            i, j = i - 1, j - 1
        elif dp[i - 1][j] >= dp[i][j - 1]:
            i -= 1
        else:
            j -= 1
    return out


def rouge_lsum_py(pred: str, label: str) -> float:
    """Summary-level ROUGE-L F1 (rouge_score ``_summary_level_lcs``)."""
    ref_sents = [rouge_tokenize(s) for s in (label or "").split("\n")]
    ref_sents = [s for s in ref_sents if s]
    can_sents = [rouge_tokenize(s) for s in (pred or "").split("\n")]
    can_sents = [s for s in can_sents if s]
    m = sum(len(s) for s in ref_sents)
    n = sum(len(s) for s in can_sents)
    if m == 0 or n == 0:
        return 0.0
    # token-count clipping prevents double counting across sentences
    # (rouge_scorer._summary_level_lcs)
    from collections import Counter

    cnt_r = Counter(t for s in ref_sents for t in s)
    cnt_c = Counter(t for s in can_sents for t in s)
    hits = 0
    for ref in ref_sents:
        union: set[int] = set()
        for can in can_sents:
            union |= _lcs_ref_indices(ref, can)
        for i in sorted(union):
            t = ref[i]
            if cnt_c[t] > 0 and cnt_r[t] > 0:
                hits += 1
                cnt_c[t] -= 1
                cnt_r[t] -= 1
    precision = hits / n
    recall = hits / m
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def rouge_lsum(pred: Column, label: Column) -> Column:
    @F.pandas_udf(T.DoubleType())
    def udf(p: pd.Series, lab: pd.Series) -> pd.Series:
        return pd.Series([rouge_lsum_py(a, b) for a, b in zip(p, lab)])

    return udf(pred, label)
