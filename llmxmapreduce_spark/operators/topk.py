"""Sort / limit / top-k operators (SURVEY.md §2.6 T1-T4, T6, T7).

All are expressed as window functions — a single shuffle on the grouping
key, no driver-side collect, so they scale to any group count.  Ties are
broken with a *seeded* ``rand`` (T1) or a deterministic key column, never
object identity, so results hash-match across runs and engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prune_top_k(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    k: int,
    seed: int = 42,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """T1 ``_prune_top_k`` (reference: convolution_module.py:207-229).

    Keep the top-``k`` rows per group by ``score_col`` descending; rows tied
    at the cut score are chosen randomly — here by a seeded ``rand`` (or a
    caller-supplied deterministic tie-break column) instead of Python's
    unseeded ``random.sample``, so the result is reproducible.
    """
    tiebreak = F.col(tiebreak_col).asc() if tiebreak_col else F.rand(seed).asc()
    w = Window.partitionBy(*group_cols).orderBy(F.col(score_col).desc(), tiebreak)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def best_of(df: DataFrame, group_cols: list[str], score_col: str,
            tiebreak_col: str) -> DataFrame:
    """T2 best-of selection (reference: refine_module.py:48-51): the single
    highest-scored row per group."""
    return prune_top_k(df, group_cols, score_col, 1, tiebreak_col=tiebreak_col)


def top_n(df: DataFrame, order_cols: list[Column], n: int) -> DataFrame:
    """T3 global top-n (reference: LLM_search.py:441-443): total order +
    limit.  Catalyst plans this as TakeOrderedAndProject — no full sort."""
    return df.orderBy(*order_cols).limit(n)


def over_fetch(n: int, factor: float = 1.2) -> int:
    """T7 over-fetch sizing (reference: start_pipeline.py:88)."""
    return math.ceil(n * factor)


def limit_first_n(df: DataFrame, order_col: str, n: int) -> DataFrame:
    """T6 ``data_num`` limit (reference: encode_pipeline.py:41-45) — the
    reference takes the first N input lines; with parallel sources "first"
    must be made explicit, so order by a stable key then limit."""
    return df.orderBy(order_col).limit(n)
