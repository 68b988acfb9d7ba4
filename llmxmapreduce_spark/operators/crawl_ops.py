"""Crawl-result filtering / ranking / grouping (SURVEY.md §2 P6, T4, A5).

Reference: LLMxMapReduce_V2/src/async_crawl.py:392-436 (``_filter_papers``)
and :370-388 (topic grouping).  The reference sorts per topic in Python;
here it's one window over ``topic`` — a single shuffle, no driver collect,
so a 100 TB crawl table with millions of topics works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Reference constants (async_crawl.py:26-28).
SIMILARITY_THRESHOLD = 80
MIN_LENGTH = 350
MAX_LENGTH = 20_000


def filter_papers(
    df: DataFrame,
    topic_col: str = "topic",
    txt_col: str = "txt",
    similarity_col: str = "similarity",
    order_col: str = "url",
    similarity_threshold: int = SIMILARITY_THRESHOLD,
    min_length: int = MIN_LENGTH,
    max_length: int = MAX_LENGTH,
    top_n: int = 20,
) -> DataFrame:
    """P6 + T4: per-topic length filter, similarity threshold, rank-ordered
    backfill up to ``top_n`` (reference: async_crawl.py:392-436).

    Semantics ported exactly:

    1. keep ``min_length <= len(txt) <= max_length``;
    2. rows with ``similarity >= threshold`` are always kept (the reference
       does NOT truncate them at top_n);
    3. if fewer than ``top_n`` pass the threshold, backfill from the
       remaining length-valid rows in ``(-similarity, -len(txt))`` order.

    The reference's Python sort is stable on input order for ties; a
    distributed engine has no input order, so ``order_col`` (url) is the
    explicit final tie-break.
    """
    length = F.length(F.col(txt_col))
    valid = df.filter(length.between(min_length, max_length))
    passed = valid.filter(F.col(similarity_col) >= similarity_threshold)
    failed = valid.filter(F.col(similarity_col) < similarity_threshold)

    need = passed.groupBy(topic_col).agg(F.count(F.lit(1)).alias("__n_passed"))
    w = Window.partitionBy(topic_col).orderBy(
        F.col(similarity_col).desc(), F.length(F.col(txt_col)).desc(),
        F.col(order_col).asc(),
    )
    backfill = (
        failed.withColumn("__rn", F.row_number().over(w))
        # left join: topics where nothing passed the threshold have no
        # `need` row -> coalesce to 0 passed, so backfill fills all top_n.
        .join(need, on=topic_col, how="left")
        .filter(F.col("__rn") <= F.lit(top_n) - F.coalesce(F.col("__n_passed"), F.lit(0)))
        .drop("__rn", "__n_passed")
    )
    return passed.unionByName(backfill)


def group_topics(df: DataFrame, topic_col: str = "topic",
                 paper_cols: list[str] | None = None) -> DataFrame:
    """A5 crawl topic grouping (reference: async_crawl.py:370-388): one row
    per topic with its papers gathered as an array of structs."""
    paper_cols = paper_cols or ["title", "url", "txt", "similarity"]
    return df.groupBy(topic_col).agg(
        F.collect_list(F.struct(*[F.col(c) for c in paper_cols])).alias("papers")
    )
