"""Frequency sketching: heavy hitters with bounded state.

``top_frequent`` (the exact path) is a plain groupBy-count — fine when
the number of DISTINCT keys fits a shuffle.  At 100 TB the interesting
keys are things like hostnames, n-grams, or user ids with *billions*
of distinct values, where the full count table itself is the problem.
``heavy_hitters`` bounds the state with a Misra-Gries summary
(Misra & Gries 1982; mergeable form per Agarwal et al., PODS 2012):

  pass 1  mapInPandas keeps at most ``capacity`` counters per
          partition (merge each Arrow batch's Counter, then compress:
          subtract the (capacity+1)-th largest count from all, drop
          the non-positive — the batched equivalent of the classic
          decrement step).  Summary rows shuffle as (key, est) pairs,
          ≤ capacity × n_partitions of them plus one null-key sentinel
          per partition carrying that partition's row count — NEVER
          one row per distinct key.
  merge   one groupBy-sum over summaries, then ONE more compress using
          the (capacity+1)-th largest merged estimate as the cut
          (a bounded takeOrdered, not a collect of the summary).  The
          mergeable-summaries argument (every decrement of size d
          removes ≥ d·(capacity+1) total weight, and total weight is
          N) bounds the cumulative undercount by N/(capacity+1) —
          across partition sketches AND the final compress — so every
          key with true frequency > N/(capacity+1) still has a
          positive estimate and SURVIVES, under any partitioning.
          A naive "keep the capacity largest estimates" cut does NOT
          have this guarantee (a barely-qualifying hitter can carry a
          tiny estimate and be outranked); the compress cut does.
  pass 2  exact recount of the ≤ capacity surviving candidates
          (broadcast semi-join) and the threshold filter
          ``freq > N/(capacity+1)``.

The recount makes the THRESHOLDED output exact and therefore
partition-independent and engine-portable: it equals DuckDB's
``GROUP BY key HAVING count(*) > N/(capacity+1)`` — the values oracle
(board query `heavy_hitters`), even though the intermediate sketch is
approximate.  Two projected scans of one column, bounded memory
everywhere; that is the trade a 100 TB frequency query wants.

Null keys don't count: rows whose key is null are excluded from both N
and the candidates (the null lane is the sentinel channel).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_frequent(df: DataFrame, col: str | Column, k: int,
                 key_name: str = "key") -> DataFrame:
    """Exact top-``k`` values by frequency, deterministic ties
    (count desc, key asc).  → (key, freq).  The full distinct-key count
    table shuffles — use ``heavy_hitters`` when that table is huge."""
    c = F.col(col) if isinstance(col, str) else col
    counts = (df.select(c.alias(key_name))
              .groupBy(key_name).agg(F.count(F.lit(1)).alias("freq")))
    return counts.orderBy(F.col("freq").desc(),
                          F.col(key_name).asc()).limit(k)


def _mg_compress(acc: Counter, capacity: int) -> None:
    if len(acc) <= capacity:
        return
    cut = sorted(acc.values(), reverse=True)[capacity]
    for k in [k for k, v in acc.items() if v <= cut]:
        del acc[k]
    for k in acc:
        acc[k] -= cut


def mg_summaries(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ ``capacity`` non-null
    (key, est) rows per input partition (est ≤ true partition count,
    total undercount ≤ n_p/(capacity+1)) plus ONE null-key sentinel row
    whose ``n_seen`` is the partition's non-null row count."""
    if capacity < 1:
        raise ValueError("mg_summaries: capacity must be >= 1")
    src = df.select(F.col(col).cast("string").alias("key"))

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: Counter = Counter()
        n_seen = 0
        for b in batches:
            vals = b["key"].dropna()
            n_seen += len(vals)
            acc.update(Counter(vals))
            _mg_compress(acc, capacity)
        keys = list(acc.keys()) + [None]
        ests = [int(acc[k]) for k in acc] + [0]
        ns = [0] * len(acc) + [n_seen]
        yield pd.DataFrame({
            "key": pd.Series(keys, dtype="object"),
            "est": pd.Series(ests, dtype="int64"),
            "n_seen": pd.Series(ns, dtype="int64"),
        })

    return src.mapInPandas(sketch, "key string, est long, n_seen long")


def heavy_hitters(df: DataFrame, col: str, capacity: int = 1024,
                  key_name: str = "key") -> DataFrame:
    """All values of ``col`` with frequency > N/(capacity+1), with
    EXACT frequencies → (key_name, freq).  Sketch-guided two-pass plan
    (module docstring); the output is deterministic under any
    partitioning and equals the plain exact HAVING query."""
    summaries = mg_summaries(df, col, capacity).localCheckpoint(eager=True)
    n_total = summaries.agg(F.sum("n_seen")).collect()[0][0] or 0
    if n_total == 0:
        return (df.sparkSession.createDataFrame([], f"{key_name} string,"
                                                    " freq long"))
    merged = (summaries.filter(F.col("key").isNotNull())
              .groupBy("key").agg(F.sum("est").alias("est"))
              .localCheckpoint(eager=True))
    # final compress cut: (capacity+1)-th largest merged estimate —
    # a bounded takeOrdered of capacity+1 rows, never a summary collect
    top = merged.orderBy(F.col("est").desc()).limit(capacity + 1).collect()
    cut = int(top[capacity]["est"]) if len(top) > capacity else 0
    cands = merged.filter(F.col("est") > F.lit(cut))
    threshold = n_total / (capacity + 1)
    exact = (
        df.select(F.col(col).cast("string").alias("key"))
        .join(F.broadcast(cands.select("key")), "key", "left_semi")
        .groupBy("key").agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > F.lit(threshold))
    )
    return exact.select(F.col("key").alias(key_name), "freq")
