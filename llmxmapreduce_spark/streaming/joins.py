"""Watermarked stream-stream joins — the attribution/enrichment shape
(impressions ⋈ clicks within a time bound) that completes the streaming
operator family (windows/sessionization/stateful/dedup in ``events.py``,
ingestion admission in ``ingest.py``).

Why this needs its own operator: joining two UNBOUNDED streams is only
sustainable when the engine can drop join state, and Structured
Streaming drops state only when BOTH sides carry watermarks AND the join
condition bounds how far apart matching events can be in event time.
This module packages that contract — the watermarks, the time-range
predicate, and the outer-join constraints Spark enforces — so callers
can't accidentally build an unbounded-state join:

- inner joins: state per side is bounded by
  ``rate × (watermark + time_bound)``;
- left_outer/right_outer: same bound; the OUTER side's null-padded
  results only emit once the watermark passes the bound (Spark
  semantics — late results, correct results);
- full_outer follows the same rule on both sides.

100 TB framing: the join key is hash-shuffled once per micro-batch;
state lives in the state store keyed by (key, event-time bucket), sized
by the stream RATE over the bound — never by corpus size.  The same
function works in batch (a plain range join) because the predicate is
pure Catalyst — the stream≡batch equivalence is test-pinned
(tests/test_streaming_joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]

_OUTER_MODES = {"inner", "left_outer", "right_outer", "full_outer"}


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str | None = None,
    how: str = "inner",
    allow_unbounded: bool = False,
) -> DataFrame:
    """Join ``left`` and ``right`` on ``key`` where the right event lands
    in ``[left_ts, left_ts + max_delay]`` — the click-attribution shape
    (left = impressions, right = clicks).

    Streaming inputs get ``withWatermark`` applied on BOTH sides
    (``watermark`` defaults to ``max_delay``), which together with the
    time-range predicate lets Spark expire join state — the only
    sustainable configuration on unbounded streams.  Batch inputs skip
    the watermark and run the identical predicate, so stream ≡ batch by
    construction.

    Column hygiene: the right side's timestamp is returned as
    ``<right_ts>_r`` (and a clashing non-key column would be ambiguous —
    callers select/alias beforehand, the repo-wide convention).

    ``allow_unbounded=True`` skips the streaming-watermark requirement
    (for callers composing their own state management); by default a
    streaming input without a possible watermark column raises rather
    than silently accreting state forever.
    """
    if how not in _OUTER_MODES:
        raise ValueError(f"how must be one of {sorted(_OUTER_MODES)}, "
                         f"got {how!r}")
    keys = [key] if isinstance(key, str) else list(key)
    wm = watermark or max_delay

    lt, rt = left, right
    if lt.isStreaming and not allow_unbounded:
        lt = lt.withWatermark(left_ts, wm)
    if rt.isStreaming and not allow_unbounded:
        rt = rt.withWatermark(right_ts, wm)

    l = lt.alias("l")
    r = rt.alias("r")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    cond = cond & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")) & (
        F.col(f"r.{right_ts}")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}"))
    joined = l.join(r, cond, how)
    # project: keys once (coalesced for outer modes), left cols, right
    # non-key cols with the timestamp renamed
    out_cols = [F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k)
                if how in ("right_outer", "full_outer")
                else F.col(f"l.{k}").alias(k)
                for k in keys]
    for c in left.columns:
        if c not in keys:
            out_cols.append(F.col(f"l.{c}").alias(c))
    for c in right.columns:
        if c in keys:
            continue
        alias = f"{c}_r" if c in left.columns else c
        out_cols.append(F.col(f"r.{c}").alias(alias))
    return joined.select(*out_cols)
