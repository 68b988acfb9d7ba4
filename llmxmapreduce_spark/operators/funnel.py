"""Funnel (ordered event-sequence) analytics.

The classic product/telemetry question over an events table: of the
users who did step 1, how many went on to do step 2 at-or-after it,
then step 3, ... — with an optional completion window.  Semantics are
the GREEDY-EARLIEST chain (what a chained-CTE SQL formulation
computes, and the values oracle runs):

    t_1 = min ts of a step-1 event
    t_k = min ts ≥ t_{k-1} of a step-k event   (> with strict=True)
    all t_k ≤ t_1 + within                      (when within is given)

Spark-first, ONE shuffle: filter to funnel-step events (tiny integer
step index replaces the type string), groupBy user collecting the
sorted (ts, step) sequence, then fold it with Catalyst's
``aggregate`` higher-order function — the accumulator is the array of
completed-step timestamps, an event appends its ts iff its step index
equals the number already completed (and the within/strict gates
pass).  No UDF, no per-step join; k never changes the shuffle count.
Tie handling: the sequence sorts by (ts, step), so a step-k event at
exactly t_{k-1} is seen after the step-(k-1) event and matches, same
as SQL's ``ts >= t_{k-1}``.

Equivalence of the greedy fold with the chained-min SQL: induction on
k — t_1 is the global min; given the fold holds t_{k-1} minimal, the
first step-k element at-or-after it in (ts, step) order is exactly
``min ts ≥ t_{k-1}``.

Scale: shuffle carries (user, ts, small-int) triples for funnel-step
events only; per-user state is that user's step events (the inherent
minimum for sequence semantics — a pathological single user serializes
into one task; split its time range upstream if one key dominates).
Users with no step-1 event are dropped (``steps_completed >= 1``),
matching the SQL chain's anchor.

Step types must be DISTINCT (a repeated type makes the step index no
longer a function of the type and breaks the tie ordering the
greedy-equivalence proof needs — rename such events upstream; the
constructor raises).  ``strict=True`` switches the chain to strictly
increasing timestamps (``>``); the SQL twin flips identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Column | None = None,
    strict: bool = False,
) -> DataFrame:
    """→ one row per user who completed step 1: (user_col,
    steps_completed, t_1 .. t_len(steps) as ``t1``..``tN``, nulls past
    the last completed step)."""
    if len(steps) < 1:
        raise ValueError("funnel: need at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel: step types must be distinct "
                         "(rename repeated event types upstream)")
    k = len(steps)
    step_map = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))])
    evs = (
        events.select(
            F.col(user_col),
            F.col(ts_col).alias("__ts"),
            step_map[F.col(type_col)].alias("__step"),
        )
        .filter(F.col("__step").isNotNull())
    )
    seq = (evs.groupBy(user_col)
           .agg(F.sort_array(F.collect_list(
               F.struct(F.col("__ts").alias("t"),
                        F.col("__step").alias("s")))).alias("__seq")))

    ts_type = events.schema[ts_col].dataType.simpleString()
    init = F.expr(f"CAST(array() AS array<{ts_type}>)")

    def fold(acc: Column, x: Column) -> Column:
        matches = F.size(acc) < F.lit(k)
        matches &= x["s"] == F.size(acc)
        if strict:
            matches &= (F.size(acc) == 0) | \
                (x["t"] > F.try_element_at(acc, F.lit(-1)))
        if within is not None:
            matches &= (F.size(acc) == 0) | \
                (x["t"] <= F.try_element_at(acc, F.lit(1)) + within)
        return F.when(matches, F.concat(acc, F.array(x["t"]))) \
            .otherwise(acc)

    out = seq.select(
        F.col(user_col),
        F.aggregate(F.col("__seq"), init, fold).alias("__done"),
    )
    return (out.filter(F.size("__done") >= 1)
            .select(
                F.col(user_col),
                F.size("__done").alias("steps_completed"),
                *[F.try_element_at("__done", F.lit(i + 1)).alias(f"t{i + 1}")
                  for i in range(k)],
            ))


def funnel_counts(funnel_df: DataFrame, n_steps: int) -> DataFrame:
    """Conversion rollup of a ``funnel`` result: for each step k, how
    many users reached at least step k.  One partial-agg scan of the
    (already tiny) per-user table."""
    aggs = [F.sum((F.col("steps_completed") >= k + 1).cast("long"))
            .alias(f"reached_{k + 1}") for k in range(n_steps)]
    return funnel_df.agg(*aggs)
