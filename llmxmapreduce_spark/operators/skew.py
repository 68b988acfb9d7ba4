"""Skew-handling helpers for hot keys at scale.

AQE's skew-join split (enabled in session.py) covers sort-merge joins at
runtime; these helpers cover the two cases AQE doesn't:

- ``salted_aggregate`` — a hot groupBy key that overwhelms one reducer:
  pre-aggregate on (key, salt) then finalize on key.  Works for any
  algebraic aggregate (sum/count/min/max) — two small shuffles instead of
  one skewed one.
- ``salted_join`` — joining a skewed fact against a small-but-not-broadcast
  dimension: explode the dimension ``n_salt`` ways and salt the fact side,
  turning one hot partition into ``n_salt`` even ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key_cols: list[str], n_salt: int,
              salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt derived from the full row hash — even spread, no
    RNG (reproducible plans)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    )


def salted_aggregate(df: DataFrame, key_cols: list[str],
                     aggs: dict[str, tuple[Column, Column]],
                     n_salt: int = 16) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → (partial_expr,
    final_expr_over_partial).  Example::

        salted_aggregate(ev, ["event_type"], {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total": (F.sum("value"), F.sum("total")),
        })
    """
    salted = with_salt(df, key_cols, n_salt)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def salted_join(fact: DataFrame, dim: DataFrame, key_cols: list[str],
                n_salt: int = 8, how: str = "inner") -> DataFrame:
    """Replicate ``dim`` n_salt× (explode) and salt ``fact`` rows so a hot
    join key spreads over n_salt partitions.  Use when ``dim`` exceeds the
    broadcast threshold but is still ≪ fact."""
    fact_s = with_salt(fact, key_cols, n_salt)
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast(fact_s.schema["__salt"].dataType))
    out = fact_s.join(dim_s, [*key_cols, "__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame,
    key_cols: list[str] | str,
    top: int = 20,
) -> DataFrame:
    """Diagnose BEFORE salting: → one row per top-``top`` hottest key
    with (key…, n_rows, share, x_over_even) where ``share`` is the
    key's fraction of all rows and ``x_over_even`` its multiple of the
    mean rows-per-key — the number that says whether a shuffle on this
    key needs `salted_aggregate`/`salted_join`/AQE at all (x ≈ 1:
    don't; x ≫ shuffle-partition count: one task owns the key).

    One partial-agg count per key + a bounded TakeOrdered; the totals
    ride a scalar aggregate, no extra scan of the raw data."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    counts = counts.localCheckpoint(eager=True)
    tot = counts.agg(F.sum("n_rows").alias("n"),
                     F.count(F.lit(1)).alias("k")).collect()[0]
    n_total, n_keys = int(tot["n"] or 0), int(tot["k"] or 1)
    mean = n_total / max(n_keys, 1)
    return (counts.orderBy(F.col("n_rows").desc(),
                           *[F.col(k).asc() for k in keys])
            .limit(top)
            .withColumn("share", F.col("n_rows")
                        / F.lit(float(max(n_total, 1))))
            .withColumn("x_over_even", F.col("n_rows")
                        / F.lit(float(max(mean, 1e-12)))))
