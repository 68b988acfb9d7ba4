"""Sufficient statistics: one-pass exact moments per group.

The distributed-statistics workhorse: corr/covariance/variance/OLS all
reduce to the five sums (n, Σx, Σy, Σxy, Σx², Σy²), which
partial-aggregate perfectly — one projected scan, map-side combine,
tiny shuffle rows.  Computing the DERIVED quantities from exact sums
(instead of streaming-update formulas) also makes them deterministic
under any partitioning.

Portability split, as everywhere in this repo: the SUMS are computed
AND EMITTED as DECIMAL (exact — measured live: casting the 29-digit
exact decimal sum to double disagrees between Spark and DuckDB by one
ulp at the 16th significant digit, so even floor-u6 normalization
can't make a double surface portable for sums this large); the derived
``corr``/``slope`` columns divide/sqrt doubles and are pytest-gated
against numpy instead.

Nulls: a row contributes only where BOTH columns are non-null (SQL
corr semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_stats(
    df: DataFrame,
    x: str,
    y: str,
    by: list[str] | str | None = None,
) -> DataFrame:
    """→ group cols + (n, sum_x, sum_y, sum_xy, sum_x2, sum_y2) with
    the sums as DECIMAL(38,12)-exact doubles.  One partial-agg pass."""
    keys = ([by] if isinstance(by, str) else list(by)) if by else []
    both = F.col(x).isNotNull() & F.col(y).isNotNull()
    # decimal(19,6) inputs: the PRODUCT lands at decimal(38,12) with 26
    # integer digits of headroom — a (38,12) input would give the
    # product scale 24 and overflow the sum at corpus row counts
    # try_cast: values past decimal(19,6) range (|x| >= 1e13) become null
    # in EVERY ANSI mode (a plain cast nulls silently non-ANSI but throws
    # under Spark 4's ANSI default) — then re-filter so n counts exactly
    # the rows the sums cover (review finding: n/sums disagreed for
    # overflow rows)
    d = df.filter(both).select(
        *keys,
        F.col(x).try_cast("decimal(19,6)").alias("__x"),
        F.col(y).try_cast("decimal(19,6)").alias("__y"),
    )
    d = d.filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").cast("decimal(38,6)").alias("sum_x"),
        F.sum("__y").cast("decimal(38,6)").alias("sum_y"),
        F.sum(F.col("__x") * F.col("__y")).cast("decimal(38,12)")
        .alias("sum_xy"),
        F.sum(F.col("__x") * F.col("__x")).cast("decimal(38,12)")
        .alias("sum_x2"),
        F.sum(F.col("__y") * F.col("__y")).cast("decimal(38,12)")
        .alias("sum_y2"),
    ]
    return d.groupBy(*keys).agg(*aggs) if keys else d.agg(*aggs)


def with_corr_slope(stats: DataFrame) -> DataFrame:
    """Derive Pearson ``corr`` and OLS ``slope`` (y on x) from a
    ``moment_stats`` frame.  Double arithmetic — NOT on the
    cross-engine values surface; numpy-gated in tests.  Degenerate
    groups (zero variance) yield nulls."""
    n = F.col("n").cast("double")
    sx, sy = F.col("sum_x").cast("double"), F.col("sum_y").cast("double")
    cov = F.col("sum_xy").cast("double") - sx * sy / n
    vx = F.col("sum_x2").cast("double") - sx * sx / n
    vy = F.col("sum_y2").cast("double") - sy * sy / n
    return (stats
            .withColumn("slope", F.when(vx > 0, cov / vx))
            .withColumn("corr", F.when((vx > 0) & (vy > 0),
                                       cov / F.sqrt(vx * vy))))
