"""Grouped quantiles: exact rank-based (values-portable) + sketch path.

Quality pipelines cut on per-group score quantiles constantly ("drop
the bottom decile per source", "cap at the 99th percentile per lang").
Two paths, one semantics:

- ``group_quantiles`` (exact) — the DISCRETE (type-1) quantile: the
  value at row ``ceil(q*n)`` of the group's sort order.  Picking an
  ACTUAL data value makes the result engine-exact — no interpolation
  arithmetic to diverge between engines (quantile_cont's lerp is
  FP-order-sensitive; quantile_disc's rounding convention differs
  across engines, so the oracle mirrors the rank arithmetic literally
  instead of calling either built-in).  Cost: one group-keyed shuffle
  + per-group sort (rank + count share the same window partitioning —
  a single Exchange).  Groups are assumed numerous-but-bounded
  (sources, languages, shards); this is NOT the global-sort shape.

- ``approx_group_quantiles`` — Spark's native approx_percentile
  (Greenwald-Khanna) as the 100 TB exploratory path: mergeable sketch
  state, no per-group sort, rank error ≤ ``accuracy^-1``.  Same output
  schema; gated in tests against the exact path's rank error bound,
  not value equality.

Nulls are excluded from both n and the ranks (SQL semantics).  Ties:
any row at the target rank carries the same VALUE, so tie order can't
change the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check(qs: list[float]) -> None:
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("quantiles: each q must be in (0, 1]")


def group_quantiles(
    df: DataFrame,
    col: str,
    by: list[str] | str | None = None,
    qs: list[float] = (0.25, 0.5, 0.75),
    out_prefix: str = "q",
) -> DataFrame:
    """Exact type-1 quantiles per group: → group cols + one
    ``{out_prefix}{q}`` column per requested quantile (value at row
    ceil(q*n) of the non-null sort order)."""
    qs = list(qs)
    _check(qs)
    keys = ([by] if isinstance(by, str) else list(by)) if by else []
    d = df.filter(F.col(col).isNotNull()).select(*keys, col)
    w = Window.partitionBy(*keys).orderBy(F.col(col).asc())
    wc = Window.partitionBy(*keys)
    ranked = d.select(
        *keys, col,
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wc).alias("__n"),
    )
    # a row is the q-quantile iff rn == ceil(q*n); one row may serve
    # several q's (tiny groups), hence max(when...) per q
    aggs = [
        F.max(F.when(
            F.col("__rn") == F.ceil(F.lit(float(q)) * F.col("__n")),
            F.col(col))).alias(f"{out_prefix}{q:g}".replace(".", "_"))
        for q in qs
    ]
    if keys:
        return ranked.groupBy(*keys).agg(*aggs)
    return ranked.agg(*aggs)


def approx_group_quantiles(
    df: DataFrame,
    col: str,
    by: list[str] | str | None = None,
    qs: list[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
    out_prefix: str = "q",
) -> DataFrame:
    """Sketch path, same shape: approx_percentile per group (mergeable
    partial state, no per-group sort).  Rank error ≤ n/accuracy."""
    qs = list(qs)
    _check(qs)
    keys = ([by] if isinstance(by, str) else list(by)) if by else []
    d = df.filter(F.col(col).isNotNull()).select(*keys, col)
    pcts = F.percentile_approx(
        F.col(col), [float(q) for q in qs], F.lit(accuracy))
    names = [f"{out_prefix}{q:g}".replace(".", "_") for q in qs]
    base = d.groupBy(*keys).agg(pcts.alias("__p")) if keys \
        else d.agg(pcts.alias("__p"))
    return base.select(
        *keys, *[F.col("__p")[i].alias(n) for i, n in enumerate(names)])


def quantiles_sql(table: str, col: str, by: list[str] | None,
                  qs: list[float], out_prefix: str = "q") -> str:
    """DuckDB mirror of ``group_quantiles``: the same literal
    rank == ceil(q*n) arithmetic (no quantile built-ins — their
    rounding conventions are the thing being avoided)."""
    keys = by or []
    ksel = ", ".join(keys) + ", " if keys else ""
    part = f"PARTITION BY {', '.join(keys)}" if keys else ""
    cols = []
    for q in qs:
        name = f"{out_prefix}{q:g}".replace(".", "_")
        cols.append(
            f"MAX(CASE WHEN rn = CAST(CEIL({float(q)} * n) AS BIGINT)"
            f" THEN {col} END) AS {name}")
    grp = f"GROUP BY {', '.join(keys)}" if keys else ""
    return f"""
        WITH d AS (SELECT {ksel}{col} FROM {table}
                   WHERE {col} IS NOT NULL),
        r AS (SELECT {ksel}{col},
                     ROW_NUMBER() OVER ({part} ORDER BY {col} ASC) AS rn,
                     COUNT(*) OVER ({part}) AS n
              FROM d)
        SELECT {ksel}{", ".join(cols)} FROM r {grp}
    """


def histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
    by: list[str] | str | None = None,
) -> DataFrame:
    """Equi-width histogram: → group cols + (bin, bin_lo, n_rows) with
    ``bin = floor((x - lo) · bins / (hi - lo))`` clamped so x == hi
    lands in the last bin (multiply-BEFORE-divide: one rounding step,
    mirrored verbatim in the SQL twin).  Values outside [lo, hi] and
    nulls are dropped (count the drop with a dq rule if it matters).
    Empty bins are absent — left-join a spine if the consumer needs
    zeros.  One bounded min/max agg when lo/hi are omitted; the count
    is a plain partial-agg groupBy on the small (group, bin) key."""
    if bins < 1:
        raise ValueError("histogram: bins must be >= 1")
    keys = ([by] if isinstance(by, str) else list(by)) if by else []
    if lo is None or hi is None:
        row = df.agg(F.min(F.col(col).cast("double")),
                     F.max(F.col(col).cast("double"))).collect()[0]
        if (lo is None and row[0] is None) or (hi is None and row[1] is None):
            raise ValueError(
                "histogram: no non-null values to infer lo/hi")
        lo = float(row[0]) if lo is None else lo
        hi = float(row[1]) if hi is None else hi
    if not (hi > lo):
        raise ValueError("histogram: need hi > lo")
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(lo)) * F.lit(float(bins))
                  / F.lit(hi - lo))
    b = F.least(raw, F.lit(bins - 1)).cast("long")
    width = (hi - lo) / bins
    return (df.filter(x.isNotNull() & (x >= F.lit(lo))
                      & (x <= F.lit(hi)))
            .select(*keys, b.alias("bin"))
            .groupBy(*keys, "bin")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn("bin_lo",
                        F.lit(lo) + F.col("bin") * F.lit(width)))


def histogram_sql(table: str, col: str, bins: int,
                  lo: float, hi: float,
                  by: list[str] | None = None) -> str:
    """DuckDB mirror of ``histogram`` with fixed lo/hi: same
    multiply-before-divide bin arithmetic, same clamp."""
    keys = by or []
    ksel = ", ".join(keys) + ", " if keys else ""
    grp = ", ".join([*keys, "bin"])
    width = (hi - lo) / bins
    return f"""
        WITH d AS (
          SELECT {ksel}LEAST(CAST(FLOOR((CAST({col} AS DOUBLE) - {lo})
                                        * {float(bins)} / {hi - lo})
                                  AS BIGINT), {bins - 1}) AS bin
          FROM {table}
          WHERE {col} IS NOT NULL AND {col} >= {lo} AND {col} <= {hi})
        SELECT {ksel}bin, COUNT(*) AS n_rows,
               CAST({lo} AS DOUBLE) + bin * CAST({width} AS DOUBLE)
                 AS bin_lo
        FROM d GROUP BY {grp}
    """
