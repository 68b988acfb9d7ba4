"""Moment stats: exact sums vs DuckDB, derived corr/slope vs numpy,
null-pair exclusion, degenerate groups."""

import duckdb
import numpy as np
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.moments import (moment_stats,
                                                   with_corr_slope)

LINEITEM = "/root/testdata/sf0.001/lineitem.parquet"


def test_sums_match_duckdb(spark):
    df = spark.read.parquet(LINEITEM)
    got = sorted(
        (r.l_returnflag, r.n, r.sum_x, r.sum_y,
         r.sum_xy, r.sum_x2, r.sum_y2)
        for r in moment_stats(df, "l_quantity", "l_extendedprice",
                              by="l_returnflag").collect())
    want = sorted(duckdb.sql(f"""
        WITH d AS (SELECT l_returnflag,
                          CAST(l_quantity AS DECIMAL(19,6)) AS x,
                          CAST(l_extendedprice AS DECIMAL(19,6)) AS y
                   FROM '{LINEITEM}'
                   WHERE l_quantity IS NOT NULL
                     AND l_extendedprice IS NOT NULL)
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(x) AS DECIMAL(38,6)),
               CAST(SUM(y) AS DECIMAL(38,6)),
               CAST(SUM(x*y) AS DECIMAL(38,12)),
               CAST(SUM(x*x) AS DECIMAL(38,12)),
               CAST(SUM(y*y) AS DECIMAL(38,12))
        FROM d GROUP BY l_returnflag
    """).fetchall())
    assert got == want          # exact DECIMAL equality, no rounding


def test_corr_slope_match_numpy(spark):
    rng = np.random.default_rng(5)
    xs = rng.uniform(0, 100, 2000)
    ys = 3.0 * xs + rng.normal(0, 10, 2000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)],
        "x double, y double")
    row = with_corr_slope(moment_stats(df, "x", "y")).collect()[0]
    # inputs quantize to 1e-6 (the decimal cast); compare loosely
    assert abs(row.corr - np.corrcoef(xs, ys)[0, 1]) < 1e-4
    slope = np.polyfit(xs, ys, 1)[0]
    assert abs(row.slope - slope) < 1e-3


def test_null_pairs_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (None, 5.0), (3.0, None), (2.0, 4.0)],
        "x double, y double")
    row = with_corr_slope(moment_stats(df, "x", "y")).collect()[0]
    assert row.n == 2 and row.sum_x == 3.0 and row.sum_y == 6.0
    const = spark.createDataFrame([(1.0, 5.0), (1.0, 7.0)],
                                  "x double, y double")
    r2 = with_corr_slope(moment_stats(const, "x", "y")).collect()[0]
    assert r2.corr is None and r2.slope is None    # zero x-variance


def test_overflow_rows_leave_n_and_sums_consistent(spark):
    # review finding: values past decimal(19,6) range null out in the
    # cast while count(*) still included them, silently skewing corr
    from llmxmapreduce_spark.operators.moments import moment_stats

    df = spark.createDataFrame(
        [(1.0, 2.0), (1e14, 1.0), (3.0, 4.0)], "x double, y double")
    row = moment_stats(df, "x", "y").collect()[0]
    assert row["n"] == 2                      # overflow row excluded
    assert float(row["sum_x"]) == 4.0
    assert float(row["sum_y"]) == 6.0
