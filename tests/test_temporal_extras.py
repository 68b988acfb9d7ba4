"""resample_locf / scd2_intervals / snapshot_at: DuckDB twins plus
semantic edges (tick alignment, tolerance staleness, no-op collapse,
open intervals, snapshot slicing)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.operators.temporal import (resample_locf,
                                                    scd2_intervals,
                                                    snapshot_at)

SF = "/root/testdata/sf0.001"
EVENTS = f"{SF}/events.parquet"
STEP_US = 6 * 3600 * 1_000_000


def test_resample_matches_duckdb(spark):
    ev = load_table(spark, SF, "events") \
        .filter(F.col("event_type") == "purchase") \
        .groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    got = sorted(
        (r.user_id, r.ts, r.ts_r,
         None if r.value_r is None else round(r.value_r, 9))
        for r in resample_locf(ev, on="user_id",
                               interval_s=6 * 3600).collect())
    want = sorted(duckdb.sql(f"""
        WITH obs AS (SELECT user_id, ts, MAX(value) AS value
                     FROM '{EVENTS}' WHERE event_type = 'purchase'
                     GROUP BY user_id, ts),
        spans AS (SELECT user_id,
                         CAST(CEIL(epoch_us(MIN(ts)) / {STEP_US}.0)
                              AS BIGINT) * {STEP_US} AS t0,
                         CAST(FLOOR(epoch_us(MAX(ts)) / {STEP_US}.0)
                              AS BIGINT) * {STEP_US} AS t1
                  FROM obs GROUP BY user_id),
        grid AS (SELECT user_id,
                        make_timestamp(unnest(generate_series(
                            t0, t1, {STEP_US}))) AS ts
                 FROM spans WHERE t0 <= t1)
        SELECT grid.user_id, grid.ts, obs.ts AS ts_r, obs.value
        FROM grid ASOF LEFT JOIN obs
          ON grid.user_id = obs.user_id AND grid.ts >= obs.ts
    """).fetchall())
    want = [(u, t, tr, None if v is None else round(v, 9))
            for u, t, tr, v in want]
    assert got == want
    assert len(got) > 100


def test_resample_alignment_and_tolerance(spark):
    rows = [(1, 10.0, 1.0), (1, 95.0, 2.0)]
    df = spark.createDataFrame(rows, "k long, s double, v double") \
        .select("k", F.timestamp_micros((F.col("s") * 1_000_000)
                                        .cast("long")).alias("ts"), "v")
    out = resample_locf(df, on="k", interval_s=10.0)
    rowsout = sorted((r.ts.timestamp(), r.ts_r.timestamp(), r.v_r)
                     for r in out.collect())
    # ticks at 10..90 inclusive (ceil(10/10)*10=10, floor(95/10)*10=90)
    assert [t for t, _, _ in rowsout] == [float(x) for x in
                                          range(10, 100, 10)]
    assert all(tr == 10.0 and v == 1.0 for _, tr, v in rowsout)
    # tolerance: carried value goes stale after 30s
    tol = resample_locf(df, on="k", interval_s=10.0,
                        tolerance=F.expr("INTERVAL 30 SECONDS"))
    stale = sorted((r.ts.timestamp(), r.v_r) for r in tol.collect())
    assert [v for _, v in stale] == [1.0, 1.0, 1.0, 1.0] + [None] * 5


def test_scd2_matches_duckdb(spark):
    ev = load_table(spark, SF, "events") \
        .filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "value")
    got = sorted((r.user_id, round(r.value, 9),
                  r.valid_from, r.valid_to)
                 for r in scd2_intervals(ev, on="user_id",
                                         attr_cols=["value"]).collect())
    want = sorted(duckdb.sql(f"""
        WITH d AS (SELECT user_id, ts, MAX(value) AS value
                   FROM '{EVENTS}' WHERE event_type = 'purchase'
                   GROUP BY user_id, ts),
        c AS (SELECT *, LAG(value) OVER
                (PARTITION BY user_id ORDER BY ts) AS pv FROM d),
        k AS (SELECT user_id, ts, value FROM c
              WHERE pv IS NULL OR value <> pv)
        SELECT user_id, value, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 AS valid_to
        FROM k
    """).fetchall())
    want = [(u, round(v, 9), f, t) for u, v, f, t in want]
    assert got == want
    assert any(t is None for _, _, _, t in got)      # open current rows


def test_scd2_collapse_and_snapshot(spark):
    rows = [(1, 1.0, "a"), (1, 2.0, "a"), (1, 3.0, "b"),
            (2, 1.0, "x")]
    df = spark.createDataFrame(rows, "k long, t double, attr string")
    dim = scd2_intervals(df, on="k", ts_col="t", attr_cols=["attr"])
    got = sorted((r.k, r.attr, r.valid_from, r.valid_to)
                 for r in dim.collect())
    assert got == [(1, "a", 1.0, 3.0), (1, "b", 3.0, None),
                   (2, "x", 1.0, None)]
    # no collapse keeps the no-op row
    raw = scd2_intervals(df, on="k", ts_col="t", attr_cols=["attr"],
                         collapse=False)
    assert raw.count() == 4
    snap = {r.k: r.attr for r in
            snapshot_at(dim, F.lit(2.5)).collect()}
    assert snap == {1: "a", 2: "x"}
    snap2 = {r.k: r.attr for r in
             snapshot_at(dim, F.lit(3.0)).collect()}
    assert snap2 == {1: "b", 2: "x"}


def test_resample_bad_interval(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, ts double")
    with pytest.raises(ValueError):
        resample_locf(df, on="k", interval_s=0)
