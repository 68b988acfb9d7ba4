"""assign_sessions / rolling_stats: DuckDB twins + gap/tie/window-edge
semantics."""

import duckdb
from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.operators.temporal import (assign_sessions,
                                                    rolling_stats)

SF = "/root/testdata/sf0.001"
EVENTS = f"{SF}/events.parquet"


def test_sessions_match_duckdb(spark):
    ev = load_table(spark, SF, "events")
    got = sorted((r.event_id, r.session_idx) for r in
                 assign_sessions(ev, on="user_id", gap_s=300)
                 .select("event_id", "session_idx").collect())
    want = sorted(duckdb.sql(f"""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t
                   FROM '{EVENTS}'),
        m AS (SELECT event_id, user_id, t,
                CASE WHEN t - LAG(t) OVER
                       (PARTITION BY user_id ORDER BY t) > 300000000
                     THEN 1 ELSE 0 END AS f
              FROM e)
        SELECT event_id,
               SUM(f) OVER (PARTITION BY user_id ORDER BY t
                            ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM m
    """).fetchall())
    assert got == want
    assert max(s for _, s in got) > 0


def test_session_semantics(spark):
    rows = [(1, 0.0), (1, 100.0), (1, 100.0), (1, 5000.0), (2, 0.0)]
    df = spark.createDataFrame(rows, "k long, s double") \
        .select("k", F.timestamp_micros((F.col("s") * 1_000_000)
                                        .cast("long")).alias("ts"))
    got = [(r.k, r.ts.timestamp(), r.session_idx) for r in
           assign_sessions(df, on="k", gap_s=1000).collect()]
    by = {(k, t): s for k, t, s in got}
    assert by[(1, 0.0)] == 0
    assert by[(1, 100.0)] == 0          # ties share the session
    assert by[(1, 5000.0)] == 1         # 4900s > 1000s gap
    assert by[(2, 0.0)] == 0


def test_rolling_matches_duckdb(spark):
    ev = load_table(spark, SF, "events") \
        .filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    out = rolling_stats(ev, on="user_id", window_s=86400.0)
    got = sorted((r.event_id, r.w_count,
                  round(r.w_sum, 9), round(r.w_avg, 9),
                  round(r.w_min, 9), round(r.w_max, 9))
                 for r in out.collect())
    want = sorted(duckdb.sql(f"""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
                   FROM '{EVENTS}' WHERE event_type = 'purchase')
        SELECT event_id,
               COUNT(value) OVER w AS c,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                 AS s,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                 / CAST(COUNT(value) OVER w AS DOUBLE) AS a,
               MIN(value) OVER w AS mn, MAX(value) OVER w AS mx
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY t
                     RANGE BETWEEN 86400000000 PRECEDING
                           AND CURRENT ROW)
    """).fetchall())
    want = [(i, c, round(s, 9), round(a, 9), round(mn, 9), round(mx, 9))
            for i, c, s, a, mn, mx in want]
    assert got == want
    assert any(c > 1 for _, c, *_ in got)


def test_rolling_window_edges(spark):
    rows = [(1, 0.0, 1.0), (1, 10.0, 2.0), (1, 10.0, 3.0),
            (1, 20.0, 4.0), (1, 21.0, 5.0)]
    df = spark.createDataFrame(rows, "k long, s double, value double") \
        .select("k", F.timestamp_micros((F.col("s") * 1_000_000)
                                        .cast("long")).alias("ts"),
                "value")
    out = {(r.ts.timestamp(), r.value): (r.w_count, r.w_sum)
           for r in rolling_stats(df, on="k", window_s=10.0).collect()}
    assert out[(0.0, 1.0)] == (1, 1.0)
    # window is inclusive at ts-10: row at 0 is IN for ts=10
    assert out[(10.0, 2.0)] == (3, 6.0)     # equal-ts peers both in
    assert out[(10.0, 3.0)] == (3, 6.0)
    # lower edge INCLUSIVE: [10, 20] keeps the 10s pair, drops 0.0
    assert out[(20.0, 4.0)] == (3, 9.0)
    # one second later the 10s pair ages out: [11, 21]
    assert out[(21.0, 5.0)] == (2, 9.0)
