"""asof_join / range_join vs DuckDB twins + semantic edge cases."""

import duckdb
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.temporal import asof_join, range_join

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _events(spark):
    return spark.read.parquet(EVENTS)


# ---------------------------------------------------------------- asof


def test_asof_backward_matches_duckdb(spark):
    ev = _events(spark)
    left = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "value")
    got = asof_join(left, right, on="user_id",
                    value_cols=["value"]).orderBy("event_id")
    rows = [(r.event_id, r.ts_r, None if r.value_r is None
             else round(r.value_r, 9)) for r in got.collect()]

    want = duckdb.sql(f"""
        WITH e AS (SELECT * FROM '{EVENTS}'),
        l AS (SELECT event_id, user_id, ts FROM e
              WHERE event_type = 'click'),
        r AS (SELECT user_id, ts, value FROM e
              WHERE event_type = 'purchase')
        SELECT l.event_id, r.ts AS ts_r, r.value AS value_r
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id
    """).fetchall()
    want = [(a, b, None if c is None else round(c, 9)) for a, b, c in want]
    assert rows == want
    assert any(r[1] is None for r in rows)      # some clicks precede any buy
    assert any(r[1] is not None for r in rows)


def test_asof_inclusive_tie_and_forward(spark):
    left = spark.createDataFrame(
        [(1, 10.0), (1, 4.0), (2, 7.0)], "k int, t double")
    right = spark.createDataFrame(
        [(1, 10.0, "at10"), (1, 5.0, "at5"), (2, 9.0, "at9")],
        "k int, t double, v string")
    back = {r.k * 100 + r.t: r.v_r for r in
            asof_join(left, right, on="k", left_ts="t").collect()}
    # equal timestamps MATCH (inclusive), like DuckDB l.t >= r.t
    assert back[110.0] == "at10"
    assert back[104.0] is None
    assert back[207.0] is None
    fwd = {r.k * 100 + r.t: r.v_r for r in
           asof_join(left, right, on="k", left_ts="t",
                     direction="forward").collect()}
    assert fwd[110.0] == "at10"
    assert fwd[104.0] == "at5"
    assert fwd[207.0] == "at9"


def test_asof_tolerance_nulls_far_matches(spark):
    left = spark.createDataFrame([(1, 100.0), (1, 11.0)], "k int, t double")
    right = spark.createDataFrame([(1, 10.0, "x")], "k int, t double, v string")
    got = {r.t: r.v_r for r in asof_join(
        left, right, on="k", left_ts="t",
        tolerance=F.lit(5.0)).collect()}
    assert got[11.0] == "x"          # gap 1 <= 5
    assert got[100.0] is None        # gap 90 > 5: nulled, row kept
    assert len(got) == 2


def test_asof_empty_right_keeps_left(spark):
    left = spark.createDataFrame([(1, 1.0)], "k int, t double")
    right = spark.createDataFrame([], "k int, t double, v string")
    out = asof_join(left, right, on="k", left_ts="t").collect()
    assert len(out) == 1 and out[0].v_r is None


# ---------------------------------------------------------------- range


def test_range_join_matches_duckdb_between(spark):
    ev = _events(spark)
    points = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    ivals = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("ival_id"), "user_id",
        F.col("ts").alias("t_start"),
        (F.col("ts") + F.expr("INTERVAL 12 HOURS")).alias("t_end"))
    got = sorted(
        (r.event_id, r.ival_id)
        for r in range_join(points, ivals, "ts", "t_start", "t_end",
                            on="user_id", bucket=3600.0).collect())
    want = sorted(duckdb.sql(f"""
        WITH e AS (SELECT * FROM '{EVENTS}'),
        p AS (SELECT event_id, user_id, ts FROM e
              WHERE event_type = 'click'),
        i AS (SELECT event_id AS ival_id, user_id, ts AS t_start,
                     ts + INTERVAL 12 HOUR AS t_end FROM e
              WHERE event_type = 'signup')
        SELECT p.event_id, i.ival_id
        FROM p JOIN i ON p.user_id = i.user_id
         AND p.ts BETWEEN i.t_start AND i.t_end
    """).fetchall())
    assert got == want and len(got) > 0


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # interval spans many buckets; each contained point pairs exactly once
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "pid int, x double")
    ivals = spark.createDataFrame(
        [(100, 3.0, 41.0), (200, 10.0, 10.0)],
        "ival int, lo double, hi double")
    out = range_join(points, ivals, "x", "lo", "hi", bucket=2.0).collect()
    pairs = [(r.pid, r.ival) for r in out]
    assert len(pairs) == len(set(pairs))
    assert sum(1 for _, iv in pairs if iv == 100) == 39   # 3..41 inclusive
    assert (10, 200) in pairs


def test_range_join_left_outer_keeps_unmatched_points(spark):
    points = spark.createDataFrame([(1, 5.0), (2, 99.0)], "pid int, x double")
    ivals = spark.createDataFrame([(7, 0.0, 10.0)],
                                  "ival int, lo double, hi double")
    rows = {r.pid: r.ival for r in range_join(
        points, ivals, "x", "lo", "hi", bucket=4.0, how="left").collect()}
    assert rows == {1: 7, 2: None}


def test_range_join_self_lineage_key_is_honored(spark):
    # both sides project the SAME parent — the key equality must not
    # collapse to a trivially-true same-column predicate
    base = spark.createDataFrame(
        [(1, 1, 5.0), (2, 2, 5.0)], "rid int, k int, t double")
    points = base.select("rid", "k", F.col("t").alias("x"))
    ivals = base.select(F.col("rid").alias("ival"), "k",
                        (F.col("t") - 1).alias("lo"),
                        (F.col("t") + 1).alias("hi"))
    pairs = sorted((r.rid, r.ival) for r in range_join(
        points, ivals, "x", "lo", "hi", on="k", bucket=2.0).collect())
    assert pairs == [(1, 1), (2, 2)]    # cross-key (1,2)/(2,1) excluded


def test_range_join_rejects_column_clash(spark):
    a = spark.createDataFrame([(1.0,)], "x double")
    b = spark.createDataFrame([(0.0, 2.0, 9.0)], "x double, lo double, hi double")
    with pytest.raises(ValueError, match="overlapping"):
        range_join(a, b, "x", "lo", "hi")


def test_asof_null_ts_rows_follow_sql_comparison_semantics(spark):
    # review finding: a null-ts right row used to sort FIRST (asc nulls
    # first) and last(ignorenulls) carried its payload as the "match"
    # for left rows with no true predecessor; DuckDB ASOF (the oracle)
    # never matches null ts on either side
    left = spark.createDataFrame(
        [(1, 10.0), (1, None), (2, 5.0)], "k int, t double")
    right = spark.createDataFrame(
        [(1, None, 42), (1, 99.0, 7), (2, 1.0, 3)],
        "k int, t double, v int")
    got = {(r.k, r.t): (r.t_r, r.v_r)
           for r in asof_join(left, right, on="k", left_ts="t",
                              value_cols=["v"]).collect()}
    assert got[(1, 10.0)] == (None, None)   # null-ts right row ignored
    assert got[(1, None)] == (None, None)   # null-ts left row unmatched
    assert got[(2, 5.0)] == (1.0, 3)
    # forward direction: null left ts must not pick up a payload via the
    # desc-nulls-last scan either
    fwd = {(r.k, r.t): (r.t_r, r.v_r)
           for r in asof_join(left, right, on="k", left_ts="t",
                              value_cols=["v"],
                              direction="forward").collect()}
    assert fwd[(1, None)] == (None, None)
    assert fwd[(1, 10.0)] == (99.0, 7)


def test_asof_tied_right_rows_resolve_to_max_payload(spark):
    # docstring contract: (key, ts) ties resolve to the MAX payload
    # struct in both directions (the payload is in the window sort key)
    left = spark.createDataFrame([(1, 5.0), (1, 3.0)], "k int, t double")
    right = spark.createDataFrame(
        [(1, 4.0, 1), (1, 4.0, 9), (1, 4.0, 5)], "k int, t double, v int")
    back = {r.t: r.v_r for r in asof_join(
        left, right, on="k", left_ts="t", value_cols=["v"]).collect()}
    assert back[5.0] == 9
    fwd = {r.t: r.v_r for r in asof_join(
        left, right, on="k", left_ts="t", value_cols=["v"],
        direction="forward").collect()}
    assert fwd[3.0] == 9
