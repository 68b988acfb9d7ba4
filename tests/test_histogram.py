"""Equi-width histogram: python reference, hi-clamp/out-of-range
semantics, grouped bins, DuckDB twin."""

import math

import duckdb

import pytest
from llmxmapreduce_spark.operators.quantiles import histogram, histogram_sql

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_matches_python_reference(spark):
    vals = [0.0, 0.49, 0.5, 2.49, 9.99, 10.0, -1.0, 11.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r.bin: (r.n_rows, r.bin_lo) for r in
           histogram(df, "x", bins=4, lo=0.0, hi=10.0).collect()}
    ref = {}
    for v in vals:
        if v is None or v < 0 or v > 10:
            continue
        b = min(math.floor(v * 4 / 10.0), 3)
        ref[b] = ref.get(b, 0) + 1
    assert {b: n for b, (n, _) in got.items()} == ref
    assert got[0][1] == 0.0 and got[3][1] == 7.5
    # hi clamps into the last bin; out-of-range and nulls dropped
    assert sum(n for n, _ in got.values()) == 6


def test_auto_bounds_and_guards(spark):
    df = spark.createDataFrame([(1.0,), (9.0,)], "x double")
    got = sorted((r.bin, r.n_rows) for r in
                 histogram(df, "x", bins=2).collect())
    assert got == [(0, 1), (1, 1)]
    with pytest.raises(ValueError):
        histogram(df, "x", bins=0)
    with pytest.raises(ValueError):
        histogram(spark.createDataFrame([(5.0,)], "x double"), "x")


def test_matches_duckdb_twin(spark):
    df = spark.read.parquet(EVENTS)
    got = sorted((r.event_type, r.bin, r.n_rows, round(r.bin_lo, 9))
                 for r in histogram(df, "value", bins=20, lo=0.0,
                                    hi=500.0, by="event_type")
                 .collect())
    want = sorted((t, b, n, round(lo, 9)) for t, b, n, lo in
                  duckdb.sql(histogram_sql(
                      f"'{EVENTS}'", "value", 20, 0.0, 500.0,
                      ["event_type"])).fetchall())
    assert got == want
    assert len(got) >= 40        # 5 types x ~10 occupied bins


def test_empty_input_raises_value_error(spark):
    from llmxmapreduce_spark.operators.quantiles import histogram

    empty = spark.createDataFrame([], "x double")
    with pytest.raises(ValueError, match="no non-null values"):
        histogram(empty, "x", bins=4)
    allnull = spark.createDataFrame([(None,), (None,)], "x double")
    with pytest.raises(ValueError, match="no non-null values"):
        histogram(allnull, "x", bins=4)
