"""Grouped quantiles: exact path vs a pure-Python type-1 reference and
the DuckDB rank-arithmetic twin; sketch path gated by rank error."""

import math
import random

import duckdb
import pytest

from llmxmapreduce_spark.operators.quantiles import (approx_group_quantiles,
                                                     group_quantiles,
                                                     quantiles_sql)

DOCS = "/root/testdata/sf0.001/documents.parquet"
QS = [0.25, 0.5, 0.9]


def _type1(vals, q):
    s = sorted(vals)
    return s[math.ceil(q * len(s)) - 1]


def test_exact_matches_python_reference(spark):
    rng = random.Random(3)
    rows = [(f"g{i % 3}", rng.uniform(-5, 5)) for i in range(997)]
    df = spark.createDataFrame(rows, "g string, x double").repartition(7)
    got = {r.g: (r.q0_25, r.q0_5, r.q0_9) for r in
           group_quantiles(df, "x", by="g", qs=QS).collect()}
    by_g = {}
    for g, x in rows:
        by_g.setdefault(g, []).append(x)
    for g, vals in by_g.items():
        assert got[g] == tuple(_type1(vals, q) for q in QS)


def test_exact_matches_duckdb_twin(spark):
    df = spark.read.parquet(DOCS)
    got = sorted((r.lang, r.q0_25, r.q0_5, r.q0_9) for r in
                 group_quantiles(df, "n_chars", by="lang",
                                 qs=QS).collect())
    want = sorted(duckdb.sql(quantiles_sql(
        f"'{DOCS}'", "n_chars", ["lang"], QS)).fetchall())
    assert got == want
    assert len(got) == 5


def test_ungrouped_and_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (3.0,), (4.0,)], "x double")
    row = group_quantiles(df, "x", qs=[0.5, 1.0]).collect()[0]
    assert (row.q0_5, row.q1) == (2.0, 4.0)    # n=4, ceil(.5*4)=2


def test_bad_q(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        group_quantiles(df, "x", qs=[0.0])


def test_approx_within_rank_error(spark):
    rng = random.Random(9)
    rows = [("a", float(rng.randrange(10_000))) for _ in range(20_000)]
    df = spark.createDataFrame(rows, "g string, x double")
    approx = approx_group_quantiles(df, "x", by="g", qs=QS,
                                    accuracy=1000).collect()[0]
    vals = sorted(x for _, x in rows)
    n = len(vals)
    for q, got in zip(QS, (approx.q0_25, approx.q0_5, approx.q0_9)):
        target = math.ceil(q * n) - 1
        # locate got's rank; must be within n/accuracy of the target
        import bisect
        lo = bisect.bisect_left(vals, got)
        hi = bisect.bisect_right(vals, got) - 1
        err = min(abs(lo - target), abs(hi - target))
        assert err <= n / 1000 + 1
