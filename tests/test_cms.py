"""Count-Min sketch (operators/sketches.py cms_*): one-sided estimator
guarantee (est >= true, est <= true + eps*N spot-checked), exact
mergeability, weighted counts, the DuckDB twin of the sketch table, and
null/partitioning hygiene."""

import duckdb
from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.operators.sketches import (cms_merge, cms_query,
                                                    cms_sketch,
                                                    cms_sketch_sql)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _zipf_df(spark, n=20_000, keys=500):
    return spark.range(n).select(
        F.concat(F.lit("k"),
                 (F.col("id") % F.lit(keys) * F.col("id") % F.lit(keys))
                 .cast("string")).alias("k"))


def test_estimator_one_sided(spark):
    df = _zipf_df(spark)
    width, depth = 512, 4
    sk = cms_sketch(df, "k", width=width, depth=depth)
    keys = df.distinct()
    est = {r.k: r.freq_est for r in cms_query(
        sk, keys, "k", width=width, depth=depth).collect()}
    true = {r.k: r.c for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    n = sum(true.values())
    eps_bound = (2.71828 / width) * n
    assert set(est) == set(true)
    over = 0
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)           # never undercounts
        if est[k] > t + eps_bound:
            over += 1
    # the eps*N bound holds w.p. 1-delta per key; allow a tiny tail
    assert over <= max(2, len(true) // 50), over


def test_merge_equals_single(spark):
    df = _zipf_df(spark, n=8_000)
    a = cms_sketch(df.filter(F.col("k") < "k3"), "k", width=128, depth=3)
    b = cms_sketch(df.filter(~(F.col("k") < "k3")), "k",
                   width=128, depth=3)
    assert _rows(cms_merge(a, b)) == _rows(
        cms_sketch(df, "k", width=128, depth=3))


def test_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 2)], "k string, w int")
    sk = cms_sketch(df, "k", width=64, depth=3, weight_col="w")
    est = {r.k: r.freq_est for r in cms_query(
        sk, df.select("k").distinct(), "k",
        width=64, depth=3).collect()}
    assert est["a"] >= 15 and est["b"] >= 2


def test_twin_matches_duckdb(spark):
    ev = load_table(spark, SF, "events").select("user_id")
    got = _rows(cms_sketch(ev, "user_id", width=256, depth=3))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = set(con.execute(
        cms_sketch_sql("events", "user_id", width=256, depth=3))
        .fetchall())
    assert got == want and len(got) > 0


def test_nulls_and_partition_invariance(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    s1 = _rows(cms_sketch(df, "k", width=32, depth=2))
    s2 = _rows(cms_sketch(df.repartition(7), "k", width=32, depth=2))
    assert s1 == s2
    # two increments of "a" on depth=2 -> exactly 2 cells of cnt 2
    assert sorted(c for *_k, c in s1) == [2, 2]


def test_dimensions_metadata_validated(spark):
    """r10 review: cms_query under mismatched (width, depth) silently
    returned freq_est=0; dimensions now ride as column metadata."""
    df = spark.createDataFrame([("a",)], "k string")
    sk = cms_sketch(df, "k", width=256, depth=3)
    assert sk.schema["cell"].metadata == {"cms_width": 256,
                                          "cms_depth": 3}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="built with width=256"):
        cms_query(sk, df, "k", width=2048, depth=5)
    with _pytest.raises(ValueError, match="incompatible"):
        cms_merge(sk, cms_sketch(df, "k", width=128, depth=3))
