"""HyperLogLog sketches (operators/hll.py): estimate accuracy vs exact
countDistinct, exact mergeability (union-of-sketches ≡
sketch-of-union at the register level), the DuckDB twin of the portable
register table, null/partitioning hygiene, and the linear-counting
small-range path."""

import duckdb
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.operators.hll import (hll_estimate, hll_merge,
                                               hll_sketch, hll_sketch_sql)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_estimate_accuracy_vs_exact(spark):
    """p=12 (m=4096) carries ~1.6% typical error; assert within 5% on
    cardinalities from a few hundred to tens of thousands."""
    n = 30_000
    df = spark.range(n).select(
        (F.col("id") % 7).alias("g"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"))
    est = {r.g: r.n_distinct_est
           for r in hll_estimate(hll_sketch(df, "v", by="g", p=12),
                                 by="g", p=12).collect()}
    exact = {r.g: r.n for r in df.groupBy("g").agg(
        F.countDistinct("v").alias("n")).collect()}
    assert set(est) == set(exact)
    for g, n_exact in exact.items():
        assert abs(est[g] - n_exact) / n_exact < 0.05, (g, est[g], n_exact)


def test_small_range_linear_counting(spark):
    """Tiny cardinalities go through the linear-counting correction and
    land essentially exact."""
    df = spark.createDataFrame([(f"x{i}",) for i in range(40)],
                               "v string")
    est = hll_estimate(hll_sketch(df, "v", p=12), p=12).collect()[0]
    assert abs(est.n_distinct_est - 40) <= 1


def test_merge_equals_single_sketch(spark):
    """The artifact property: daily sketches roll up EXACTLY — the
    merged register table equals the one-shot table, so estimates are
    identical by construction."""
    df = spark.range(5_000).select(
        F.concat(F.lit("v"), (F.col("id") % 3_000).cast("string"))
        .alias("v"),
        (F.col("id") < 2_500).alias("day1"))
    a = hll_sketch(df.filter("day1"), "v", p=10)
    b = hll_sketch(df.filter("NOT day1"), "v", p=10)
    merged = hll_merge(a, b)
    single = hll_sketch(df, "v", p=10)
    assert _rows(merged) == _rows(single)


def test_portable_register_table_matches_duckdb(spark):
    """The values surface: the portable register table is recomputed
    bit-for-bit by the generated SQL twin."""
    d = load_table(spark, SF, "documents").select("lang", "doc_id")
    got = _rows(hll_sketch(d, "doc_id", by="lang", p=8, portable=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    want = set(con.execute(
        hll_sketch_sql("documents", "doc_id", "lang", p=8)).fetchall())
    assert got == want and len(got) > 0


def test_nulls_skipped_and_partition_invariant(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), ("a",)], "v string")
    s1 = _rows(hll_sketch(df, "v", p=6))
    s2 = _rows(hll_sketch(df.repartition(13), "v", p=6))
    assert s1 == s2
    est = hll_estimate(hll_sketch(df, "v", p=6), p=6).collect()[0]
    assert est.n_distinct_est == 2        # null skipped, dup collapsed


def test_p_guard(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="p must be"):
        hll_sketch(df, "v", p=3)


def test_p_metadata_validated(spark):
    """r10 review: a register table estimated/merged under a different
    p silently produced garbage; p now rides as column metadata and is
    validated."""
    df = spark.createDataFrame([(f"x{i}",) for i in range(50)],
                               "v string")
    s12 = hll_sketch(df, "v", p=12)
    assert s12.schema["register"].metadata["hll_p"] == 12
    with pytest.raises(ValueError, match="built with p=12"):
        hll_estimate(s12, p=8)
    s8 = hll_sketch(df, "v", p=8)
    with pytest.raises(ValueError, match="different p"):
        hll_merge(s12, s8)


def test_multicolumn_null_tuples_distinct(spark):
    """r10 review: concat_ws drops nulls, so ('x', NULL) and (NULL,
    'x') used to hash identically; the sentinel keeps them distinct."""
    df = spark.createDataFrame(
        [("x", None), (None, "x"), ("x", "x")], "a string, b string")
    est = hll_estimate(hll_sketch(df, ["a", "b"], p=10), p=10) \
        .collect()[0]
    assert est.n_distinct_est == 3
