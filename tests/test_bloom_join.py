"""Bloom-pruned joins: the no-false-negative guarantee, semi-join
equivalence under several bit budgets, numpy-vs-Catalyst probe parity,
measured prune selectivity, and the pure-codegen plan pin."""

import random

import pytest

from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.bloom_join import (bloom_prune,
                                                      bloom_semi_join,
                                                      build_key_bloom)

SF = "/root/testdata/sf0.001"


def test_semi_join_equivalence(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .filter("o_totalprice > 100000") \
        .select(F.col("o_orderkey").alias("l_orderkey"))
    want = sorted(r.l_linenumber * 10_000_000 + r.l_orderkey for r in
                  li.join(orders, "l_orderkey", "left_semi").collect())
    for bpk in (6, 12, 20):
        got = sorted(r.l_linenumber * 10_000_000 + r.l_orderkey for r in
                     bloom_semi_join(li, orders, "l_orderkey",
                                     bits_per_key=bpk).collect())
        assert got == want, f"bits_per_key={bpk}"


def test_no_false_negatives_and_selectivity(spark):
    rng = random.Random(4)
    right_keys = {rng.randrange(10**12) for _ in range(5_000)}
    left_keys = list(right_keys)[:1_000] + \
        [rng.randrange(10**12) for _ in range(50_000)]
    left = spark.createDataFrame([(k,) for k in left_keys], "k long")
    right = spark.createDataFrame([(k,) for k in right_keys], "k long")
    bloom = build_key_bloom(right, "k", bits_per_key=12)
    kept = {r.k for r in bloom_prune(left, "k", bloom).collect()}
    # every true match survives
    assert set(left_keys) & right_keys <= kept
    # and the prune actually prunes: fpp at 12 bits ~ 0.5%, so kept
    # non-matches should be a small fraction of the 50k junk rows
    junk_kept = len(kept - right_keys)
    assert junk_kept < 2_500


def test_probe_matches_numpy_build(spark):
    # every key INSERTED must probe positive through the Catalyst path
    keys = [(i * 7919 + 13,) for i in range(3_000)]
    df = spark.createDataFrame(keys, "k long")
    bloom = build_key_bloom(df, "k", bits_per_key=10)
    assert bloom_prune(df, "k", bloom).count() == len(keys)


def test_multi_column_key_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "a"), (9, "z")],
        "x long, y string")
    right = spark.createDataFrame([(1, "a"), (7, "q")],
                                  "x long, y string")
    out = bloom_semi_join(left, right, ["x", "y"]).collect()
    assert [(r.x, r.y) for r in out] == [(1, "a")]


def test_prune_plan_is_codegen_only(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .select(F.col("o_orderkey").alias("l_orderkey"))
    bloom = build_key_bloom(orders, "l_orderkey", bits_per_key=12)
    plan = bloom_prune(li, "l_orderkey", bloom)._jdf \
        .queryExecution().executedPlan().toString()
    # no Python, no shuffle — the only exchange is the one-row bitmap
    # broadcast (a BroadcastExchange, not a hash repartition)
    assert "Python" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Scan parquet") == 1


def test_arrow_probe_matches_catalyst(spark):
    import random
    rng = random.Random(8)
    right = spark.createDataFrame(
        [(rng.randrange(10**12),) for _ in range(4_000)], "k long")
    left = spark.createDataFrame(
        [(rng.randrange(10**12),) for _ in range(20_000)], "k long") \
        .union(right.limit(500))
    bloom = build_key_bloom(right, "k", bits_per_key=12)
    a = sorted(r.k for r in
               bloom_prune(left, "k", bloom, probe="catalyst").collect())
    b = sorted(r.k for r in
               bloom_prune(left, "k", bloom, probe="arrow").collect())
    assert a == b
    with pytest.raises(ValueError):
        bloom_prune(left, "k", bloom, probe="nope")
