"""Bucketed table layout: the pay-the-shuffle-once contract.  Pins the
plans, not just the results: a co-located join of two same-key bucketed
tables must carry NO Exchange (and, with matching sortBy and one file
per bucket, no Sort), the unbucketed twin MUST shuffle, a groupBy on
the bucket key must pre-aggregate without an Exchange below the final
agg, and equality predicates must prune buckets at the scan."""

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.sources.bucketed import (bucket_count_for,
                                                  colocated_join,
                                                  enable_full_bucketed_scan,
                                                  read_bucketed,
                                                  write_bucketed)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _sort_nodes(plan: str) -> int:
    return sum(1 for ln in plan.splitlines()
               if ln.replace("+-", " ").replace(":-", " ").replace("*", " ")
               .strip().startswith("Sort "))


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture()
def full_bucketed_scan(spark):
    prev = enable_full_bucketed_scan(spark)
    yield
    for k, v in prev.items():
        spark.conf.set(k, v)


@pytest.fixture()
def two_tables(spark, tmp_path):
    a = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va"))
    b = spark.range(0, 7_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "t_buck_a", "k", 8, path=str(tmp_path / "a"))
    write_bucketed(b, "t_buck_b", "k", 8, path=str(tmp_path / "b"))
    yield "t_buck_a", "t_buck_b"
    spark.sql("DROP TABLE IF EXISTS t_buck_a")
    spark.sql("DROP TABLE IF EXISTS t_buck_b")


def test_bucket_count_sizing():
    assert bucket_count_for(0) == 8                    # clamp low
    assert bucket_count_for(100_000_000) == 32         # 25 buckets → po2
    assert bucket_count_for(10**12, max_buckets=1024) == 1024
    with pytest.raises(ValueError):
        bucket_count_for(-1)


def test_colocated_join_no_exchange_no_sort(spark, two_tables, no_broadcast,
                                            full_bucketed_scan):
    ta, tb = two_tables
    j = colocated_join(spark, ta, tb, "k")
    plan = _plan(j)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # sortBy matched the join key and each bucket is one file
    # (repartition_first), so the merge needs no Sort either
    assert _sort_nodes(plan) == 0, plan
    # and the plan is the same join a shuffle would have produced
    want = 7_000                                       # b ⊂ a on k
    assert j.count() == want


def test_unbucketed_twin_shuffles(spark, tmp_path, no_broadcast):
    a = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va"))
    b = spark.range(0, 7_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    a.write.parquet(str(tmp_path / "pa"))
    b.write.parquet(str(tmp_path / "pb"))
    j = spark.read.parquet(str(tmp_path / "pa")).join(
        spark.read.parquet(str(tmp_path / "pb")), "k")
    assert "Exchange" in _plan(j)


def test_bucketed_aggregation_no_exchange(spark, two_tables):
    ta, _ = two_tables
    agg = read_bucketed(spark, ta).groupBy("k").agg(F.sum("va").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 20_000


def test_bucket_pruning_on_equality(spark, two_tables, full_bucketed_scan):
    ta, _ = two_tables
    one = read_bucketed(spark, ta).filter(F.col("k") == 12_345)
    plan = _plan(one)
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    assert one.count() == 1


def test_plain_parquet_read_loses_layout(spark, two_tables, tmp_path,
                                         no_broadcast):
    """The layout lives in catalog metadata: reading the same files with
    spark.read.parquet plans a full shuffle again — the reason
    read_bucketed goes through the catalog."""
    ta, tb = two_tables
    pa = spark.table(ta).inputFiles()[0].rsplit("/", 1)[0]
    pb = spark.table(tb).inputFiles()[0].rsplit("/", 1)[0]
    j = spark.read.parquet(pa).join(spark.read.parquet(pb), "k")
    assert "Exchange" in _plan(j)


def test_write_guards(spark, tmp_path):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        write_bucketed(df, "t_bad", "k", 0, path=str(tmp_path / "x"))
