"""Leakage-safe holdout splitting (operators/splits.py): key cohesion,
determinism/stability under growth, realized fraction, null keys, the
exact DuckDB twin of the portable path, and the Exchange-free plan pin."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.splits import holdout_split


def _df(spark, n=2000, keys=50):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("site"), (F.col("id") % keys)).alias("host"))


def test_key_cohesion_and_fraction(spark):
    d = holdout_split(_df(spark), 0.3, key_col="host", seed=3)
    per_key = d.groupBy("host").agg(
        F.countDistinct("split").alias("n_sides")).collect()
    assert all(r["n_sides"] == 1 for r in per_key)      # never straddles
    frac = d.filter(F.col("split") == "heldout").count() / d.count()
    assert 0.1 < frac < 0.5                              # 50 keys, p=.3


def test_stability_under_growth(spark):
    """Adding rows must not flip any existing row's side (seeded
    sample() has no such property)."""
    base = _df(spark, n=500)
    grown = _df(spark, n=2000)
    a = {r["doc_id"]: r["split"]
         for r in holdout_split(base, 0.25, "host", seed=9).collect()}
    b = {r["doc_id"]: r["split"]
         for r in holdout_split(grown, 0.25, "host", seed=9).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_seeds_give_independent_splits(spark):
    d = _df(spark)
    a = holdout_split(d, 0.5, "host", seed=1)
    b = holdout_split(d, 0.5, "host", seed=2)
    both = a.select("doc_id", "split").join(
        b.select("doc_id", F.col("split").alias("s2")), "doc_id")
    agree = both.filter(F.col("split") == F.col("s2")).count() / both.count()
    assert 0.2 < agree < 0.8                             # not the same split


def test_null_keys_one_side(spark):
    d = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id bigint, host string")
    out = holdout_split(d, 0.5, "host", seed=4).collect()
    sides = {r["doc_id"]: r["split"] for r in out}
    assert sides[1] == sides[2]                          # nulls cohere


def test_frac_bounds_validated(spark):
    with pytest.raises(ValueError):
        holdout_split(_df(spark, 10), 1.5, "host")
    d = holdout_split(_df(spark, 100), 0.0, "host")
    assert d.filter(F.col("split") == "heldout").count() == 0


def test_portable_twin_matches_duckdb(spark):
    rows = [(i, f"d{i % 37}" if i % 11 else None) for i in range(400)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "host"])  # noqa: F841
    sdf = spark.createDataFrame(rows, "doc_id bigint, host string")
    got = {r["doc_id"]: r["split"]
           for r in holdout_split(sdf, 0.2, "host", seed=7,
                                  portable=True).collect()}
    key = ("coalesce(CAST(host AS VARCHAR), chr(0) || 'NULL') || "
           "chr(31) || '7'")
    duck = duckdb.sql(f"""
        SELECT doc_id,
               CASE WHEN CAST(('0x' || substr(md5({key}),1,15)) AS UBIGINT)
                         % 1000000 < 200000
                    THEN 'heldout' ELSE 'train' END AS split
        FROM pdf""").df()
    want = dict(zip(duck["doc_id"], duck["split"]))
    assert got == want
    assert "heldout" in set(got.values()) and "train" in set(got.values())


def test_plan_is_exchange_free(spark):
    from llmxmapreduce_spark import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = holdout_split(docs, 0.2, "source") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kway_split_properties(spark):
    """K-way keyed split (splits.kway_split): partition of the corpus,
    key cohesion, growth stability, fraction convergence, dict-order
    independence, and guards."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from llmxmapreduce_spark.operators.splits import kway_split

    df = spark.range(20_000).select(
        (F.col("id") % 5_000).alias("key"), F.col("id").alias("row_id"))
    fracs = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = kway_split(df, fracs, key_col="key")
    # every row assigned exactly one split; all rows of a key agree
    per_key = out.groupBy("key").agg(
        F.countDistinct("split").alias("n")).collect()
    assert all(r.n == 1 for r in per_key)
    counts = {r.split: r.c for r in out.groupBy("split")
              .agg(F.count(F.lit(1)).alias("c")).collect()}
    n = sum(counts.values())
    assert n == 20_000
    assert abs(counts["train"] / n - 0.8) < 0.03
    assert abs(counts.get("val", 0) / n - 0.1) < 0.03
    # dict-order independence (sorted-name cuts)
    out2 = kway_split(df, {"test": 0.1, "train": 0.8, "val": 0.1},
                      key_col="key")
    assert {tuple(r) for r in out.collect()} == \
        {tuple(r) for r in out2.collect()}
    # growth stability: adding rows never flips existing keys
    grown = kway_split(df.unionByName(
        spark.range(5).select((F.col("id") + 90_000).alias("key"),
                              F.col("id").alias("row_id"))),
        fracs, key_col="key")
    base = {(r.key, r.row_id): r.split for r in out.collect()}
    after = {(r.key, r.row_id): r.split for r in grown.collect()
             if (r.key, r.row_id) in base}
    assert base == after
    with _pytest.raises(ValueError, match="sum to 1.0"):
        kway_split(df, {"a": 0.5, "b": 0.4}, key_col="key")
    with _pytest.raises(ValueError, match="non-empty"):
        kway_split(df, {}, key_col="key")


def test_kway_split_matches_duckdb(spark):
    import duckdb
    from pyspark.sql import functions as F  # noqa: F401

    from llmxmapreduce_spark import load_table
    from llmxmapreduce_spark.operators.splits import (kway_split,
                                                      kway_split_sql)

    sfd = "/root/testdata/sf0.001"
    d = load_table(spark, sfd, "documents").select("doc_id", "source")
    fracs = {"train": 0.7, "val": 0.15, "test": 0.15}
    got = {(r.doc_id, r.split) for r in
           kway_split(d, fracs, portable=True)
           .select("doc_id", "split").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sfd}/documents.parquet'")
    want = set(con.execute(kway_split_sql(
        "documents", fracs, cols="doc_id")).fetchall())
    assert got == want and len(got) > 400
