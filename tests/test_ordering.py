"""Deterministic corpus ordering (operators/ordering.py): permutation
property, cross-run/seed determinism, exact DuckDB twins, curriculum
bucket monotonicity, round-robin interleave, and the no-global-window
plan pin (the whole point of the static-cell machinery)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.ordering import (
    curriculum_order, deterministic_shuffle, interleave_sources)

_KEY = "CAST(('0x' || substr(md5({e}),1,15)) AS UBIGINT)"


def _docs(spark, n=500, strata=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % strata)).alias("source"),
        ((F.col("id") % 100) / 100.0).alias("score"))


def _perm_ok(rows, col):
    pos = sorted(r[col] for r in rows)
    return pos == list(range(len(rows)))


def test_shuffle_is_permutation_and_deterministic(spark):
    d = _docs(spark, 500)
    a = deterministic_shuffle(d, seed=5).collect()
    assert _perm_ok(a, "shuffle_pos")
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in deterministic_shuffle(d, seed=5).collect()}
    assert all(b[r["doc_id"]] == r["shuffle_pos"] for r in a)
    # and insensitive to n_cells (cells are an implementation detail)
    c = {r["doc_id"]: r["shuffle_pos"]
         for r in deterministic_shuffle(d, seed=5, n_cells=7).collect()}
    assert b == c


def test_shuffle_seeds_independent(spark):
    d = _docs(spark, 300)
    a = {r["doc_id"]: r["shuffle_pos"]
         for r in deterministic_shuffle(d, seed=1).collect()}
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in deterministic_shuffle(d, seed=2).collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 250                       # essentially a fresh draw


def test_shuffle_twin_matches_duckdb(spark):
    rows = [(i,) for i in range(400)]
    pdf = pd.DataFrame(rows, columns=["doc_id"])  # noqa: F841
    sdf = spark.createDataFrame(rows, "doc_id bigint")
    got = {r["doc_id"]: r["shuffle_pos"]
           for r in deterministic_shuffle(sdf, seed=7).collect()}
    key = _KEY.format(
        e="coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'NULL')"
          " || chr(31) || '7'")
    duck = duckdb.sql(f"""
        SELECT doc_id,
               row_number() OVER (ORDER BY {key}, doc_id) - 1 AS pos
        FROM pdf""").df()
    want = dict(zip(duck["doc_id"], duck["pos"]))
    assert got == want


def test_curriculum_buckets_monotone_and_shuffled(spark):
    d = _docs(spark, 400)
    out = curriculum_order(d, "score", n_buckets=5, seed=3) \
        .orderBy("curriculum_pos").collect()
    assert _perm_ok(out, "curriculum_pos")
    buckets = [min(4, int(r["score"] * 5)) for r in out]
    assert buckets == sorted(buckets)        # easy→hard, never backwards
    # within the first bucket the doc_ids are NOT sorted (shuffled)
    first = [r["doc_id"] for r in out if min(4, int(r["score"] * 5)) == 0]
    assert first != sorted(first)
    # descending flips the schedule
    desc = curriculum_order(d, "score", n_buckets=5, seed=3,
                            ascending=False) \
        .orderBy("curriculum_pos").collect()
    db = [min(4, int(r["score"] * 5)) for r in desc]
    assert db == sorted(db, reverse=True)


def test_curriculum_null_scores_last(spark):
    d = _docs(spark, 100).withColumn(
        "score", F.when(F.col("doc_id") < 10, F.lit(None))
        .otherwise(F.col("score")))
    out = curriculum_order(d, "score", n_buckets=4, seed=1) \
        .orderBy("curriculum_pos").collect()
    null_pos = [r["curriculum_pos"] for r in out if r["score"] is None]
    # nulls share the last bucket with real top-bucket scores; every
    # null sits after every row of buckets 0..n-2
    max_nonlast = max(r["curriculum_pos"] for r in out
                      if r["score"] is not None
                      and min(3, int(r["score"] * 4)) < 3)
    assert min(null_pos) > max_nonlast


def test_interleave_round_robin(spark):
    # equal strata: every consecutive K-block holds one of each source
    d = _docs(spark, 400, strata=4)
    out = interleave_sources(d, seed=11).orderBy("interleave_pos") \
        .collect()
    assert _perm_ok(out, "interleave_pos")
    for i in range(0, 400, 4):
        block = {r["source"] for r in out[i:i + 4]}
        assert block == {"s0", "s1", "s2", "s3"}
    # per-stratum relative order is itself a seeded shuffle: same docs,
    # same positions on a re-run
    again = {r["doc_id"]: r["interleave_pos"]
             for r in interleave_sources(d, seed=11).collect()}
    assert all(again[r["doc_id"]] == r["interleave_pos"] for r in out)


def test_interleave_uneven_strata_and_nulls(spark):
    rows = [(i, "a" if i < 60 else ("b" if i < 90 else None))
            for i in range(100)]
    sdf = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = interleave_sources(sdf, seed=2).orderBy("interleave_pos") \
        .collect()
    assert _perm_ok(out, "interleave_pos")
    # first 3*30 positions: all three strata alive → 10 of each per 30;
    # after b and null (30 each) run dry, the tail is pure 'a'
    tail = [r["source"] for r in out[90:]]
    assert tail == ["a"] * 10


def test_interleave_twin_matches_duckdb(spark):
    rows = [(i, f"s{i % 3}") for i in range(300)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "source"])  # noqa: F841
    sdf = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = {r["doc_id"]: r["interleave_pos"]
           for r in interleave_sources(sdf, seed=4).collect()}
    key = _KEY.format(
        e="coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'NULL')"
          " || chr(31) || '4'")
    duck = duckdb.sql(f"""
        WITH p AS (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY coalesce(CAST(source AS VARCHAR),
                                         chr(0) || 'NULL')
                   ORDER BY {key}, doc_id) - 1 AS p
          FROM pdf)
        SELECT doc_id,
               row_number() OVER (
                 ORDER BY p, coalesce(CAST(source AS VARCHAR),
                                      chr(0) || 'NULL')) - 1 AS pos
        FROM p""").df()
    want = dict(zip(duck["doc_id"], duck["pos"]))
    assert got == want


def test_no_global_window_in_plan(spark):
    """The point of the static-cell machinery: the executed plan must
    not contain an unpartitioned window (all-rows-to-one-task)."""
    d = _docs(spark, 200)
    for out in (deterministic_shuffle(d, seed=1),
                curriculum_order(d, "score", seed=1)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan
        # Spark prints an unpartitioned window spec as an empty
        # partition list: "windowspecdefinition(<order>, ...)" with no
        # partition exprs before the first order expr; the partitioned
        # form lists the partition columns first.  Cheap pin: our cell
        # column name must appear in the window operator line.
        wline = [ln for ln in plan.split("\n") if "Window" in ln][0]
        assert "__cell" in wline
