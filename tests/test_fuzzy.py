"""Fuzzy matching: deletion-neighborhood completeness vs the naive
all-pairs twin (python + DuckDB), key generation, and the dedup hop."""

import itertools

import duckdb
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.fuzzy import (deletion_keys,
                                                 fuzzy_dedup_names,
                                                 fuzzy_pairs)

PART = "/root/testdata/sf0.001/part.parquet"


def _lev(a, b):
    # classic DP
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def test_deletion_keys(spark):
    df = spark.createDataFrame([("abc",), ("",)], "s string")
    rows = df.select(F.col("s"),
                     deletion_keys(F.col("s"), 2).alias("k")).collect()
    by = {r.s: sorted(r.k) for r in rows}
    assert by["abc"] == sorted({"abc", "ab", "ac", "bc",
                                "a", "b", "c"})
    assert by[""] == [""]


def test_pairs_match_bruteforce(spark):
    names = ["green bolt", "green bolts", "greep bolt", "red rod",
             "red rods", "blue widget", "green  bolt", "red род"]
    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, s string").repartition(3)
    for d in (1, 2):
        got = sorted((r.id_a, r.id_b, r.dist) for r in
                     fuzzy_pairs(df, "s", "id", max_dist=d).collect())
        want = sorted((i, j, _lev(a, b))
                      for (i, a), (j, b) in
                      itertools.combinations(rows, 2)
                      if _lev(a, b) <= d)
        assert got == want, f"d={d}"
    assert len(got) >= 3


def test_pairs_match_duckdb_on_parts(spark):
    df = spark.read.parquet(PART).select("p_partkey", "p_name")
    got = sorted((r.id_a, r.id_b, r.dist) for r in
                 fuzzy_pairs(df, "p_name", "p_partkey",
                             max_dist=2).collect())
    want = sorted(duckdb.sql(f"""
        WITH t AS (SELECT p_partkey, p_name FROM '{PART}')
        SELECT a.p_partkey, b.p_partkey,
               levenshtein(a.p_name, b.p_name) AS d
        FROM t a JOIN t b ON a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    """).fetchall())
    assert got == want
    assert len(got) > 10


def test_dedup_one_hop(spark):
    df = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corp."), (3, "other co")],
        "id long, name string")
    out = {r.id: r.name for r in
           fuzzy_dedup_names(df, "name", "id", max_dist=1).collect()}
    assert out == {1: "acme corp", 2: "acme corp", 3: "other co"}
