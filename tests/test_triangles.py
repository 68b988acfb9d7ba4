"""Triangle counting (operators/triangles.py): brute-force ground truth
on fixed + random graphs, per-vertex counts, clustering coefficients,
edge hygiene (self-loops / reversed dups), partitioning invariance, and
the no-cartesian plan guard."""

import random
from itertools import combinations

from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.triangles import (canonical_edges,
                                                     clustering_coefficient,
                                                     triangle_count)


def _brute_triangles(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    per = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if ((a, b) in es and (a, c) in es and (b, c) in es):
            per[a] += 1
            per[b] += 1
            per[c] += 1
    return {n: c for n, c in per.items() if c}


def test_fixed_graph(spark):
    # K4 on 1-4 (every vertex in 3 triangles) + a pendant + a square
    # (no triangles) + self-loop and reversed-dup noise
    edges = ([(a, b) for a, b in combinations([1, 2, 3, 4], 2)]
             + [(4, 5), (6, 7), (7, 8), (8, 9), (9, 6),
                (2, 1), (3, 3)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.n: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_matches_bruteforce_random(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(40), rng.randrange(40))
                  for _ in range(260)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.n: r.n_triangles for r in triangle_count(df).collect()}
    assert got == _brute_triangles(edges)
    # partitioning invariance
    got2 = {r.n: r.n_triangles
            for r in triangle_count(df.repartition(13)).collect()}
    assert got2 == got


def test_clustering_coefficient(spark):
    # triangle 1-2-3 plus hub 1 connected to 4,5 (no closure):
    # deg(1)=4, tri(1)=1 -> coeff 2*1/(4*3) = 1/6; deg(2)=2 tri 1 -> 1.0
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (1, 5)], "src long, dst long")
    got = {r.n: (r.deg, r.n_triangles, round(r.coeff, 6))
           for r in clustering_coefficient(df).collect()}
    assert got[1] == (4, 1, round(1 / 6, 6))
    assert got[2] == (2, 1, 1.0) and got[3] == (2, 1, 1.0)
    assert 4 not in got and 5 not in got      # degree 1 excluded


def test_canonical_edges_hygiene(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (None, 3), (2, 3)],
        "src long, dst long")
    assert {tuple(r) for r in canonical_edges(df).collect()} == {
        (1, 2), (2, 3)}


def test_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = triangle_count(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
