"""Triangle counting + clustering coefficients — the third graph
operator next to ``components.py`` (who is connected) and
``pagerank.py`` (who matters): HOW CLUSTERED is the neighborhood.

Curation use: in a near-dup pair graph, a key whose neighborhood is
triangle-dense is a coherent duplicate CLUSTER (template pages, mirror
sites), while a high-degree key with near-zero clustering is a hub
artifact (a boilerplate line shared by unrelated docs — usually a
feature-extraction bug, not real duplication).  The local clustering
coefficient separates the two before canonicalization collapses either.

Algorithm (Spark-first, the standard degree-ordered orientation —
Suri & Vassilvitskii WWW'11 "Counting triangles and the curse of the
last reducer"): orient every undirected edge from the LOWER
(degree, id) endpoint to the higher.  Each triangle {a,b,c} then has
exactly ONE wedge a→b, a→c at its minimum vertex, so joining oriented
edges on the wedge apex and probing the third side counts each triangle
exactly once — and because orientation caps out-degree at O(√m) on any
graph (a vertex of degree d keeps only neighbors of degree ≥ d), the
wedge explosion that kills the naive formulation at hub vertices is
bounded.  Shuffles: one degree agg, one wedge self-join on the apex,
one edge-probe join.  Everything is an equi-join — no cartesian.

Inputs are undirected edges (src, dst); self-loops are dropped and
duplicate/reversed edges collapse to one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_edges", "triangle_count", "clustering_coefficient"]


def canonical_edges(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Undirected edge set hygiene: drop self-loops and nulls, collapse
    (a,b)/(b,a)/duplicates to one (lo, hi) row."""
    e = edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull()
                     & (F.col(src) != F.col(dst)))
    return e.select(
        F.least(src, dst).alias("lo"),
        F.greatest(src, dst).alias("hi")).distinct()


def _degrees(ce: DataFrame) -> DataFrame:
    """(n, deg) over a CANONICAL edge set."""
    return (ce.select(F.col("lo").alias("n"))
            .unionByName(ce.select(F.col("hi").alias("n")))
            .groupBy("n").agg(F.count(F.lit(1)).alias("deg")))


def _triangles_from_canonical(ce: DataFrame,
                              deg: DataFrame) -> DataFrame:
    """Per-vertex triangle counts from a canonical edge set + its
    degree table (shared internals so triangle_count and
    clustering_coefficient each canonicalize and count degrees exactly
    ONCE — r10 review: the public wrappers used to re-canonicalize and
    re-aggregate, roughly doubling the shuffle bill)."""
    e = (ce.join(deg.withColumnRenamed("n", "lo")
                 .withColumnRenamed("deg", "dlo"), "lo")
         .join(deg.withColumnRenamed("n", "hi")
               .withColumnRenamed("deg", "dhi"), "hi"))
    fwd = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi")))
    o = e.select(
        F.when(fwd, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(fwd, F.col("hi")).otherwise(F.col("lo")).alias("v"))
    a, b = o.alias("a"), o.alias("b")
    wedges = (a.join(b, (F.col("a.u") == F.col("b.u"))
                     & (F.col("a.v") < F.col("b.v")))
              .select(F.col("a.u").alias("apex"),
                      F.col("a.v").alias("x"),
                      F.col("b.v").alias("y")))
    # the closing edge may be oriented either way — probe canonically;
    # oriented rows are already unique edges, so a least/greatest
    # projection suffices (no distinct)
    closing = o.select(F.least("u", "v").alias("x"),
                       F.greatest("u", "v").alias("y"))
    tris = wedges.join(closing, ["x", "y"])
    return (tris.select(F.col("apex").alias("n"))
            .unionByName(tris.select(F.col("x").alias("n")))
            .unionByName(tris.select(F.col("y").alias("n")))
            .groupBy("n").agg(F.count(F.lit(1)).alias("n_triangles")))


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """→ one row per vertex ``(n, n_triangles)`` for every vertex in at
    least one triangle (vertices in none are absent — left-join and
    coalesce 0 downstream if a dense surface is wanted)."""
    ce = canonical_edges(edges, src, dst)
    return _triangles_from_canonical(ce, _degrees(ce))


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """→ ``(n, deg, n_triangles, coeff)`` per vertex with degree ≥ 2:
    coeff = 2·triangles / (deg·(deg−1)) — the hub-vs-cluster separator
    from the module docstring.  Vertices with no triangles get 0.0."""
    ce = canonical_edges(edges, src, dst)
    deg = _degrees(ce)
    t = _triangles_from_canonical(ce, deg)
    return (deg.filter(F.col("deg") >= 2)
            .join(t, "n", "left")
            .select("n", "deg",
                    F.coalesce("n_triangles", F.lit(0))
                    .alias("n_triangles"),
                    (F.coalesce("n_triangles", F.lit(0)) * 2.0
                     / (F.col("deg") * (F.col("deg") - 1)))
                    .alias("coeff")))
