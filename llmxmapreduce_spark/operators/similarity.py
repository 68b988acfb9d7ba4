"""Embedding similarity search (scale extension, SURVEY.md §7 step 9).

- ``cosine_topk``          — brute-force exact top-k: broadcast the (small)
  query set, one linear scan over the corpus, per-partition top-k via window.
  The dot product is computed over *quantized* integer embeddings (element ×
  1e6 → BIGINT) so it is exact, order-independent, and bit-identical in any
  engine — the correctness oracle depends on this.
- ``cosine_topk_double``   — same plan with plain double math (production).
- ``lsh_bucket_topk``      — scale path: random-hyperplane LSH bucketing;
  only vectors sharing a bucket are compared.  Planes are derived from
  xxhash64 so the whole thing stays deterministic with a seed.

100 TB framing: the corpus side is never collected or crossed with itself;
queries are broadcast; candidate generation is an equi-join on bucket id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000


def quantize(vec: Column) -> Column:
    """array<float> → array<bigint>, element*1e6 rounded — exact integer
    arithmetic domain for cross-engine reproducibility.  The float→double
    cast happens BEFORE the multiply so every engine computes the same
    double product."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * F.lit(float(SCALE)), 0).cast("long")
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (qid, vec_id, rank, cosine).  Self-matches (qid == vec_id)
    are excluded.  cosine = dot/(sqrt(n2a)*sqrt(n2b)) on quantized ints →
    the double result is bit-identical across engines.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), quantize(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm2(F.col("qv")))
    c = corpus.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm2(F.col("cv")))
    joined = c.crossJoin(F.broadcast(q)).filter(F.col(query_id_col) != F.col(id_col))
    cosine = (
        _dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("cosine", cosine)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cosine")
    )


def cosine_topk_double(corpus: DataFrame, queries: DataFrame, k: int = 5,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       query_id_col: str = "qid") -> DataFrame:
    """Production variant: double math end to end (no quantization).

    The ``crossJoin`` here is the BROADCAST-side exact scorer: every corpus
    partition scores the broadcast query set, so cost is
    ``|corpus| × |queries|`` dot products with no shuffle.  Intended bound:
    a query side small enough to broadcast (≲10 MB / low thousands of
    vectors — spark.sql.autoBroadcastJoinThreshold territory).  For
    corpus-vs-corpus or large query sets use :func:`lsh_bucket_topk` /
    :func:`lsh_bucket_topk_large` (LSH-bucketed equi-join, no cartesian)."""
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("cv"))
    joined = c.crossJoin(F.broadcast(q)).filter(F.col(query_id_col) != F.col(id_col))
    return _bucket_rank_topk(joined, k, id_col, query_id_col)


def cosine_topk_np(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "qid") -> DataFrame:
    """Arrow/numpy production scorer: same result as
    :func:`cosine_topk_double`, ~10-100× the throughput.

    The Catalyst higher-order-function dot (``aggregate(zip_with(...))``)
    is evaluated interpreted, per element — at sf5 (100k × 64d corpus,
    20 queries) it costs ~31 s.  This variant does one BLAS matmul per
    Arrow batch instead:

    - the query side (the *bounded broadcast side* by the same contract as
      ``cosine_topk_double`` — ≲ low thousands of vectors) is collected
      once and shipped in the task closure as a normalized d × n_q matrix;
    - each corpus batch computes a (batch × n_q) score matrix and keeps its
      LOCAL top-k per query via ``argpartition`` — the shuffle then carries
      only n_batches × n_q × k candidate rows, not |corpus| × n_q scores;
    - a final window over the tiny candidate set yields global ranks.

    For corpus-vs-corpus or unbounded query sets use the LSH-bucketed
    variants (no cartesian work at any scale)."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qids = np.array([r[0] for r in qrows])
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    qn[qn == 0] = 1.0
    Qt = (Q / qn[:, None]).T  # d × n_q, normalized

    qid_t = dict(queries.dtypes)[id_col]
    id_t = dict(corpus.dtypes)[id_col]
    schema = f"{query_id_col} {qid_t}, {id_col} {id_t}, cosine double"

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cn = np.sqrt((C * C).sum(axis=1))
            cn[cn == 0] = 1.0
            S = (C / cn[:, None]) @ Qt  # batch × n_q
            ids = pdf[id_col].to_numpy()
            m = min(k + 1, S.shape[0])  # k+1: the self-match may be local
            top = np.argpartition(-S, m - 1, axis=0)[:m]
            out_q, out_i, out_s = [], [], []
            for j in range(S.shape[1]):
                for i in top[:, j]:
                    if ids[i] != qids[j]:
                        out_q.append(qids[j])
                        out_i.append(ids[i])
                        out_s.append(S[i, j])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_i, "cosine": out_s}
            )

    cand = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(score, schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cosine")
    )


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Engine-portable coarse LSH bucket: the sign bits of the first
    ``bits`` elements (of the QUANTIZED vector, so Spark and any oracle
    engine bucket identically).  Near-identical vectors agree on element
    signs except components near zero — the documented recall contract of
    :func:`cosine_neardup_pairs`."""
    return F.concat(*[
        F.when(F.get(vec, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ])


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    sign_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_mode: str = "hyperplane",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup flavor of the
    similarity stack): candidates = self equi-join on an LSH bucket,
    verify = exact quantized cosine ≥ threshold.  → (id_a, id_b, cosine),
    id_a < id_b.

    ``bucket_mode`` picks the candidate-generation bucket — the exact same
    portable/fast split as dedup.py's md5/xxhash64 minhash twins:

    - ``"hyperplane"`` (production default): random-hyperplane signatures
      (:func:`hyperplane_signs`, shared with both ANN paths).  Each plane
      mixes ALL dimensions with pseudo-random weights, so bucket occupancy
      stays ~n/2^bits even when the embedding distribution concentrates
      variance in a few leading dimensions (real embeddings do — PCA-like
      spectra), where raw sign bits would collapse into a handful of
      mega-buckets and blow up the per-bucket |a|×|b| verify cost.
    - ``"signbits"`` (oracle twin): sign bits of the first ``sign_bits``
      quantized elements — trivially portable to any SQL engine, used by
      the DuckDB correctness oracle.  Same verify math, same output
      contract; only candidate recall/skew differs.

    100 TB framing: the corpus is never self-crossed — the only join is an
    equi-join on a ``sign_bits``-char key (bucket population ~ n/2^bits
    under the hyperplane default; residual skew is AQE skew-join
    territory).  Verification runs per colliding pair on the quantized
    integers, so the result is bit-identical in any engine."""
    base = df.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("v"),
        F.col(vec_col).cast("array<double>").alias("_dv"),
    )
    if bucket_mode == "hyperplane":
        bucket = hyperplane_signs(F.col("_dv"), n_planes=sign_bits, seed=seed)
    elif bucket_mode == "signbits":
        bucket = sign_bucket(F.col("v"), sign_bits)
    else:
        raise ValueError(f"unknown bucket_mode: {bucket_mode!r}")
    base = base.withColumn("bucket", bucket) \
        .withColumn("n2", _norm2(F.col("v"))).drop("_dv")
    a = base.select(F.col(id_col).alias("id_a"), F.col("bucket"),
                    F.col("v").alias("va"), F.col("n2").alias("na"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("bucket"),
                    F.col("v").alias("vb"), F.col("n2").alias("nb"))
    cosine = (
        _dot(F.col("va"), F.col("vb"))
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_signs(vec: Column, n_planes: int = 8, seed: int = 42,
                     dim: int = 64) -> Column:
    """Random-hyperplane LSH signature as a bit-string column.

    Plane p's component d is a deterministic pseudo-random ±weight derived
    from xxhash64(seed, p, d) — no stored plane matrix, reproducible on any
    cluster.  sign_p = sign(sum_d vec[d] * w[p][d])."""
    def plane_dot(p: int) -> Column:
        # pmod, not % — Spark's % keeps the dividend's sign, which would
        # skew every weight negative and collapse all signatures to 0…0.
        prods = F.transform(
            vec,
            lambda x, i: x * (
                (F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2001)) - 1000)
                .cast("double") / 1000.0
            ),
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    return F.concat(*[
        F.when(plane_dot(p) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(n_planes)
    ])


def _bucket_rank_topk(joined: DataFrame, k: int, id_col: str,
                      query_id_col: str) -> DataFrame:
    cosine = _ddot(F.col("qv"), F.col("cv")) / (
        F.sqrt(_ddot(F.col("qv"), F.col("qv")))
        * F.sqrt(_ddot(F.col("cv"), F.col("cv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(),
                                                 F.col(id_col).asc())
    return (
        joined.withColumn("cosine", cosine)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cosine")
    )


def _ddot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def probe_buckets(vec: Column, n_planes: int = 8, seed: int = 42,
                  multi_probe: int = 0) -> Column:
    """Bucket signature plus its Hamming-1 neighbors for the first
    ``multi_probe`` planes — a query lying near plane i's boundary is
    recovered by also probing the bucket with bit i flipped (classic
    multi-probe LSH).  Returns an array of 1 + multi_probe bucket keys."""
    base = hyperplane_signs(vec, n_planes, seed)
    probes = [base]
    for i in range(min(multi_probe, n_planes)):
        flipped = F.when(F.substring(base, i + 1, 1) == "1", F.lit("0")) \
            .otherwise(F.lit("1"))
        probes.append(F.concat(
            F.substring(base, 1, i), flipped,
            F.substring(base, i + 2, n_planes - i - 1),
        ))
    return F.array(*probes)


def lsh_bucket_topk_large(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    multi_probe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Corpus-vs-corpus ANN: BOTH sides large, so no broadcast hint — a
    plain shuffled equi-join on the bucket key (Catalyst/AQE picks
    sort-merge, shuffled-hash, or broadcast from actual sizes; the plan can
    never contain a BroadcastNestedLoopJoin or CartesianProduct because the
    join is an equi-join).  ``multi_probe`` explodes each query to its
    Hamming-1 probe buckets for recall; duplicate (query, candidate) pairs
    from overlapping probes are dropped before ranking.

    100 TB framing: shuffle volume = rows × (1 + multi_probe), partitioned
    by bucket key; per-bucket work is |bucket_q| × |bucket_c|, tuned by
    ``n_planes``.  Skewed buckets (dense embedding regions) are handled by
    AQE skew-join like any other shuffled join."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("bucket", hyperplane_signs(F.col("cv"), n_planes, seed))
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn(
        "bucket",
        F.explode(probe_buckets(F.col("qv"), n_planes, seed, multi_probe)),
    )
    joined = c.join(q, "bucket").filter(
        F.col(query_id_col) != F.col(id_col)
    ).dropDuplicates([query_id_col, id_col])
    return _bucket_rank_topk(joined, k, id_col, query_id_col)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Approximate top-k for a SMALL query side: compare only vectors whose
    hyperplane signature matches the query's, with the queries broadcast.
    Equi-join on the bucket string — shuffle on an 8-char key instead of a
    cartesian product.  Recall is tuned by ``n_planes`` (fewer planes →
    bigger buckets → higher recall/cost).  For large query sides (corpus vs
    corpus) use :func:`lsh_bucket_topk_large`."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("bucket", hyperplane_signs(F.col("cv"), n_planes, seed))
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", hyperplane_signs(F.col("qv"), n_planes, seed))
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    return _bucket_rank_topk(joined, k, id_col, query_id_col)
