"""CCNet-style perplexity filter (operators/lm_filter.py): hand-computed
tiny-LM logprobs, an exact DuckDB twin on a random corpus, bucket
assignment, and the broadcast-join plan pin."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import lm_filter as lmf


def _train(spark):
    return spark.createDataFrame(
        [(0, "a b a b"), (1, "a c")], "doc_id bigint, text string")


def test_tiny_lm_hand_values(spark):
    """Counts: a=3 b=2 c=1 (total 6); bigrams (a,b)=2 (b,a)=1 (a,c)=1."""
    bi, uni, oov = lmf.train_bigram_lm(_train(spark))
    b = {(r["w1"], r["w2"]): r["logp"] for r in bi.collect()}
    u = {r["w"]: r["logp"] for r in uni.collect()}
    assert abs(b[("a", "b")] - math.log10(2 / 3)) < 1e-12
    assert abs(b[("b", "a")] - math.log10(1 / 2)) < 1e-12
    assert abs(b[("a", "c")] - math.log10(1 / 3)) < 1e-12
    assert abs(u["a"] - math.log10(3 / 6)) < 1e-12
    assert abs(oov - (math.log10(1 / 6) - 1.0)) < 1e-12

    corpus = spark.createDataFrame(
        [(10, "a b a"),        # (a,b) + (b,a): both known bigrams
         (11, "a z"),          # unseen continuation → backoff to OOV
         (12, "c a"),          # unseen bigram, known unigram a → uni backoff
         (13, "a"),            # one word: nothing to score
         (14, None)],          # null text: nothing to score
        "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in
           lmf.doc_perplexity(corpus, (bi, uni, oov)).collect()}
    log_b = math.log10(0.4)
    exp10 = (math.log10(2 / 3) + math.log10(1 / 2)) / 2
    assert got[10]["n_scored"] == 2
    assert abs(got[10]["avg_log10p"] - exp10) < 1e-12
    assert abs(got[10]["perplexity"] - 10 ** (-exp10)) < 1e-9
    assert abs(got[11]["avg_log10p"] - (oov + log_b)) < 1e-12
    assert abs(got[12]["avg_log10p"]
               - (math.log10(3 / 6) + log_b)) < 1e-12
    assert got[13]["n_scored"] == 0 and got[13]["perplexity"] is None
    assert got[14]["n_scored"] == 0 and got[14]["perplexity"] is None
    # every input doc keeps a row
    assert set(got) == {10, 11, 12, 13, 14}


_TWIN = r"""
WITH tt AS (
  SELECT w FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
    FROM train_pdf WHERE text IS NOT NULL) WHERE w <> ''),
tot AS (SELECT count(*) AS c FROM tt),
uni AS (SELECT w, count(*) AS c1,
               log10(count(*)) - log10((SELECT c FROM tot)) AS lp
        FROM tt GROUP BY w),
tb AS (
  SELECT p['w1'] AS w1, p['w2'] AS w2 FROM (
    SELECT unnest([struct_pack(w1 := ws[i], w2 := ws[i+1])
                   for i in range(1, len(ws))]) AS p
    FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM train_pdf WHERE text IS NOT NULL) WHERE len(ws) >= 2)
  WHERE p['w1'] <> ''),
bi AS (SELECT w1, w2, log10(count(*)) - log10(any_value(u.c1)) AS lp
       FROM tb JOIN uni u ON tb.w1 = u.w
       GROUP BY w1, w2),
oov AS (SELECT log10((SELECT min(c1) FROM uni))
               - log10((SELECT c FROM tot)) - 1.0 AS lp),
cp AS (
  SELECT doc_id, p['w1'] AS w1, p['w2'] AS w2 FROM (
    SELECT doc_id, unnest([struct_pack(w1 := ws[i], w2 := ws[i+1])
                           for i in range(1, len(ws))]) AS p
    FROM (SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM score_pdf WHERE text IS NOT NULL) WHERE len(ws) >= 2)
  WHERE p['w1'] <> ''),
sc AS (
  SELECT cp.doc_id,
         coalesce(b.lp, u.lp + log10(0.4),
                  (SELECT lp FROM oov) + log10(0.4)) AS lp
  FROM cp
  LEFT JOIN bi b ON cp.w1 = b.w1 AND cp.w2 = b.w2
  LEFT JOIN uni u ON cp.w2 = u.w),
agg AS (SELECT doc_id, count(*) AS n_scored, avg(lp) AS avg_log10p
        FROM sc GROUP BY doc_id)
SELECT s.doc_id, coalesce(a.n_scored, 0) AS n_scored, a.avg_log10p,
       CASE WHEN a.avg_log10p IS NOT NULL
            THEN pow(10.0, -a.avg_log10p) END AS perplexity
FROM (SELECT DISTINCT doc_id FROM score_pdf) s
LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
"""


def test_duckdb_twin_on_random_corpus(spark):
    rng = np.random.default_rng(71)
    vocab = "the of and to in rain tree stone bird river cloud snow".split()

    def doc(k):
        return " ".join(rng.choice(vocab) for _ in range(k))

    train_rows = [(i, doc(30)) for i in range(20)]
    score_rows = [(i, doc(15)) for i in range(40)]
    score_rows += [(100, "zz qq unseen words entirely"), (101, "the")]
    train = spark.createDataFrame(train_rows, "doc_id bigint, text string")
    score = spark.createDataFrame(score_rows, "doc_id bigint, text string")

    lm = lmf.train_bigram_lm(train)
    got = sorted(lmf.doc_perplexity(score, lm).collect(),
                 key=lambda r: r["doc_id"])

    train_pdf = pd.DataFrame(train_rows, columns=["doc_id", "text"])  # noqa: F841
    score_pdf = pd.DataFrame(score_rows, columns=["doc_id", "text"])  # noqa: F841
    duck = duckdb.sql(_TWIN).fetchall()
    assert len(got) == len(duck)
    for g, d in zip(got, duck):
        assert g["doc_id"] == d[0] and g["n_scored"] == d[1]
        if d[2] is None:
            assert g["avg_log10p"] is None
        else:
            assert abs(g["avg_log10p"] - d[2]) < 1e-9
            assert abs(g["perplexity"] - d[3]) < 1e-6 * max(d[3], 1)


def test_buckets_and_filter(spark):
    """Three planted quality tiers: in-domain repeats (low ppl), mixed,
    out-of-vocab junk (high ppl) — buckets must order them, the filter
    must keep the clean tier, and null-ppl docs land in tail."""
    rng = np.random.default_rng(77)
    vocab = "alpha beta gamma delta epsilon zeta".split()
    train = spark.createDataFrame(
        [(i, " ".join(rng.choice(vocab) for _ in range(40)))
         for i in range(10)], "doc_id bigint, text string")
    lm = lmf.train_bigram_lm(train)

    rows = [(i, " ".join(rng.choice(vocab) for _ in range(20)))
            for i in range(12)]                       # in-domain
    rows += [(100 + i, " ".join(
        (rng.choice(vocab) if j % 2 else f"x{rng.integers(100)}")
        for j in range(20))) for i in range(12)]      # half OOV
    rows += [(200 + i, " ".join(f"junk{rng.integers(1000)}"
                                for _ in range(20)))
             for i in range(12)]                      # all OOV
    rows.append((300, "single"))                      # null ppl → tail
    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")

    scores = lmf.doc_perplexity(corpus, lm)
    bucketed, qs = lmf.perplexity_buckets(scores)
    assert len(qs) == 2 and qs[0] <= qs[1]
    by_bucket = {r["doc_id"]: r["bucket"] for r in bucketed.collect()}
    assert all(by_bucket[i] == "head" for i in range(12))
    assert all(by_bucket[200 + i] == "tail" for i in range(12))
    assert by_bucket[300] == "tail"

    kept = lmf.perplexity_filter(corpus, lm, max_perplexity=qs[0])
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert set(range(12)) <= kept_ids
    assert all(200 + i not in kept_ids for i in range(12))
    assert 300 not in kept_ids
    assert kept.columns == corpus.columns


def test_buckets_all_null_perplexity(spark):
    """A corpus with nothing scoreable (every doc < 2 words) buckets
    entirely as tail with empty thresholds — approxQuantile returns []
    here and indexing it crashed (review repro)."""
    lm = lmf.train_bigram_lm(_train(spark))
    corpus = spark.createDataFrame([(1, "one"), (2, None)],
                                   "doc_id bigint, text string")
    out, qs = lmf.perplexity_buckets(lmf.doc_perplexity(corpus, lm))
    assert qs == []
    assert {r["bucket"] for r in out.collect()} == {"tail"}


def test_min_count_prunes_and_plan_broadcasts(spark):
    train = _train(spark)
    bi, uni, _ = lmf.train_bigram_lm(train, min_count=2)
    assert {(r["w1"], r["w2"]) for r in bi.collect()} == {("a", "b")}
    assert {r["w"] for r in uni.collect()} == {"a", "b"}

    corpus = spark.createDataFrame([(1, "a b c d")],
                                   "doc_id bigint, text string")
    plan = lmf.doc_perplexity(corpus, lmf.train_bigram_lm(train)) \
        ._jdf.queryExecution().executedPlan().toString()
    # both LM lookups broadcast (corpus text never shuffles for them);
    # the one sort-merge join allowed is the final doc_id rejoin of the
    # aggregated scores — assert no wide join on the WORD keys
    assert plan.count("BroadcastHashJoin") >= 2
    for line in plan.split("\n"):
        if "SortMergeJoin" in line:
            assert "doc_id" in line, line
    assert "Cartesian" not in plan
