"""GPT-3 quality classifier (operators/quality_classifier.py): planted
domain separation, exact DuckDB twin of the scoring pass, the Pareto
keep-rule's determinism + admission profile, and plan checks."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import quality_classifier as qc

B = 64

GOOD = "sun rain tree rock bird fish wind snow".split()
JUNK = "zorp blick frub snagg wump dret krol plib".split()


def _doc(rng, vocab, k=25):
    return " ".join(rng.choice(vocab) for _ in range(k))


@pytest.fixture(scope="module")
def fitted(spark):
    rng = np.random.default_rng(89)
    pos = spark.createDataFrame(
        [(i, _doc(rng, GOOD)) for i in range(25)],
        "doc_id bigint, text string")
    neg = spark.createDataFrame(
        [(i, _doc(rng, JUNK)) for i in range(25)],
        "doc_id bigint, text string")
    w = qc.train_quality_classifier(pos, neg, n_buckets=B, portable=True)
    return w, rng


def test_separates_planted_domains(spark, fitted):
    (w, b), rng = fitted
    assert len(w) == B
    mixed = spark.createDataFrame(
        [(i, _doc(rng, GOOD)) for i in range(10)]
        + [(100 + i, _doc(rng, JUNK)) for i in range(10)]
        + [(200, None)],
        "doc_id bigint, text string")
    s = {r["doc_id"]: r["score"] for r in
         qc.classifier_scores(mixed, (w, b), portable=True).collect()}
    assert min(s[i] for i in range(10)) > 0.9
    assert max(s[100 + i] for i in range(10)) < 0.1
    assert 0.0 < s[200] < 1.0        # bias-only score for empty evidence


_TWIN = r"""
WITH db AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(g),1,15)) AS UBIGINT) % {B} AS bucket,
         count(*) AS c
  FROM (SELECT doc_id, unnest(list_concat(
            [w for w in string_split_regex(trim(lower(text)), '\s+')
             if w <> ''],
            [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])) AS g
        FROM (SELECT doc_id, text,
                     string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM score_pdf WHERE text IS NOT NULL))
  GROUP BY doc_id, bucket),
agg AS (
  SELECT db.doc_id, sum(db.c) AS n_grams,
         sum(db.c * coalesce(wt.w, 0.0)) AS dot
  FROM db LEFT JOIN weights_pdf wt ON db.bucket = wt.bucket
  GROUP BY db.doc_id)
SELECT s.doc_id, coalesce(a.n_grams, 0) AS n_grams,
       1.0 / (1.0 + exp(-(coalesce(a.dot / a.n_grams, 0.0) + {BIAS})))
       AS score
FROM (SELECT DISTINCT doc_id FROM score_pdf) s
LEFT JOIN agg a USING (doc_id) ORDER BY s.doc_id
"""


def test_duckdb_twin_of_scoring(spark, fitted):
    (w, b), rng = fitted
    score_rows = [(i, _doc(rng, GOOD if i % 2 else JUNK)) for i in range(30)]
    score_rows.append((99, None))
    score = spark.createDataFrame(score_rows, "doc_id bigint, text string")
    got = sorted(qc.classifier_scores(score, (w, b), portable=True).collect(),
                 key=lambda r: r["doc_id"])
    score_pdf = pd.DataFrame(score_rows, columns=["doc_id", "text"])  # noqa: F841
    weights_pdf = pd.DataFrame(                                       # noqa: F841
        [(i, float(x)) for i, x in enumerate(w) if x != 0.0],
        columns=["bucket", "w"])
    duck = duckdb.sql(_TWIN.format(B=B, BIAS=repr(b))).fetchall()
    assert len(got) == len(duck)
    for g, d in zip(got, duck):
        assert g["doc_id"] == d[0] and g["n_grams"] == d[1]
        assert abs(g["score"] - d[2]) < 1e-9


def test_pareto_rule_profile_and_determinism(spark):
    """High scores are almost always kept, low scores rarely but not
    never (the heavy tail is the point of GPT-3's rule); the draw is
    deterministic per (id, seed)."""
    n = 4000
    rows = [(i, 0.95) for i in range(n)] + [(n + i, 0.05) for i in range(n)]
    scores = spark.createDataFrame(rows, "doc_id bigint, score double")
    kept = {r["doc_id"] for r in qc.pareto_filter(scores, seed=3).collect()}
    hi = len([i for i in kept if i < n]) / n
    lo = len([i for i in kept if i >= n]) / n
    # keep iff draw > 1 − score, draw ~ Lomax(α=9):
    # P(keep) = (1 + (1 − score))^−9 → score 0.95: 1.05^−9 ≈ 0.645,
    # score 0.05: 1.95^−9 ≈ 0.0025 — steep but heavy-tailed, exactly
    # GPT-3's intent (low scorers admitted rarely, not never)
    assert 0.60 < hi < 0.69
    assert 0 < len([i for i in kept if i >= n]) and lo < 0.01
    again = {r["doc_id"] for r in qc.pareto_filter(scores, seed=3).collect()}
    assert again == kept
    other = {r["doc_id"] for r in qc.pareto_filter(scores, seed=4).collect()}
    assert other != kept


def test_oversized_class_samples_not_heads(spark):
    """Classes larger than max_sample go through the real-count random
    sample path (review repro: the fraction used to saturate at 1.0 and
    limit() took the DataFrame head) — and the fit still separates."""
    rng = np.random.default_rng(97)
    pos = spark.createDataFrame(
        [(i, _doc(rng, GOOD)) for i in range(40)],
        "doc_id bigint, text string")
    neg = spark.createDataFrame(
        [(i, _doc(rng, JUNK)) for i in range(40)],
        "doc_id bigint, text string")
    w, b = qc.train_quality_classifier(pos, neg, n_buckets=B,
                                       max_sample=12, portable=True)
    s = {r["doc_id"]: r["score"] for r in qc.classifier_scores(
        spark.createDataFrame(
            [(0, _doc(rng, GOOD)), (1, _doc(rng, JUNK))],
            "doc_id bigint, text string"),
        (w, b), portable=True).collect()}
    assert s[0] > 0.8 and s[1] < 0.2


def test_filter_schema_and_plan(spark, fitted):
    (w, b), rng = fitted
    df = spark.createDataFrame(
        [(i, _doc(rng, GOOD)) for i in range(5)],
        "doc_id bigint, text string")
    out = qc.quality_classifier_filter(df, (w, b), portable=True)
    assert out.columns == df.columns
    assert out.count() == 5          # clean docs all pass
    plan = qc.classifier_scores(df, (w, b), portable=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan
