"""DSIR importance resampling (operators/dsir.py): planted domain-shift
recovery, an exact DuckDB twin of the hashed-feature weight computation
(portable md5 buckets), Gumbel-selection determinism, and plan checks."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import dsir

B = 64          # test-sized bucket space (production default 10 000)
ALPHA = 1.0

VOCAB_A = "sun rain tree rock bird fish wind snow".split()
VOCAB_B = "quark lepton boson gluon hadron meson pion kaon".split()


def _doc(rng, vocab, k=25):
    return " ".join(rng.choice(vocab) for _ in range(k))


@pytest.fixture(scope="module")
def shifted(spark):
    rng = np.random.default_rng(83)
    target_rows = [(i, _doc(rng, VOCAB_A)) for i in range(15)]
    raw_rows = [(i, _doc(rng, VOCAB_A)) for i in range(20)]          # in-domain
    raw_rows += [(100 + i, _doc(rng, VOCAB_B)) for i in range(20)]   # off-domain
    raw_rows.append((200, None))                                     # null text
    target = spark.createDataFrame(target_rows, "doc_id bigint, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id bigint, text string")
    return target, raw, target_rows, raw_rows


def test_weights_separate_planted_domains(spark, shifted):
    target, raw, _, _ = shifted
    lr = dsir.fit_bucket_logratio(target, raw, n_buckets=B, alpha=ALPHA)
    assert lr.count() == B
    w = {r["doc_id"]: r for r in
         dsir.importance_weights(raw, lr, n_buckets=B).collect()}
    in_domain = [w[i]["log_weight"] for i in range(20)]
    off_domain = [w[100 + i]["log_weight"] for i in range(20)]
    assert min(in_domain) > max(off_domain)
    assert w[200]["n_grams"] == 0 and w[200]["log_weight"] == 0.0
    assert set(w) == {r for r in range(20)} | {100 + r for r in range(20)} \
        | {200}


_TWIN = r"""
WITH
tg AS (SELECT g FROM (
    SELECT unnest(list_concat(
        [w for w in string_split_regex(trim(lower(text)), '\s+') if w <> ''],
        [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])) AS g
    FROM (SELECT text, string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM target_pdf WHERE text IS NOT NULL))),
rg AS (SELECT g FROM (
    SELECT unnest(list_concat(
        [w for w in string_split_regex(trim(lower(text)), '\s+') if w <> ''],
        [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])) AS g
    FROM (SELECT text, string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM raw_pdf WHERE text IS NOT NULL))),
tb AS (SELECT CAST(('0x' || substr(md5(g),1,15)) AS UBIGINT) % {B} AS bucket,
              count(*) AS ct FROM tg GROUP BY 1),
rb AS (SELECT CAST(('0x' || substr(md5(g),1,15)) AS UBIGINT) % {B} AS bucket,
              count(*) AS cr FROM rg GROUP BY 1),
lr AS (
  SELECT r.range AS bucket,
         ln(coalesce(tb.ct, 0) + {A}) - ln((SELECT sum(ct) FROM tb) + {A} * {B})
       - ln(coalesce(rb.cr, 0) + {A}) + ln((SELECT sum(cr) FROM rb) + {A} * {B})
         AS logratio
  FROM range({B}) r
  LEFT JOIN tb ON r.range = tb.bucket
  LEFT JOIN rb ON r.range = rb.bucket),
db AS (SELECT doc_id,
              CAST(('0x' || substr(md5(g),1,15)) AS UBIGINT) % {B} AS bucket,
              count(*) AS c
       FROM (SELECT doc_id, unnest(list_concat(
                 [w for w in string_split_regex(trim(lower(text)), '\s+')
                  if w <> ''],
                 [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])) AS g
             FROM (SELECT doc_id, text,
                          string_split_regex(trim(lower(text)), '\s+') AS ws
                   FROM raw_pdf WHERE text IS NOT NULL))
       GROUP BY doc_id, bucket),
agg AS (SELECT doc_id, sum(c) AS n_grams,
               sum(c * logratio) AS log_weight
        FROM db JOIN lr USING (bucket) GROUP BY doc_id)
SELECT r.doc_id, coalesce(a.n_grams, 0) AS n_grams,
       coalesce(a.log_weight, 0.0) AS log_weight
FROM (SELECT DISTINCT doc_id FROM raw_pdf) r
LEFT JOIN agg a USING (doc_id) ORDER BY r.doc_id
"""


def test_duckdb_twin_portable_buckets(spark, shifted):
    target, raw, target_rows, raw_rows = shifted
    lr = dsir.fit_bucket_logratio(target, raw, n_buckets=B, alpha=ALPHA,
                                  portable=True)
    got = sorted(dsir.importance_weights(raw, lr, n_buckets=B,
                                         portable=True).collect(),
                 key=lambda r: r["doc_id"])
    target_pdf = pd.DataFrame(target_rows, columns=["doc_id", "text"])  # noqa: F841
    raw_pdf = pd.DataFrame(raw_rows, columns=["doc_id", "text"])        # noqa: F841
    duck = duckdb.sql(_TWIN.format(B=B, A=ALPHA)).fetchall()
    assert len(got) == len(duck)
    for g, d in zip(got, duck):
        assert g["doc_id"] == d[0] and g["n_grams"] == d[1]
        assert abs(g["log_weight"] - d[2]) < 1e-9 * max(abs(d[2]), 1)


def test_dsir_select_recovers_target_domain(spark, shifted):
    target, raw, _, _ = shifted
    sel = dsir.dsir_select(raw, target, n_select=15, n_buckets=B,
                           alpha=ALPHA, seed=7)
    ids = {r["doc_id"] for r in sel.collect()}
    assert len(ids) == 15
    # in-domain docs dominate the selection overwhelmingly
    assert len([i for i in ids if i < 100]) >= 13
    assert sel.columns == raw.columns
    # deterministic for a fixed seed
    again = {r["doc_id"] for r in
             dsir.dsir_select(raw, target, n_select=15, n_buckets=B,
                              alpha=ALPHA, seed=7).collect()}
    assert again == ids


def test_fit_raw_sample_bound(spark, shifted):
    """The default fit bounds the raw side (review finding: dsir_select
    explode-featurized the FULL crawl; the docstring said 'sample at
    scale' but the default didn't).  A bounded fit must (a) leave
    results IDENTICAL when the raw side is under the cap, (b) still
    recover the planted domain shift when the cap actually samples."""
    target, raw, _, _ = shifted
    # (a) under the cap: bit-identical log-ratio table
    full = dsir.fit_bucket_logratio(target, raw, n_buckets=B,
                                    raw_sample=None)
    bounded = dsir.fit_bucket_logratio(target, raw, n_buckets=B,
                                       raw_sample=100_000)
    assert sorted(map(tuple, full.collect())) \
        == sorted(map(tuple, bounded.collect()))
    # (b) cap smaller than the corpus: the sampled estimate must still
    # separate the planted domains end-to-end
    lr = dsir.fit_bucket_logratio(target, raw, n_buckets=B, raw_sample=24,
                                  seed=5)
    w = {r["doc_id"]: r["log_weight"] for r in
         dsir.importance_weights(raw, lr, n_buckets=B).collect()}
    in_dom = [w[i] for i in range(20)]
    off_dom = [w[100 + i] for i in range(20)]
    assert min(in_dom) > max(off_dom)
    # and the default dsir_select path (bounded fit) still recovers
    sel = dsir.dsir_select(raw, target, n_select=15, n_buckets=B, seed=7,
                           raw_sample=24)
    ids = {r["doc_id"] for r in sel.collect()}
    assert len(ids) == 15 and len([i for i in ids if i < 100]) >= 13


def test_plan_broadcasts_logratio(spark, shifted):
    target, raw, _, _ = shifted
    lr = dsir.fit_bucket_logratio(target, raw, n_buckets=B)
    plan = dsir.importance_weights(raw, lr, n_buckets=B) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan
