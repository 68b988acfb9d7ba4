"""Vocab build + token-id encoding (operators/vocab.py): deterministic id
assignment, OOV mapping, order preservation, roundtrip, DuckDB twin,
broadcast plan pin."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import vocab as V


def test_build_vocab_deterministic_ids(spark):
    df = spark.createDataFrame(
        [(0, "b a a c b a"), (1, "a d  b")], "doc_id bigint, text string")
    v = {r["token"]: (r["token_id"], r["count"])
         for r in V.build_vocab(df).collect()}
    # counts: a=4 b=3 c=1 d=1 → ids by (count desc, token asc)
    assert v == {"a": (1, 4), "b": (2, 3), "c": (3, 1), "d": (4, 1)}
    top2 = {r["token"]: r["token_id"]
            for r in V.build_vocab(df, vocab_size=2).collect()}
    assert top2 == {"a": 1, "b": 2}
    pruned = {r["token"] for r in V.build_vocab(df, min_count=2).collect()}
    assert pruned == {"a", "b"}


def test_encode_order_oov_null_and_roundtrip(spark):
    train = spark.createDataFrame(
        [(0, "a b c a b a")], "doc_id bigint, text string")
    v = V.build_vocab(train)
    corpus = spark.createDataFrame(
        [(10, "c a b"),               # known words, order must survive
         (11, "a zz b"),             # zz → OOV id 0
         (12, ""),                   # empty → []
         (13, None)],                # null → []
        "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in V.encode_ids(corpus, v).collect()}
    ids = {r["token"]: r["token_id"] for r in v.collect()}
    assert got[10]["token_ids"] == [ids["c"], ids["a"], ids["b"]]
    assert got[11]["token_ids"] == [ids["a"], V.OOV_ID, ids["b"]]
    assert got[11]["n_oov"] == 1 and got[11]["n_tokens"] == 3
    assert got[12]["token_ids"] == [] and got[12]["n_tokens"] == 0
    assert got[13]["token_ids"] == [] and got[13]["n_tokens"] == 0

    dec = {r["doc_id"]: r["text"]
           for r in V.decode_ids(V.encode_ids(corpus, v), v).collect()}
    assert dec[10] == "c a b"                   # exact on known vocab
    assert dec[11] == "a <unk> b"
    assert dec[12] == "" and dec[13] == ""


_TWIN = r"""
WITH counts AS (
  SELECT token, count(*) AS c FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
    FROM train_pdf WHERE text IS NOT NULL) WHERE token <> ''
  GROUP BY token),
voc AS (
  SELECT token, row_number() OVER (ORDER BY c DESC, token ASC) AS token_id
  FROM counts QUALIFY token_id <= {V}),
tok AS (
  SELECT doc_id, i AS pos, ws[i] AS token
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        FROM corpus_pdf WHERE text IS NOT NULL),
       unnest(range(1, len(ws) + 1)) AS t(i)
  WHERE ws[i] <> ''),
enc AS (
  SELECT doc_id, list(coalesce(v.token_id, 0) ORDER BY pos) AS token_ids
  FROM tok LEFT JOIN voc v USING (token) GROUP BY doc_id)
SELECT c.doc_id,
       coalesce(e.token_ids, []) AS token_ids,
       len(coalesce(e.token_ids, [])) AS n_tokens,
       len([x for x in coalesce(e.token_ids, []) if x = 0]) AS n_oov
FROM (SELECT DISTINCT doc_id FROM corpus_pdf) c
LEFT JOIN enc e USING (doc_id) ORDER BY c.doc_id
"""


def test_duckdb_twin(spark):
    rng = np.random.default_rng(101)
    vocab_words = "the of and rain tree stone bird river".split()

    def doc(k=20):
        return " ".join(rng.choice(vocab_words) for _ in range(k))

    train_rows = [(i, doc(40)) for i in range(10)]
    corpus_rows = [(i, doc()) for i in range(25)]
    corpus_rows += [(90, "the zzz of qqq"), (91, None)]
    train = spark.createDataFrame(train_rows, "doc_id bigint, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")

    v = V.build_vocab(train, vocab_size=6)     # forces OOV on rare words
    got = sorted(V.encode_ids(corpus, v).collect(),
                 key=lambda r: r["doc_id"])
    train_pdf = pd.DataFrame(train_rows, columns=["doc_id", "text"])    # noqa: F841
    corpus_pdf = pd.DataFrame(corpus_rows, columns=["doc_id", "text"])  # noqa: F841
    duck = duckdb.sql(_TWIN.format(V=6)).fetchall()
    assert len(got) == len(duck)
    for g, d in zip(got, duck):
        assert g["doc_id"] == d[0]
        assert g["token_ids"] == d[1]
        assert (g["n_tokens"], g["n_oov"]) == (d[2], d[3])


def test_plan_broadcasts_vocab(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    v = V.build_vocab(df)
    plan = V.encode_ids(df, v)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastHashJoin" in plan
    for line in plan.split("\n"):
        if "SortMergeJoin" in line:
            assert "doc_id" in line, line
