"""Collocations: exact bigram/unigram counts vs a pure-Python
reference and the DuckDB list twin; PMI vs numpy; the word2phrase
candidate rule."""

import math
from collections import Counter

import duckdb
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.collocations import (bigram_counts,
                                                        phrase_candidates,
                                                        pmi)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _py_counts(texts):
    uni, bi = Counter(), Counter()
    for t in texts:
        toks = [w for w in t.lower().strip().split() if w]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    return uni, bi


def test_counts_match_python(spark):
    texts = ["the quick fox the quick dog", "quick fox runs",
             "  the   quick fox  ", "", "single"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {(r.w1, r.w2): (r.c_xy, r.c_x, r.c_y, r.n_tokens)
           for r in bigram_counts(df).collect()}
    uni, bi = _py_counts(texts)
    n = sum(uni.values())
    assert len(got) == len(bi)
    for (a, b), c in bi.items():
        assert got[(a, b)] == (c, uni[a], uni[b], n)


def test_counts_match_duckdb(spark):
    df = spark.read.parquet(DOCS)
    got = sorted((r.w1, r.w2, r.c_xy, r.c_x, r.c_y, r.n_tokens)
                 for r in bigram_counts(df, min_count=3).collect())
    want = sorted(duckdb.sql(f"""
        WITH lists AS (
          SELECT list_filter(string_split_regex(trim(lower(text)),
                                                '\\s+'),
                             x -> x <> '') AS lt
          FROM '{DOCS}' WHERE text IS NOT NULL),
        uni AS (SELECT unnest(lt) AS w FROM lists),
        uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
        n AS (SELECT SUM(c) AS n_tokens FROM uc),
        pairs AS (SELECT unnest(list_zip(lt[1:len(lt)-1],
                                         lt[2:len(lt)])) AS p
                  FROM lists WHERE len(lt) >= 2),
        bc AS (SELECT p[1] AS w1, p[2] AS w2,
                      COUNT(*) AS c_xy
               FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        SELECT bc.w1, bc.w2, bc.c_xy, ux.c AS c_x, uy.c AS c_y,
               n.n_tokens
        FROM bc JOIN uc ux ON ux.w = bc.w1
                JOIN uc uy ON uy.w = bc.w2, n
    """).fetchall())
    assert got == want
    assert len(got) > 20


def test_pmi_matches_numpy(spark):
    df = spark.read.parquet(DOCS)
    rows = pmi(bigram_counts(df, min_count=5)).collect()
    for r in rows[:50]:
        want = math.log(r.c_xy * r.n_tokens / (r.c_x * r.c_y))
        assert abs(r.pmi - want) < 1e-12


def test_phrase_candidates_rule(spark):
    texts = ["new york city is big"] * 20 + ["the the the"] * 20
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    cands = phrase_candidates(df, min_count=5, min_pmi=1.0).collect()
    pairs = [(r.w1, r.w2) for r in cands]
    assert ("new", "york") in pairs           # PMI = ln(8) ~ 2.08
    # "the the" is frequent but weakly informative: 40*160/3600 ->
    # PMI ~ 0.58, under the bar
    assert ("the", "the") not in pairs
    assert all(r.c_xy >= 5 and r.pmi >= 1.0 for r in cands)
