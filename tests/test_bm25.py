"""BM25 ranked retrieval — hand-computed scores, DuckDB twin,
stopword cut, determinism under repartition."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import bm25

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog chased the cat"),
    (2, "quantum field theory lecture notes"),
    (3, "the quick brown fox"),
    (4, ""),  # token-free: excluded from N / avgdl, never matches
    (5, "cat cat cat dog"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(docs, qid, qtext, k1=1.2, b=0.75):
    """Independent reference implementation (pure python)."""
    toks = {i: t.lower().split() for i, t in docs}
    toks = {i: ws for i, ws in toks.items() if ws}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for t in dict.fromkeys(qtext.lower().split()):
        dft = sum(1 for ws in toks.values() if t in ws)
        if dft == 0:
            continue
        idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        for d, ws in toks.items():
            tf = ws.count(t)
            if tf == 0:
                continue
            c = idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(ws) / avgdl)))
            out[d] = out.get(d, 0) + math.floor(c * 1_000_000.0)
    return out


def test_scores_match_reference(spark, corpus):
    queries = spark.createDataFrame(
        [(100, "cat dog"), (101, "quantum notes"), (102, "cat the cat")],
        "query_id long, text string",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in bm25.bm25_topk(corpus, queries, k=10).collect()
    }
    for qid, qtext in [(100, "cat dog"), (101, "quantum notes"),
                       (102, "cat the cat")]:
        want = _py_bm25(DOCS, qid, qtext)
        for d, s in want.items():
            assert got[(qid, d)] == s, (qid, d)
        # no spurious matches
        assert {d for (q, d) in got if q == qid} == set(want)


def test_ranking_and_ties(spark, corpus):
    queries = spark.createDataFrame([(1, "cat")], "query_id long, text string")
    rows = bm25.bm25_topk(corpus, queries, k=10).orderBy("rank").collect()
    # doc 5 has tf=3 and is short → highest score
    assert rows[0]["doc_id"] == 5 and rows[0]["rank"] == 1
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_k_truncation(spark, corpus):
    queries = spark.createDataFrame([(1, "the cat dog")],
                                    "query_id long, text string")
    assert bm25.bm25_topk(corpus, queries, k=2).count() == 2


def test_max_df_ratio_drops_stopword(spark, corpus):
    # "the" appears in 4/5 token-bearing docs (df ratio 0.8)
    queries = spark.createDataFrame([(1, "the quantum")],
                                    "query_id long, text string")
    full = bm25.bm25_topk(corpus, queries, k=10)
    cut = bm25.bm25_topk(corpus, queries, k=10, max_df_ratio=0.5)
    assert full.count() > cut.count()
    assert {r["doc_id"] for r in cut.collect()} == {2}  # only "quantum" left


def test_empty_doc_excluded_from_stats(spark, corpus):
    # N must be 5 (doc 4 is token-free); check via a df=1 term's idf effect:
    # reference impl already excludes it, so equality in
    # test_scores_match_reference covers it; here just assert no row ever
    # returns doc 4
    queries = spark.createDataFrame([(1, "the cat dog quantum fox")],
                                    "query_id long, text string")
    assert all(r["doc_id"] != 4
               for r in bm25.bm25_topk(corpus, queries, k=10).collect())


def test_prebuilt_postings_equivalent(spark, corpus):
    queries = spark.createDataFrame([(7, "brown fox")],
                                    "query_id long, text string")
    p = bm25.bm25_postings(corpus)
    a = sorted(map(tuple, bm25.bm25_topk(corpus, queries, k=5).collect()))
    c = sorted(map(tuple,
                   bm25.bm25_topk(corpus, queries, k=5, postings=p).collect()))
    assert a == c


def test_deterministic_under_repartition(spark, corpus):
    queries = spark.createDataFrame([(1, "cat dog the")],
                                    "query_id long, text string")
    a = sorted(map(tuple, bm25.bm25_topk(corpus, queries, k=10).collect()))
    b = sorted(map(tuple,
                   bm25.bm25_topk(corpus.repartition(7), queries,
                                  k=10).collect()))
    assert a == b


def test_duckdb_twin(spark, corpus):
    """Exact score_micro match vs an independent DuckDB formulation."""
    queries = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (2, "quantum field theory lecture notes")],
        "query_id long, text string",
    )
    got = sorted(map(tuple, bm25.bm25_topk(corpus, queries, k=10).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    want = con.execute("""
        WITH c AS (SELECT doc_id,
                 [w for w in string_split_regex(trim(lower(text)), '\\s+')
                  if w <> ''] AS toks FROM docs),
        tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                FROM c WHERE len(toks) > 0),
        post AS (SELECT doc_id, dl, term, count(*) AS tf
                 FROM tok GROUP BY ALL),
        st AS (SELECT count(*) AS n,
                      CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl
               FROM (SELECT doc_id, max(dl) AS dl FROM post GROUP BY doc_id)),
        idf AS (SELECT term, count(*) AS dft FROM post GROUP BY term),
        q AS (SELECT doc_id AS query_id,
                     unnest(list_distinct(toks)) AS term
              FROM c WHERE doc_id IN (0, 2)),
        contrib AS (
            SELECT q.query_id, p.doc_id,
                   CAST(floor(
                     ln(1.0 + (st.n - i.dft + 0.5)/(i.dft + 0.5))
                     * (p.tf*(1.2+1.0)
                        / (p.tf + 1.2*(1.0-0.75 + 0.75*p.dl/st.avgdl)))
                     * 1000000.0) AS BIGINT) AS cm
            FROM q JOIN post p USING(term) JOIN idf i USING(term)
            CROSS JOIN st),
        s AS (SELECT query_id, doc_id, sum(cm) AS score_micro
              FROM contrib GROUP BY ALL),
        r AS (SELECT query_id, doc_id,
                     CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank,
                     score_micro
              FROM s)
        SELECT query_id, doc_id, rank, score_micro FROM r WHERE rank <= 10
    """).fetchall()
    assert got == sorted(map(tuple, want))
