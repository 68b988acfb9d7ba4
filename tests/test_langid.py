"""Trainable char-n-gram language ID (operators/langid.py): planted
separation on held-out text, the exact DuckDB train→score twin on the
documents table, short/null-text null predictions, and partitioning
invariance."""

import duckdb
from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.operators.langid import (char_ngrams,
                                                  langid_predict,
                                                  langid_sql,
                                                  train_langid)

SF = "/root/testdata/sf0.001"

_EN = ["the system was configured to run the analysis of the data",
       "we found that the results were consistent with the theory",
       "this guide explains how the cluster can be deployed there"]
_FR = ["le système a été configuré pour exécuter cette analyse des",
       "nous avons constaté que les résultats étaient cohérents avec",
       "ce guide explique comment le cluster peut être déployé ici"]


def test_planted_separation(spark):
    train = spark.createDataFrame(
        [(i, "en", t) for i, t in enumerate(_EN[:2])]
        + [(i + 10, "fr", t) for i, t in enumerate(_FR[:2])],
        "doc_id long, lang string, text string")
    model = train_langid(train, vocab_size=500, min_count=1)
    test = spark.createDataFrame(
        [(100, _EN[2]), (101, _FR[2]), (102, None), (103, "ab")],
        "doc_id long, text string")
    got = {r.doc_id: r.lang_pred
           for r in langid_predict(test, model).collect()}
    assert got[100] == "en" and got[101] == "fr"
    assert got[102] is None and got[103] is None   # no grams → null


def test_twin_matches_duckdb(spark):
    d = load_table(spark, SF, "documents") \
        .select("doc_id", "lang", "text")
    model = train_langid(d.filter(F.col("doc_id") % 19 == 0),
                         vocab_size=800, min_count=2)
    got = {r.doc_id: r.lang_pred for r in langid_predict(
        d.filter(F.col("doc_id") % 19 != 0), model).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    want = dict(con.execute(langid_sql(
        "documents", vocab_size=800, min_count=2,
        where="doc_id % 19 = 0",
        score_where="doc_id % 19 <> 0")).fetchall())
    assert len(got) == len(want) > 100
    assert got == want


def test_partition_invariance(spark):
    d = load_table(spark, SF, "documents") \
        .select("doc_id", "lang", "text").limit(300)
    m = train_langid(d, vocab_size=300, min_count=1)
    p1 = {r.doc_id: r.lang_pred
          for r in langid_predict(d, m).collect()}
    p2 = {r.doc_id: r.lang_pred
          for r in langid_predict(d.repartition(13), m).collect()}
    assert p1 == p2 and len(p1) == 300


def test_char_ngrams_shape(spark):
    df = spark.createDataFrame(
        [("A  b\tC",), ("ab",), (None,)], "t string")
    got = [r.g for r in df.select(
        char_ngrams(F.col("t"), 3).alias("g")).collect()]
    assert got[0] == ["a b", " b ", "b c"]
    assert got[1] == [] and got[2] == []


def test_fast_path_matches_catalyst(spark):
    """r11: langid_predict_fast (per-doc integer scoring, mapInPandas,
    no shuffle) must predict EXACTLY what the Catalyst decimal path
    predicts — on the real documents corpus (all langs, nulls, short
    texts) and on the planted bilingual set, including whitespace
    classes Java's \\s would not collapse."""
    from llmxmapreduce_spark.operators.langid import langid_predict_fast

    d = load_table(spark, SF, "documents").select("doc_id", "lang",
                                                  "text")
    model = train_langid(d.filter(F.col("doc_id") % 7 == 0),
                         vocab_size=400, min_count=1)
    rest = d.filter(F.col("doc_id") % 7 != 0)
    slow_rows = langid_predict(rest, model).collect()
    fast_rows = langid_predict_fast(rest, model).collect()
    slow = {r.doc_id: r.lang_pred for r in slow_rows}
    fast = {r.doc_id: r.lang_pred for r in fast_rows}
    assert fast == slow and len(fast) > 100
    # doc_id is unique here, so CARDINALITY must match too (the dict
    # compare alone would mask a duplicate-row divergence — r12 ADVICE)
    assert len(fast_rows) == len(slow_rows) == len(fast)

    # unicode NBSP: Python \s collapses it, Java \s does not — the fast
    # path must mirror Java (grams spanning \xa0 stay intact)
    tricky = spark.createDataFrame(
        [(1, "le\xa0système est une chose"), (2, "the system is there"),
         (3, "x\xa0y"), (4, None)],
        "doc_id long, text string")
    s2 = {r.doc_id: r.lang_pred
          for r in langid_predict(tricky, model).collect()}
    f2 = {r.doc_id: r.lang_pred
          for r in langid_predict_fast(tricky, model).collect()}
    assert f2 == s2


def test_fast_path_duplicate_id_contract(spark):
    """r12 ADVICE (low): with DUPLICATE ids the two paths deliberately
    diverge — langid_predict pools grams across rows per id (one output
    row per distinct id), langid_predict_fast scores each input row on
    its own text (one output row per input row, zero shuffle).  Pin
    both cardinalities so the documented contract stays true."""
    from llmxmapreduce_spark.operators.langid import langid_predict_fast

    d = load_table(spark, SF, "documents").select("doc_id", "lang",
                                                  "text")
    model = train_langid(d.limit(200), vocab_size=200, min_count=1)
    dup = spark.createDataFrame(
        [(1, "the system is there and the things are fine"),
         (1, "le système est une chose qui est là"),
         (2, "the system is there")],
        "doc_id long, text string")
    slow_rows = langid_predict(dup, model).collect()
    fast_rows = langid_predict_fast(dup, model).collect()
    assert len(slow_rows) == 2        # one per distinct id (pooled)
    assert len(fast_rows) == 3        # one per input row (independent)
    # on the unique id the two agree exactly
    slow2 = {r.doc_id: r.lang_pred for r in slow_rows}
    fast2 = [r.lang_pred for r in fast_rows if r.doc_id == 2]
    assert fast2 == [slow2[2]]


def test_fast_path_plan_has_no_shuffle(spark):
    from llmxmapreduce_spark.operators.langid import langid_predict_fast

    d = load_table(spark, SF, "documents").select("doc_id", "lang",
                                                  "text")
    model = train_langid(d.limit(50), vocab_size=100, min_count=1)
    out = langid_predict_fast(d, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
