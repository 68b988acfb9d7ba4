"""Regression tests for the round-2 code-review findings."""

from pyspark.sql import functions as F

from llmxmapreduce_spark.functions import text as X
from llmxmapreduce_spark.llm.client import MockQAClient
from llmxmapreduce_spark.operators import citations, similarity
from llmxmapreduce_spark.pipelines.v1_qa import run_v1_qa
from llmxmapreduce_spark.sources import crawl


def test_bibkey_unicode_parity(spark):
    cases = ["Réseaux de Neurones", "naïve approach", "ASCII only title"]
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    got = [r[0] for r in df.select(X.normalize_bibkey(F.col("s"))).collect()]
    assert got == [X.normalize_bibkey_py(c) for c in cases]
    assert got[0] == "réseaux_de_neurones"   # accents survive (unicode \w)
    assert got[1] == "naïve_approach"


def test_hyperplane_signatures_discriminate(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    rows = [(i, [float(x) for x in np.abs(rng.normal(0, 1, 16))])
            for i in range(40)]  # non-negative vectors: the old bug's worst case
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
        .withColumn("embedding", F.col("embedding").cast("array<float>"))
    sigs = df.select(
        similarity.hyperplane_signs(
            F.col("embedding").cast("array<double>"), n_planes=6).alias("b")
    ).collect()
    distinct = {r["b"] for r in sigs}
    assert len(distinct) > 1, "signatures collapsed to one bucket"
    assert any("1" in b for b in distinct) and any("0" in b for b in distinct)


def test_search_cap_is_per_topic(spark):
    def fake_search(query):
        topic_tag = query.split()[0]
        return [{"url": f"https://{topic_tag}.test/{i}", "title": "t",
                 "snippet": "s"} for i in range(10)]

    queries = spark.createDataFrame(
        [("aaa", "aaa q"), ("zzz", "zzz q")], ["topic", "query"])
    hits = crawl.batch_web_search(queries, lambda: fake_search, top_n=5)
    by_topic = {}
    for r in hits.collect():
        by_topic.setdefault(r["topic"], 0)
        by_topic[r["topic"]] += 1
    # old bug: global alphabetical cap starved the late-sorting topic
    assert by_topic == {"aaa": 6, "zzz": 6}  # over_fetch(5) each


def test_v1_qa_keeps_unanswerable_docs(spark):
    rows = [
        (0, "filler\nThe secret key for document 0 is SK-9000.\nfiller",
         "What is the secret key for document 0?"),
        (1, "only irrelevant noise lines\nnothing else here",
         "What is the secret key for document 1?"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "context", "question"])
    out = {r["doc_id"]: r["answer"]
           for r in run_v1_qa(docs, 520, MockQAClient).collect()}
    assert out[0] == "SK-9000"
    assert 1 in out and "[NO INFORMATION]" in out[1]   # not silently dropped


def test_renumber_survives_missing_papers(spark):
    sections = spark.createDataFrame(
        [("known", 0, "cites [k1]."), ("orphan", 0, "cites [k1].")],
        ["survey_id", "pos", "content"])
    papers = spark.createDataFrame(
        [("known", 0, "k1", "T", None)],
        "survey_id string, paper_pos int, bibkey string, title string, url string")
    out = {r["survey_id"]: r["content"]
           for r in citations.renumber_citations(sections, papers).collect()}
    assert out["known"] == "cites [1]."
    assert out["orphan"] == "cites ."     # unknown keys dropped, no crash
