"""Tests for the search/crawl front-end (L17-L21) and the eval suite (L24-L27)."""

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.llm.survey_mock import MockSurveyClient
from llmxmapreduce_spark.pipelines import eval_suite, search_crawl


def test_search_crawl_front_end(spark):
    def fake_search(query):
        return [{"url": f"https://x.test/{abs(hash(query)) % 1000}/{i}",
                 "title": f"t{i}", "snippet": f"snippet {i} about {query}"}
                for i in range(4)]

    def fake_fetch(url):
        n = int(url.rsplit("/", 1)[-1])
        body = " ".join(f"word{i} the of and in" for i in range(40 + 10 * n))
        return f"# Page {n}\n{body}"

    topics = spark.createDataFrame(
        [("deep learning", "neural nets")], ["topic", "description"])
    out = search_crawl.run_search_crawl(
        topics, lambda: fake_search, lambda: fake_fetch, MockSurveyClient,
        top_n=5, snippet_threshold=30, similarity_threshold=50,
        min_length=100, max_length=10000,
    ).collect()
    assert len(out) == 1
    papers = out[0]["papers"]
    assert 1 <= len(papers) <= 8
    for p in papers:
        assert p["txt"].startswith("# Page")
        assert 0 <= p["similarity"] <= 100


def test_search_crawl_url_blocklist(spark):
    """The front-end's URL blocklist drops blocklisted-domain hits BEFORE
    snippet scoring and the crawl (RefinedWeb §3.1 order) — surviving
    papers never carry a blocked domain."""
    def fake_search(query):
        hosts = ["x.test", "blocked.bad"]
        return [{"url": f"https://{hosts[i % 2]}/{abs(hash(query)) % 1000}/{i}",
                 "title": f"t{i}", "snippet": f"snippet {i} about {query}"}
                for i in range(6)]

    def fake_fetch(url):
        n = int(url.rsplit("/", 1)[-1])
        body = " ".join(f"word{i} the of and in" for i in range(40 + 10 * n))
        return f"# Page {n}\n{body}"

    topics = spark.createDataFrame(
        [("deep learning", "neural nets")], ["topic", "description"])
    blocked = spark.createDataFrame([("blocked.bad",)], "domain string")
    out = search_crawl.run_search_crawl(
        topics, lambda: fake_search, lambda: fake_fetch, MockSurveyClient,
        # top_n=20 keeps the T7 over-fetch cap above the hit count: the
        # cap orders by URL and 'blocked.bad' sorts before 'x.test', so a
        # tight cap would remove the x.test hits BEFORE the blocklist —
        # leaving nothing and testing the cap, not the filter
        top_n=20, snippet_threshold=0, similarity_threshold=0,
        min_length=10, max_length=10000, url_blocklist=blocked,
    ).collect()
    assert len(out) == 1
    papers = out[0]["papers"]
    assert len(papers) >= 1
    assert all("blocked.bad" not in p["url"] for p in papers)


def test_expand_queries_parses_block(spark):
    topics = spark.createDataFrame([("graph neural networks", None)],
                                   "topic string, description string")
    qs = search_crawl.expand_queries(topics, MockSurveyClient).collect()
    assert len(qs) == 3
    assert all(q["query"].startswith("graph neural networks") for q in qs)


@pytest.fixture(scope="module")
def eval_fixture(spark):
    surveys = spark.createDataFrame(
        [("s1", "Topic One",
          "## Alpha\nThe deployment framework scales well [1]. Noise here. "
          "Quantization compresses models [1, 2].\n"
          "## Beta\nUnsupported claim entirely [2].\n"
          "## References\n[1] A\n[2] B\n")],
        ["survey_id", "survey_title", "content_md"],
    )
    papers = spark.createDataFrame(
        [("s1", 0, "pA", "deployment framework details and scaling quantization study"),
         ("s1", 1, "pB", "completely unrelated botany text about flowers")],
        ["survey_id", "paper_pos", "bibkey", "txt"],
    )
    return surveys, papers


def test_extract_claims(spark, eval_fixture):
    surveys, _ = eval_fixture
    claims = eval_suite.extract_claims(surveys).collect()
    got = {r["claim"].strip(): sorted(r["cited_indices"]) for r in claims}
    assert any("deployment framework" in c for c in got)
    assert got[next(c for c in got if "Quantization" in c)] == [1, 2]
    # reference sentence lines from ## References are cut off
    assert not any("[1] A" in c for c in got)


def test_nli_and_metrics(spark, eval_fixture):
    surveys, papers = eval_fixture
    out = eval_suite.run_survey_eval(surveys, papers, MockSurveyClient).collect()
    assert len(out) == 1
    r = out[0]
    # claim 1 ([1]: 'deployment framework' in source A) supported;
    # claim 3 ([2]: botany source) unsupported
    assert 0 < r["claim_precision"] < 1.0 or r["claim_precision"] == pytest.approx(2 / 3)
    assert 0 <= r["citation_precision"] <= 1
    assert r["reference_coverage"] == 1.0     # both papers cited somewhere
    assert r["n_claims"] == 3
    for c in eval_suite.CRITERIA:
        assert r[c] in (20, 40, 60, 80, 100)  # 1-5 rubric ×20
    assert 0 <= r["language_score"] <= 100
    assert r["claim_density"] > 0


def test_eval_deterministic(spark, eval_fixture):
    surveys, papers = eval_fixture
    a = eval_suite.run_survey_eval(surveys, papers, MockSurveyClient).collect()
    b = eval_suite.run_survey_eval(surveys, papers, MockSurveyClient).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
