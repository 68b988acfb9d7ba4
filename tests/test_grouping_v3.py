"""Tests: C7 LLM grouping (L4 + repair), V3 ops (L22/L23), regroup port."""

from llmxmapreduce_spark.llm.survey_mock import MockSurveyClient
from llmxmapreduce_spark.operators import grouping
from llmxmapreduce_spark.pipelines import search_crawl


def test_regroup_result_properties():
    groups = [["a", "b", "c", "d", "e"], ["f"], ["g", "h"]]
    rest = ["x", "y", "z"]
    out = grouping.regroup_result_py(groups, rest, batch_size=3)
    flat = [b for g in out for b in g]
    assert sorted(flat) == sorted(["a", "b", "c", "d", "e", "f", "g", "h",
                                   "x", "y", "z"])
    assert all(len(g) <= 3 for g in out)
    # oversize group split first: abc must be one batch
    assert ["a", "b", "c"] in out


def test_parse_group_result_drops_hallucinations():
    raw = "Groups: [a, b] [c, ghost] [d]"
    groups, rest = grouping.parse_group_result_py(raw, ["a", "b", "c", "d", "e"])
    assert groups == [["a", "b"], ["c"], ["d"]]
    assert rest == ["e"]


def test_llm_group_papers(spark):
    rows = [("s1", "Topic", f"key_{i:02d}", f"Paper {i}") for i in range(7)]
    papers = spark.createDataFrame(
        rows, ["survey_id", "survey_title", "bibkey", "title"])
    out = grouping.llm_group_papers(papers, MockSurveyClient, batch_size=2)
    got = out.collect()
    assert len(got) == 7                                  # every paper assigned
    by_group = {}
    for r in got:
        by_group.setdefault(r["digest_id"], []).append(r["bibkey"])
    assert all(len(v) <= 2 for v in by_group.values())


def test_v2_pipeline_llm_grouping(spark):
    from llmxmapreduce_spark.pipelines import v2_survey as v2
    from tests.test_v2_pipeline import make_surveys

    surveys = make_surveys(spark, n_surveys=1, n_papers=4)
    cfg = v2.V2Config(conv_layers=1, result_num=2, top_k=2, refine_rounds=1,
                      best_of=1, polish=False, group_mode="llm")
    out = v2.run_v2_survey(surveys, MockSurveyClient, cfg).collect()
    assert len(out) == 1 and out[0]["n_papers"] == 4


def test_topic_expansion_and_abstracts(spark):
    topics = spark.createDataFrame([("federated learning",)], ["topic"])
    expanded = search_crawl.expand_topic(topics, MockSurveyClient).collect()
    assert "federated learning" in expanded[0]["description"]

    pages = spark.createDataFrame(
        [("t", "https://u/1", "body text of the page " * 10)],
        ["topic", "url", "filtered"],
    )
    withabs = search_crawl.generate_abstracts(pages, MockSurveyClient).collect()
    assert withabs[0]["abstract"].startswith("Abstract: body text")
