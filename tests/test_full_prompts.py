"""Reference prompt-text parity (SURVEY.md §2 prompt surface).

The prompts package carries the reference's verbatim templates
(prompts_en.py/prompts_zh.py + the six V1 task yamls); these tests assert
that (a) each L* operator's prompt builder emits EXACTLY the reference
template under full-prompt mode, and (b) the pipelines still run end-to-end
with full prompts against the extended mock routing.
"""

import glob
import os
import tempfile

import pytest

from llmxmapreduce_spark import prompts as P
from llmxmapreduce_spark.llm.client import MockQAClient
from llmxmapreduce_spark.llm.survey_mock import MockSurveyClient
from llmxmapreduce_spark.pipelines import v2_survey as v2

import llmxmapreduce_spark.prompts.prompts_en as en
import llmxmapreduce_spark.prompts.prompts_zh as zh

PS = v2._prompt_set(v2.V2Config(full_prompts=True))


def test_prompt_modules_cover_the_reference_surface():
    names = {n for n in dir(en) if n.endswith("_PROMPT")}
    # the PromptsProtocol surface (reference prompts/base.py:9-42)
    for required in [
        "GROUP_PROMPT", "INIT_OUTLINE_PROMPT", "CONCAT_OUTLINE_PROMPT",
        "MODIFY_OUTLINE_PROMPT", "OUTLINE_CONVOLUTION_PROMPT",
        "OUTLINE_ENTROPY_PROMPT", "RESIDUAL_MODIFY_OUTLINE_PROMPT",
        "SINGLE_DIGEST_PROMPT", "DIGEST_BASE_PROMPT", "DIGEST_FREE_PROMPT",
        "ORCHESTRA_PROMPT", "SUMMARY_PROMPT", "POLISH_PROMPT", "CHART_PROMPT",
        "LLM_CHECK_PROMPT", "SNIPPET_FILTER_PROMPT", "PAGE_REFINE_PROMPT",
        "SIMILARITY_PROMPT",
    ]:
        assert required in names, required
    # zh mirrors en symbol-for-symbol
    assert {n for n in dir(zh) if n.endswith("_PROMPT")} == names
    assert P.template("POLISH_PROMPT", "en") == en.POLISH_PROMPT
    assert P.template("POLISH_PROMPT", "zh") == zh.POLISH_PROMPT


def test_language_selection_follows_reference_env(monkeypatch):
    monkeypatch.setenv(P.ENV_VAR_NAME, "zh")
    assert P.get_module().GROUP_PROMPT == zh.GROUP_PROMPT
    monkeypatch.setenv(P.ENV_VAR_NAME, "klingon")  # base.py fallback
    assert P.get_module().GROUP_PROMPT == en.GROUP_PROMPT


# --- helper-level parity: builder output == reference template.format ------

def test_l11_modify_formats_reference_prompt():
    got = v2._modify_prompt("T", "# O", "S", PS)
    assert got == en.MODIFY_OUTLINE_PROMPT.format(
        title="T", old_outline="# O", outlines="S")


def test_l12_eval_formats_reference_prompt():
    got = v2._eval_prompt("T", "# O", PS)
    assert got == en.OUTLINE_ENTROPY_PROMPT.format(title="T", outline="# O")


def test_l10_kernel_formats_reference_prompt():
    got = v2._kernel_prompt("T", "S1\n---\nS2", PS, outline_md="# O")
    assert got == en.OUTLINE_CONVOLUTION_PROMPT.format(
        title="T", outline="# O", suggestions="S1\n---\nS2")


def test_l13_refine_formats_reference_prompt():
    got = v2._refine_prompt(0, 0, "T", "# O", PS, eval_detail="E")
    assert got == en.DIGEST_FREE_PROMPT.format(
        title="T", outline="# O", eval_detail="E")


def test_l14_l15_summary_polish_format_reference_prompts():
    got = v2._summary_prompt("T", "Sec", "subs", PS, outline="# O", digest="D")
    assert got == en.SUMMARY_PROMPT.format(
        title="T", section_title="Sec", subcontents="subs",
        outline="# O", digest="D")
    assert v2._polish_prompt("Sec", "C", PS) == en.POLISH_PROMPT.format(
        content="C")


def test_zh_prompt_set():
    ps_zh = v2._prompt_set(v2.V2Config(full_prompts=True, prompt_lang="zh"))
    assert v2._eval_prompt("T", "# O", ps_zh) == \
        zh.OUTLINE_ENTROPY_PROMPT.format(title="T", outline="# O")


def test_v1_prompts_are_reference_task_configs():
    for task in P.V1_TASK_CONFIGS:
        p = P.v1_prompts(task)
        assert set(p) == {"map", "collapse", "reduce"}
        for t in p.values():
            assert "{context}" in t and "{question}" in t
    qa = P.v1_prompts("qa")
    # the reference's structured-output contract phrases survive verbatim
    assert "Extract Relevant Information" in qa["map"]
    assert "Integrate Extracted Information" in qa["collapse"]
    assert "Information from chunks" in qa["reduce"]
    with pytest.raises(ValueError):
        P.v1_prompts("nope")


# --- stage-level: the pipelines actually EMIT the reference prompts --------


def test_v2_full_prompt_pipeline_end_to_end(spark):
    from llmxmapreduce_spark.llm.survey_mock import SpillingSurveyClient
    from tests.test_v2_pipeline import make_surveys

    surveys = make_surveys(spark, n_surveys=2, n_papers=4)
    cfg = v2.V2Config(conv_layers=1, receptive_field=2, result_num=2,
                      top_k=2, refine_rounds=1, best_of=1, polish=True,
                      block_count=1, shuffle_partitions=2, full_prompts=True)
    with tempfile.TemporaryDirectory() as d:
        out = v2.run_v2_survey(
            surveys, lambda: SpillingSurveyClient(d), cfg).collect()
        recorded = [open(f).read() for f in glob.glob(os.path.join(d, "*"))]

    # converges at full prompts: one row per survey, real structure
    assert sorted(r["survey_id"] for r in out) == ["survey0", "survey1"]
    for r in out:
        assert r["n_sections"] >= 2 and r["content_md"]

    # every emitted prompt is a formatted instance of ONE reference
    # template: it must start with that template's static prefix
    def prefix(tmpl):
        return tmpl.split("{", 1)[0]

    stage_templates = {
        "init": en.INIT_OUTLINE_PROMPT, "concat": en.CONCAT_OUTLINE_PROMPT,
        "digest": en.SINGLE_DIGEST_PROMPT, "feedback": en.DIGEST_BASE_PROMPT,
        "modify": en.MODIFY_OUTLINE_PROMPT, "eval": en.OUTLINE_ENTROPY_PROMPT,
        "refine": en.DIGEST_FREE_PROMPT, "orchestra": en.ORCHESTRA_PROMPT,
        "summary": en.SUMMARY_PROMPT, "polish": en.POLISH_PROMPT,
    }
    seen = {k: 0 for k in stage_templates}
    for p in recorded:
        for k, tmpl in stage_templates.items():
            if p.startswith(prefix(tmpl)) and prefix(tmpl):
                seen[k] += 1
    # every L* stage that runs at these knobs emitted reference prompts
    # (kernel needs multi-member groups; with 2 suggestions/2 result slots
    # singleton groups can skip it, so it is asserted separately below)
    for stage in ["init", "concat", "digest", "feedback", "modify", "eval",
                  "refine", "orchestra", "polish"]:
        assert seen[stage] > 0, (stage, seen)
    # no condensed-format prompt leaked through (the full POLISH template
    # itself begins "[Task Description]", so test the condensed tag set)
    condensed_tags = ("[INIT_OUTLINE]", "[CONCAT_OUTLINE]", "[DIGEST]",
                      "[FEEDBACK]", "[KERNEL]", "[MODIFY]", "[EVAL_OUTLINE]",
                      "[SELF_REFINE]", "[ORCHESTRA]", "[SUMMARY]", "[POLISH]",
                      "[GROUP]")
    assert not any(p.startswith(t) for p in recorded for t in condensed_tags)


def test_v1_full_prompt_pipeline_end_to_end(spark):
    from tests.test_v1_eval import _passkey_examples
    from llmxmapreduce_spark.pipelines import v1_eval

    examples = _passkey_examples(spark, n=3)
    scored, avgs = v1_eval.run_v1_eval(
        examples, chunk_size=2048, client_factory=MockQAClient)
    # same pipeline, now under the verbatim qa.yaml prompts — the mock
    # routes on the reference's own instruction phrases
    from llmxmapreduce_spark.pipelines.v1_qa import run_v1_qa

    answers = run_v1_qa(
        examples.select("doc_id", "context", "question"), 2048, MockQAClient,
        prompts=P.v1_prompts("qa"))
    got = {r["doc_id"]: r["answer"] for r in answers.collect()}
    assert got == {i: f"SK-{2000 + i}" for i in range(3)}
    assert all(r["score"] == 1.0 for r in scored.collect())
