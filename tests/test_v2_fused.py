"""LLM-batch-coalescing parity (r12 verdict task #6, SURVEY §4 optional
optimization): the fused digest→merge→feedback stage
(v2_survey.digest_feedback_fused) must be OUTPUT-IDENTICAL to the staged
make_digests → merge → feedback_suggestions chain — same merged digest
rows (incl. bibkey ordering and the 20-dash separator), same suggestion
rows — and run_v2_survey(fused_digest_feedback=True) must produce the
byte-identical end-to-end survey."""

from llmxmapreduce_spark.llm.survey_mock import MockSurveyClient
from llmxmapreduce_spark.pipelines import v2_survey as v2

from tests.test_v2_pipeline import make_surveys


def _prep(spark, cfg):
    surveys = make_surveys(spark, n_surveys=2, n_papers=6)
    papers = v2.build_papers(surveys)
    grouped = v2.group_papers(papers, cfg)
    outlines = v2.init_outlines(grouped, MockSurveyClient, cfg)
    return grouped.localCheckpoint(eager=True), \
        outlines.localCheckpoint(eager=True)


def _rows(df):
    out = []
    for r in df.collect():
        d = r.asDict()
        for k, v in d.items():
            if isinstance(v, list):
                d[k] = tuple(v)
        out.append(tuple(sorted(d.items())))
    return sorted(out)


def test_fused_stage_matches_staged_chain(spark):
    cfg = v2.V2Config(digest_batch=3)
    grouped, outlines = _prep(spark, cfg)

    digests_u, _dead = v2.make_digests(grouped, outlines,
                                       MockSurveyClient, cfg)
    sugg_u = v2.feedback_suggestions(digests_u, outlines,
                                     MockSurveyClient, cfg=cfg)
    digests_f, sugg_f = v2.digest_feedback_fused(grouped, outlines,
                                                 MockSurveyClient, cfg)

    assert digests_u.columns == digests_f.columns
    assert sugg_u.columns == sugg_f.columns
    assert _rows(digests_u) == _rows(digests_f)
    assert _rows(sugg_u) == _rows(sugg_f)
    # non-degenerate fixture: several groups, several merged sections,
    # one suggestion per group
    n_groups = grouped.select("survey_id", "digest_id").distinct().count()
    assert n_groups >= 4
    assert sugg_f.count() == n_groups
    assert digests_f.count() > n_groups


def test_fused_per_survey_threading_identical(spark):
    """r14: digest_feedback_fused groups PER SURVEY with digest groups
    fanned out on llm_threads — outputs and metric accumulator counts
    must be identical at llm_threads=1 and 4 (the per-group bodies are
    independent and deterministic; metric adds happen outside the
    pool)."""
    from llmxmapreduce_spark.operators.stage_metrics import StageMetrics

    cfg1 = v2.V2Config(digest_batch=1, llm_threads=1)
    grouped, outlines = _prep(spark, cfg1)

    def run(threads):
        cfg = v2.V2Config(digest_batch=1, llm_threads=threads)
        sm = StageMetrics(spark)
        d, s = v2.digest_feedback_fused(grouped, outlines,
                                        MockSurveyClient, cfg,
                                        metrics=sm.llm("digest"),
                                        feedback_metrics=sm.llm("feedback"))
        rows = (_rows(d), _rows(s))
        counts = {r["stage"]: r["llm_calls"] for r in sm.report()
                  if r.get("llm_calls")}
        return rows, counts

    (d1, s1), c1 = run(1)
    (d4, s4), c4 = run(4)
    assert d1 == d4 and s1 == s4
    assert c1 == c4
    # digest_batch=1 → one digest group per paper: the call counts must
    # equal papers (digest) and groups (feedback), proving no call was
    # lost or duplicated under threading
    n_groups = grouped.select("survey_id", "digest_id").distinct().count()
    assert c1.get("digest") == grouped.count()
    assert c1.get("feedback") == n_groups


def test_fused_e2e_survey_identical(spark):
    surveys = make_surveys(spark)
    base = dict(conv_layers=1, receptive_field=2, result_num=3,
                top_k=2, refine_rounds=1, best_of=2, block_count=2)
    staged = v2.run_v2_survey(surveys, MockSurveyClient,
                              v2.V2Config(**base))
    fused = v2.run_v2_survey(surveys, MockSurveyClient,
                             v2.V2Config(fused_digest_feedback=True, **base))
    assert staged.columns == fused.columns
    assert _rows(staged) == _rows(fused)


def test_fused_init_outlines_matches_staged(spark):
    cfg = v2.V2Config(digest_batch=2, skeleton_batch=2)
    surveys = make_surveys(spark, n_surveys=2, n_papers=6)
    papers = v2.build_papers(surveys)
    grouped = v2.group_papers(papers, cfg).localCheckpoint(eager=True)

    staged = v2.init_outlines(grouped, MockSurveyClient, cfg)
    fused = v2.init_outlines_fused(grouped, MockSurveyClient, cfg)
    assert staged.columns == fused.columns
    assert _rows(staged) == _rows(fused)
    assert staged.count() == 2          # one outline per survey


def test_both_fusions_e2e_identical(spark):
    surveys = make_surveys(spark)
    base = dict(conv_layers=1, receptive_field=2, result_num=3,
                top_k=2, refine_rounds=1, best_of=2)
    staged = v2.run_v2_survey(surveys, MockSurveyClient,
                              v2.V2Config(**base))
    fused = v2.run_v2_survey(
        surveys, MockSurveyClient,
        v2.V2Config(fused_digest_feedback=True, fused_init_outlines=True,
                    **base))
    assert _rows(staged) == _rows(fused)


def test_fused_stage_metrics_attribution(spark):
    """r13 review finding: the fused stage must route L7 digest calls and
    L9 feedback calls to their OWN accumulators (digest/suggest), exactly
    like the staged chain — not lump both into 'digest' and leave
    'suggest' at zero, which would break any per-stage cost comparison."""
    from llmxmapreduce_spark.operators.stage_metrics import StageMetrics

    cfg = v2.V2Config(digest_batch=3)
    grouped, outlines = _prep(spark, cfg)
    n_papers = grouped.count()
    n_groups = grouped.select("survey_id", "digest_id").distinct().count()

    sm = StageMetrics(spark)
    digests, sugg = v2.digest_feedback_fused(
        grouped, outlines, MockSurveyClient, cfg,
        metrics=sm.llm("digest"), feedback_metrics=sm.llm("suggest"))
    digests.count(); sugg.count()   # checkpoint already materialized; cheap

    assert sm.llm("digest").calls.value == n_papers
    assert sm.llm("suggest").calls.value == n_groups
    assert sm.llm("suggest").reply_chars.value > 0


def test_fused_conv_refine_matches_staged(spark):
    """r13: conv_refine_fused (one survey-keyed exchange) must be
    row-identical to convolution_block → self_refine (two exchanges) —
    both run the SAME shared per-group bodies, so any drift here means
    the fusion wrapper itself broke."""
    from pyspark.sql import functions as F

    cfg = v2.V2Config(conv_layers=2, receptive_field=2, result_num=3,
                      top_k=2, refine_rounds=2, best_of=2)
    grouped, outlines = _prep(spark, cfg)
    digests, _dead = v2.make_digests(grouped, outlines, MockSurveyClient, cfg)
    cur = outlines.select(
        "survey_id", "survey_title", "outline_md",
        F.lit(None).cast("double").alias("eval_score"),
        F.lit("[]").alias("block_avg_score"),
        F.lit("[]").alias("self_refine_score"),
        F.lit("[]").alias("conv_pool_sizes"),
    )
    sugg = v2.feedback_suggestions(digests, cur, MockSurveyClient, cfg=cfg)

    staged = v2.self_refine(
        v2.convolution_block(cur, sugg, MockSurveyClient, cfg),
        MockSurveyClient, cfg)
    fused = v2.conv_refine_fused(cur, sugg, MockSurveyClient, cfg)
    assert staged.columns == fused.columns
    assert _rows(staged) == _rows(fused)
    assert fused.count() == 2           # one refined outline per survey


def test_all_three_fusions_e2e_identical(spark):
    surveys = make_surveys(spark)
    base = dict(conv_layers=1, receptive_field=2, result_num=3,
                top_k=2, refine_rounds=1, best_of=2)
    staged = v2.run_v2_survey(surveys, MockSurveyClient,
                              v2.V2Config(**base))
    fused = v2.run_v2_survey(
        surveys, MockSurveyClient,
        v2.V2Config(fused_digest_feedback=True, fused_init_outlines=True,
                    fused_conv_refine=True, **base))
    assert _rows(staged) == _rows(fused)
