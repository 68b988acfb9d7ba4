"""SurveyEval suite (SURVEY.md §5; reference: evaluation/agents/judge.py,
atomic_facts.py, all_eval.py): L24-L27 judges + A8/A9 aggregations.

Each judge is one ``llm_stage``; the claim↔source pairing is the J4 join;
metrics are the A9 aggregations in operators/eval_ops.py.  With the mock
client the whole suite is deterministic; with a real client it is the
reference's LLM-as-judge evaluation at Spark scale (every (claim, citation)
NLI pair is one row — millions of pairs parallelize instead of the
reference's per-survey thread pools).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llmxmapreduce_spark.operators.eval_ops import avg_nonzero, claim_metrics, count_sentences
from llmxmapreduce_spark.operators.llm_op import llm_stage

# judge.py:124 citation_pattern — sentences that carry a [..] citation.
CLAIM_RE = r"[^.!?]*\[[^\]]+\][^.!?]*[.!?]"

CRITERIA = ("Coverage", "Structure", "Relevance")  # prompt.py:1-42


def extract_claims(surveys: DataFrame, content_col: str = "content_md") -> DataFrame:
    """Deterministic claim extraction (judge.py:122-135): citation-bearing
    sentences of the pre-References body, with their cited indices."""
    body = F.split(F.col(content_col), "## References").getItem(0)
    claims_arr = F.regexp_extract_all(body, F.lit(CLAIM_RE), 0)
    out = surveys.select(
        "survey_id", F.posexplode(claims_arr).alias("claim_pos", "claim")
    )
    groups = F.regexp_extract_all(F.col("claim"), F.lit(r"\[([0-9, ]+)\]"), 1)
    nums = F.flatten(F.transform(
        groups,
        lambda g: F.filter(F.transform(F.split(g, ","), lambda x: F.trim(x)),
                           lambda x: x != ""),
    ))
    return out.withColumn(
        "cited_indices",
        F.array_sort(F.array_distinct(F.transform(nums, lambda x: x.cast("int")))),
    ).filter(F.size("cited_indices") > 0)


def nli_verdicts(claims: DataFrame, papers: DataFrame, client_factory,
                 retry=None) -> DataFrame:
    """L24 over the J4 join: one row per (claim, cited paper), verdict =
    'yes' containment (judge.py:93-120)."""
    pairs = claims.select(
        "survey_id", "claim_pos", "claim", F.explode("cited_indices").alias("ref")
    ).join(
        papers.select("survey_id", (F.col("paper_pos") + 1).alias("ref"),
                      F.col("txt").alias("source")),
        ["survey_id", "ref"],
    )
    out = llm_stage(
        pairs,
        build_prompt=lambda r: (
            f"[NLI]\nSource:\n{(r['source'] or '')[:2000]}\n"
            f"Claim:\n{r['claim']}\nDoes the source support the claim? yes/no."
        ),
        parse=lambda s: {"supported": "yes" in s.lower()},
        client_factory=client_factory,
        payload_fields=[T.StructField("supported", T.BooleanType(), True)],
        keep_cols=["survey_id", "claim_pos", "claim", "ref"],
        retry=retry,
    ).filter("llm_ok")
    return out


def criteria_scores(surveys: DataFrame, client_factory, retry=None) -> DataFrame:
    """L25: 1-5 rubric score per criterion, first-integer parse
    (judge.py:43-67), reported ×20 (all_eval.py:35)."""
    graded = None
    for criterion in CRITERIA:
        one = llm_stage(
            surveys,
            build_prompt=lambda r, c=criterion: (
                f"[CRITERIA] criterion: {c}\nSurvey title: {r['survey_title']}\n"
                f"Survey:\n{(r['content_md'] or '')[:4000]}\nScore 1-5."
            ),
            parse=lambda s: {"score": int(re.findall(r"\d+", s)[0])},
            client_factory=client_factory,
            payload_fields=[T.StructField("score", T.IntegerType(), True)],
            keep_cols=["survey_id"],
            retry=retry,
        ).filter("llm_ok").select(
            "survey_id", F.lit(criterion).alias("criterion"),
            (F.col("score") * 20).alias("score"),
        )
        graded = one if graded is None else graded.unionByName(one)
    return graded


def section_scores(surveys: DataFrame, client_factory, dimension: str,
                   retry=None) -> DataFrame:
    """L26: per-##-section 0-100 score (judge.py:292-357); A8 averaging
    drops zero scores."""
    sections = surveys.select(
        "survey_id",
        F.posexplode(F.split(F.col("content_md"), r"(?m)^## ")).alias("sec_pos", "sec"),
    ).filter((F.col("sec_pos") > 0) & (F.trim("sec") != ""))
    scored = llm_stage(
        sections,
        build_prompt=lambda r: (
            f"[SECTION_SCORE] dimension: {dimension}\n"
            f"Section:\n{r['sec'][:3000]}\nScore 0-100 as <SCORE>n</SCORE>."
        ),
        parse=lambda s: {"score": float(re.search(r"<SCORE>([0-9.]+)</SCORE>", s).group(1))},
        client_factory=client_factory,
        payload_fields=[T.StructField("score", T.DoubleType(), True)],
        keep_cols=["survey_id", "sec_pos"],
        retry=retry,
    ).filter("llm_ok")
    return scored.groupBy("survey_id").agg(
        avg_nonzero(F.col("score")).alias(f"{dimension}_score")
    )


def run_survey_eval(surveys: DataFrame, papers: DataFrame, client_factory,
                    retry=None) -> DataFrame:
    """Full A8/A9 metric row per survey (all_eval.py:31-44 shape)."""
    claims = extract_claims(surveys)
    verdicts = nli_verdicts(claims, papers, client_factory, retry)
    per_claim = verdicts.groupBy("survey_id", "claim_pos").agg(
        F.collect_list("ref").alias("cited_indices"),
        F.collect_list("supported").alias("nli_verdict"),
    )
    n_papers = papers.groupBy("survey_id").agg(
        F.count(F.lit(1)).alias("total_papers"))
    a9 = claim_metrics(per_claim.join(n_papers, "survey_id"))

    crit = criteria_scores(surveys, client_factory, retry) \
        .groupBy("survey_id").pivot("criterion", list(CRITERIA)).sum("score")
    lang = section_scores(surveys, client_factory, "language", retry)
    crit_l = section_scores(surveys, client_factory, "critical", retry)

    density = surveys.select(
        "survey_id",
        count_sentences(F.col("content_md")).alias("n_sentences"),
    )
    return (
        a9.join(crit, "survey_id", "left")
        .join(lang, "survey_id", "left")
        .join(crit_l, "survey_id", "left")
        .join(density, "survey_id", "left")
        .withColumn("claim_density",
                    F.col("n_claims") / F.col("n_sentences"))
    )
