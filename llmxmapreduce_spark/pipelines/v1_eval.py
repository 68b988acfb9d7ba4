"""V1 InfiniteBench evaluation driver (SURVEY.md §3.1 step 6; reference:
eval/infinitebench/eval_infinitebench_MR.py:104-147, process_answer.py,
compute_scores.py).

task JSONL → run_v1_qa → task-specific answer post-processing (P13) →
per-task scorer → per-task averages (A8-style) → S8 CSV shape.

Task → scorer mapping (compute_scores.py):
- passkey / number_string / kv_retrieval → containment
- longbook_qa_* / longdialogue_qa_eng    → normalized token F1
- longbook_choice_eng / code_debug       → last-capital-letter match
- math_find / code_run                   → first-number containment
(ROUGE for longbook_sum_eng needs the `evaluate` package — not in this
environment; summarization falls back to token F1, flagged in the output.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llmxmapreduce_spark.functions import text as X
from llmxmapreduce_spark.operators.eval_ops import (
    containment_score,
    last_capital_score,
    qa_f1,
)

CONTAINMENT_TASKS = {"passkey", "number_string", "kv_retrieval",
                     "math_find", "code_run"}
F1_TASKS = {"longbook_qa_eng", "longbook_qa_chn", "longdialogue_qa_eng",
            "longbook_sum_eng"}
CAPITAL_TASKS = {"longbook_choice_eng", "code_debug"}


def postprocess_predictions(preds: DataFrame, task_col: str = "task",
                            pred_col: str = "prediction") -> DataFrame:
    """P13 per task (process_answer.py:35-57): QA/sum tasks strip the
    answer tail; choice tasks keep the prefixed form."""
    extracted = X.extract_answer(F.col(pred_col))
    return preds.withColumn(
        pred_col,
        F.when(F.col(task_col).isin(*F1_TASKS), extracted)
        .when(F.col(task_col).isin(*CAPITAL_TASKS),
              F.concat(F.lit("answer: "), extracted))
        .otherwise(F.col(pred_col)),
    )


def score_predictions(preds: DataFrame, task_col: str = "task",
                      pred_col: str = "prediction",
                      gt_col: str = "ground_truth") -> DataFrame:
    """One score column per row, scorer chosen by task."""
    with_f1 = qa_f1(preds, pred_col, gt_col, out_col="__f1")
    score = (
        F.when(F.col(task_col).isin(*CONTAINMENT_TASKS),
               containment_score(F.col(pred_col), F.col(gt_col)))
        .when(F.col(task_col).isin(*CAPITAL_TASKS),
              last_capital_score(F.col(pred_col), F.col(gt_col)))
        .otherwise(F.col("__f1"))
    )
    return with_f1.withColumn("score", score).drop("__f1")


def task_averages(scored: DataFrame, task_col: str = "task") -> DataFrame:
    """Per-task accuracy (×100, the reference's reporting scale) + counts."""
    return scored.groupBy(task_col).agg(
        (F.sum(F.col("score").cast("decimal(20,8)")).cast("double")
         / F.count(F.lit(1)) * 100).alias("accuracy"),
        F.count(F.lit(1)).alias("n_examples"),
    )


def run_v1_eval(examples: DataFrame, chunk_size: int, client_factory,
                retry=None) -> tuple[DataFrame, DataFrame]:
    """examples: (doc_id, task, context, question, ground_truth) →
    (per-example scored rows, per-task averages)."""
    from llmxmapreduce_spark.pipelines.v1_qa import run_v1_qa

    answers = run_v1_qa(
        examples.select("doc_id", "context", "question"),
        chunk_size, client_factory, retry=retry,
    )
    joined = examples.select("doc_id", "task", "ground_truth").join(
        answers.select("doc_id", F.col("raw_reply").alias("prediction")),
        "doc_id",
    )
    scored = score_predictions(postprocess_predictions(joined))
    return scored, task_averages(scored)
