"""V1 InfiniteBench evaluation driver (SURVEY.md §3.1 step 6; reference:
eval/infinitebench/eval_infinitebench_MR.py:104-147, process_answer.py,
compute_scores.py).

task JSONL → run_v1_qa → task-specific answer post-processing (P13,
``task_special_process``) → per-task scorer (``get_score_one``) → per-task
averages (A8-style) → S8 CSV shape.

Task → scorer mapping (compute_scores.py:358-388, all reference-faithful):
- passkey / number_string      → whole digit-run membership (my_find_key)
- kv_retrieval                 → whole-word membership after separator strip
- code_run                     → last word parsed as int, numeric equality
- code_debug                   → last standalone [A-J] + prefix fallbacks
- longbook_choice_eng          → last standalone [A-D] + prefix fallbacks
- longdialogue_qa_eng          → uppercase label containment (0/1)
- longbook_qa_eng              → normalized token F1
- longbook_qa_chn              → zh char-level F1
- longbook_sum_eng             → ROUGE-Lsum (dependency-free port)
- math_find                    → first number, numeric equality
- math_calc                    → matching number-prefix ratio
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llmxmapreduce_spark.functions import text as X
from llmxmapreduce_spark.operators.eval_ops import (
    code_debug_score,
    code_run_score,
    digit_token_score,
    longbook_choice_score,
    longdialogue_score,
    math_calc_score,
    math_find_score,
    qa_f1,
    qa_f1_zh,
    retrieval_word_score,
)
from llmxmapreduce_spark.operators.rouge import rouge_lsum

DIGIT_TASKS = {"passkey", "number_string"}
CHOICE_TASKS = {"longbook_choice_eng", "code_debug"}
QA_EXTRACT_TASKS = {"longbook_qa_eng", "longbook_qa_chn",
                    "longdialogue_qa_eng", "longbook_sum_eng"}


def postprocess_predictions(preds: DataFrame, task_col: str = "task",
                            pred_col: str = "prediction") -> DataFrame:
    """P13 ``task_special_process`` (process_answer.py:35-57), faithful:
    prefixes tried in order (``Answer:`` then ``答案：``) against the LAST
    occurrence; a found-but-empty prefix breaks with the prediction
    unchanged; choice tasks get ``'answer: ' + tail`` ONLY when a prefix was
    actually found; QA/sum tasks take the tail and cut trailing confidence
    markers (exactly ``X.extract_answer`` — reused, not re-derived); every
    other task passes through untouched."""
    p = F.col(pred_col)
    choice_expr = None
    for prefix in X.ANS_PREFIXES:
        tail = F.substring_index(p, prefix, -1)
        after = F.substring(tail, 2, 2147483647)
        found = p.contains(prefix)
        choice_val = F.when(F.length(tail) >= 1,
                            F.concat(F.lit("answer: "), after)).otherwise(p)
        choice_expr = (F.when(found, choice_val) if choice_expr is None
                       else choice_expr.when(found, choice_val))
    return preds.withColumn(
        pred_col,
        F.when(F.col(task_col).isin(*CHOICE_TASKS), choice_expr.otherwise(p))
        .when(F.col(task_col).isin(*QA_EXTRACT_TASKS), X.extract_answer(p))
        .otherwise(p),
    )


def score_predictions(preds: DataFrame, task_col: str = "task",
                      pred_col: str = "prediction",
                      gt_col: str = "ground_truth",
                      fn_name_col: str | None = None) -> DataFrame:
    """One score column per row, scorer chosen by task
    (compute_scores.py:358-388).

    ``ground_truth`` may be a ``string`` OR an ``array<string>`` column.
    InfiniteBench ships multi-element label lists for
    longdialogue_qa_eng / longbook_choice_eng (and list-wrapped singles
    elsewhere); the reference scores against ALL of them — containment of
    ANY label (compute_scores.py:252-258), choice membership over the list
    (:260-310), and max token-F1 over labels (:66-101).  With an array
    column the full list reaches those scorers and single-label scorers
    take ``label[0]`` (the reference's own convention); a plain string is
    treated as a one-element list.  math_calc parses the (first) label as a
    separator-delimited number list.  code_debug's function-name fallback
    label comes from ``fn_name_col`` when provided (the reference's
    ``label[0]``).

    Catalyst extracts Python UDFs out of CASE WHEN arms (one ArrowEvalPython
    node evaluates them ALL per row), so each pandas scorer's inputs are
    gated to empty values on rows of other tasks — the UDF still runs per
    row but does O(1) work (e.g. the ROUGE LCS DP never sees a non-sum
    prediction)."""
    task, p = F.col(task_col), F.col(pred_col)
    multi_label = dict(preds.dtypes).get(gt_col, "string").startswith("array")
    if multi_label:
        gt_list = F.col(gt_col)
        gt = F.element_at(gt_list, 1)          # reference's label[0]
    else:
        gt = F.col(gt_col)
        gt_list = F.array(gt)
    fn = F.col(fn_name_col) if fn_name_col else F.lit(None).cast("string")

    def gated(cond, col, empty=""):
        return F.when(cond, col).otherwise(F.lit(empty))

    with_f1 = preds.withColumn(
        "__p_f1", gated(task.isin("longbook_qa_eng"), p)
    ).withColumn(
        "__p_f1_zh", gated(task == "longbook_qa_chn", p)
    )
    with_f1 = qa_f1(with_f1, "__p_f1", gt_col, out_col="__f1")
    with_f1 = qa_f1_zh(with_f1, "__p_f1_zh", gt_col, out_col="__f1_zh")
    empty_arr = F.array().cast("array<string>")
    gt_nums = gated(
        task == "math_calc",
        F.transform(
            F.filter(F.split(gt, r"[^0-9]"), lambda x: x != F.lit("")),
            lambda x: x.cast("long"),
        ),
        None,
    ).cast("array<long>")
    score = (
        F.when(task.isin(*DIGIT_TASKS), digit_token_score(p, gt))
        .when(task == "kv_retrieval", retrieval_word_score(p, gt))
        .when(task == "code_run", code_run_score(p, gt))
        .when(task == "code_debug",
              code_debug_score(gated(task == "code_debug", p), gt, fn))
        .when(task == "longbook_choice_eng",
              longbook_choice_score(
                  gated(task == "longbook_choice_eng", p),
                  F.when(task == "longbook_choice_eng", gt_list)
                  .otherwise(empty_arr)))
        .when(task == "longdialogue_qa_eng", longdialogue_score(p, gt_list))
        .when(task == "longbook_qa_chn", F.col("__f1_zh"))
        .when(task == "longbook_sum_eng",
              rouge_lsum(gated(task == "longbook_sum_eng", p),
                         gated(task == "longbook_sum_eng", gt)))
        .when(task == "math_find", math_find_score(p, gt))
        .when(task == "math_calc", math_calc_score(p, gt_nums))
        .otherwise(F.col("__f1"))          # longbook_qa_eng + default
    )
    return with_f1.withColumn("score", score) \
        .drop("__f1", "__f1_zh", "__p_f1", "__p_f1_zh")


def task_averages(scored: DataFrame, task_col: str = "task") -> DataFrame:
    """Per-task accuracy (×100, the reference's reporting scale) + counts."""
    return scored.groupBy(task_col).agg(
        (F.sum(F.col("score").cast("decimal(20,8)")).cast("double")
         / F.count(F.lit(1)) * 100).alias("accuracy"),
        F.count(F.lit(1)).alias("n_examples"),
    )


def run_v1_eval(examples: DataFrame, chunk_size: int, client_factory,
                retry=None, existing_predictions: DataFrame | None = None,
                ) -> tuple[DataFrame, DataFrame]:
    """examples: (doc_id, task, context, question, ground_truth) →
    (per-example scored rows, per-task averages).

    ``existing_predictions`` (doc_id, prediction) resumes a partial run the
    way the reference skips already-answered ids
    (eval_infinitebench_MR.py:88-94): those examples are anti-joined out of
    the QA pipeline and their stored predictions are scored instead.
    """
    from llmxmapreduce_spark.pipelines.v1_qa import run_v1_qa

    todo = examples.select("doc_id", "context", "question")
    if existing_predictions is not None:
        # append-style resume files can hold an id twice — keep one
        existing_predictions = existing_predictions \
            .select("doc_id", "prediction").dropDuplicates(["doc_id"])
        todo = todo.join(existing_predictions.select("doc_id"),
                         "doc_id", "left_anti")
    answers = run_v1_qa(todo, chunk_size, client_factory, retry=retry) \
        .select("doc_id", F.col("raw_reply").alias("prediction"))
    if existing_predictions is not None:
        answers = answers.unionByName(existing_predictions)
    joined = examples.select("doc_id", "task", "ground_truth") \
        .join(answers, "doc_id")
    scored = score_predictions(postprocess_predictions(joined))
    return scored, task_averages(scored)
