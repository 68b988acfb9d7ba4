"""JSONL / file sources and sinks (S1, S2, S5, S7, S8, S9).

Reference: encode_pipeline.py:38-64 (S1 survey scan), eval_utils.py:18-97
(S2 task registry), decode_pipeline.py:158-163 (S5 survey sink),
scripts/output_to_md.py + watch_data.py:7-21 (S7 md export),
all_eval.py:92-126 (S8 eval csv), LLMxMapReduce_V1/utils.py:30-46 (S9 trace).

All IO is Spark-native (``spark.read.json`` / ``df.write``): at 100 TB the
line-by-line generator of the reference becomes a parallel scan with schema
enforcement, and "first N" needs an explicit order (T6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llmxmapreduce_spark.schemas import SURVEYS_INPUT

# S2 — InfiniteBench task registry (eval_utils.py:18-36).
INFINITEBENCH_TASKS = {
    "passkey": "passkey.jsonl",
    "number_string": "number_string.jsonl",
    "kv_retrieval": "kv_retrieval.jsonl",
    "longdialogue_qa_eng": "longdialogue_qa_eng.jsonl",
    "longbook_sum_eng": "longbook_sum_eng.jsonl",
    "longbook_choice_eng": "longbook_choice_eng.jsonl",
    "longbook_qa_eng": "longbook_qa_eng.jsonl",
    "longbook_qa_chn": "longbook_qa_chn.jsonl",
    "math_find": "math_find.jsonl",
    "math_calc": "math_calc.jsonl",
    "code_run": "code_run.jsonl",
    "code_debug": "code_debug.jsonl",
}


def load_surveys(spark: SparkSession, path: str, data_num: int | None = None,
                 order_col: str = "survey_id") -> DataFrame:
    """S1 (encode_pipeline.py:38-64): JSONL → SURVEYS_INPUT rows, with the
    ``data_num`` cap made deterministic via an explicit order (T6)."""
    df = spark.read.schema(SURVEYS_INPUT).json(path)
    df = df.filter(F.size(F.col("papers")) > 0)  # P2 empty-paper filter
    if data_num is not None:
        df = df.orderBy(order_col).limit(data_num)
    return df


def load_infinitebench_task(spark: SparkSession, task: str, data_dir: str,
                            data_num: int | None = None) -> DataFrame:
    """S2 (eval_utils.py:94-97): task JSONL by registry name."""
    if task not in INFINITEBENCH_TASKS:
        raise KeyError(f"unknown task {task!r}; know {sorted(INFINITEBENCH_TASKS)}")
    df = spark.read.json(f"{data_dir}/{INFINITEBENCH_TASKS[task]}")
    if data_num is not None:
        df = df.orderBy("id").limit(data_num)
    return df


def save_surveys(df: DataFrame, path: str, mode: str = "append") -> None:
    """S5 (decode_pipeline.py:158-163): one JSON line per survey."""
    df.write.mode(mode).json(path)


def export_markdown(df: DataFrame, id_col: str = "survey_id",
                    title_col: str = "survey_title",
                    content_col: str = "content_md",
                    refs_col: str = "ref_str") -> DataFrame:
    """S7 (watch_data.py:7-21): assemble the final per-survey .md document
    as rows (write with ``df.write.text`` partitioned by survey, or collect
    per-survey driver-side for small outputs)."""
    return df.select(
        F.col(id_col),
        F.concat(
            F.lit("# "), F.col(title_col), F.lit("\n\n"),
            F.col(content_col), F.lit("\n\n"),
            F.coalesce(F.col(refs_col), F.lit("")),
        ).alias("markdown"),
    )


def save_eval_csv(metrics: DataFrame, path: str) -> None:
    """S8 (all_eval.py:92-126): per-survey metric rows + overall averages
    appended as a final row."""
    # ALL numeric columns average (counts included) — labelling a numeric
    # column "AVG" would make the union's ANSI cast throw.
    num_cols = [f.name for f in metrics.schema.fields
                if f.dataType.typeName() in
                ("double", "float", "integer", "long", "short", "decimal")]
    avg_row = metrics.agg(
        *[F.avg(c).alias(c) for c in num_cols],
    )
    id_cols = [c for c in metrics.columns if c not in num_cols]
    for c in id_cols:
        avg_row = avg_row.withColumn(c, F.lit("AVG"))
    metrics.select(*metrics.columns).unionByName(
        avg_row.select(*metrics.columns)
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def trace_sink(stage_inputs: DataFrame, stage: str, id_col: str = "doc_id",
               input_col: str = "input", output_col: str = "output") -> DataFrame:
    """S9 (utils.py:30-46): per-operator lineage rows
    (input, output, operator_type, doc_id) ready to append to a trace table."""
    return stage_inputs.select(
        F.col(id_col).alias("doc_id"),
        F.col(input_col).cast("string").alias("input"),
        F.col(output_col).cast("string").alias("output"),
        F.lit(stage).alias("operator_type"),
        F.current_timestamp().alias("ts"),
    )
