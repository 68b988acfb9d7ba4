"""V1 InfiniteBench eval driver: scorer routing + end-to-end accuracy."""

from pyspark.sql import functions as F

from llmxmapreduce_spark.llm.client import MockQAClient
from llmxmapreduce_spark.pipelines import v1_eval


def test_scorer_routing(spark):
    rows = [
        ("passkey", "the code is 71432 maybe", "71432", 1.0),
        ("passkey", "no idea", "71432", 0.0),
        ("longbook_qa_eng", "Answer: the Eiffel Tower", "eiffel tower", 1.0),
        ("longbook_qa_eng", "Answer: something else", "eiffel tower", 0.0),
        ("code_debug", "analysis...\nAnswer: B", "B", 1.0),
        ("code_debug", "analysis...\nAnswer: C", "B", 0.0),
    ]
    df = spark.createDataFrame(
        [(i, t, p, g) for i, (t, p, g, _) in enumerate(rows)],
        ["doc_id", "task", "prediction", "ground_truth"],
    )
    scored = v1_eval.score_predictions(v1_eval.postprocess_predictions(df))
    got = {r["doc_id"]: r["score"] for r in scored.collect()}
    for i, (_, _, _, expected) in enumerate(rows):
        assert got[i] == expected, (i, rows[i], got[i])


def test_v1_eval_end_to_end(spark):
    # planted-secret passkey task through the full QA pipeline + eval
    rows = []
    for i in range(4):
        filler = "\n".join(f"noise line {j} for doc {i}." for j in range(15))
        secret = f"The secret key for document {i} is SK-{2000 + i}."
        rows.append((
            i, "passkey",
            f"{filler}\n{secret}\n{filler}",
            f"What is the secret key for document {i}?",
            f"SK-{2000 + i}",
        ))
    examples = spark.createDataFrame(
        rows, ["doc_id", "task", "context", "question", "ground_truth"])
    scored, avgs = v1_eval.run_v1_eval(examples, chunk_size=520, client_factory=MockQAClient)
    srows = scored.collect()
    assert all(r["score"] == 1.0 for r in srows), srows
    a = avgs.collect()[0]
    assert a["task"] == "passkey" and a["accuracy"] == 100.0 and a["n_examples"] == 4


def test_task_averages_decimal_exact(spark):
    df = spark.createDataFrame(
        [("t", 1.0), ("t", 0.0), ("t", 1.0), ("t", 1.0)], ["task", "score"])
    got = v1_eval.task_averages(df).collect()[0]
    assert got["accuracy"] == 75.0
