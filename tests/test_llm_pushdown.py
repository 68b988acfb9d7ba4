"""Deterministic-filter pushdown below LLM stages (SURVEY §4's optional
cost rule: a filter composed "after" the stage but touching only input
columns should run before any model call — Catalyst cannot reorder
through the mapInPandas barrier, so the deferred builder does).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from llmxmapreduce_spark.llm.client import LLMClient, RetryPolicy
from llmxmapreduce_spark.operators import llm_op

PAYLOAD = [T.StructField("echo", T.StringType(), True)]


def _mk():
    class EchoClient(LLMClient):
        def complete(self, prompt: str) -> str:
            return f"REPLY::{prompt}"

    def build(row):
        return f"say {row['word']}"

    def parse(reply):
        return {"echo": reply[len("REPLY::"):]}

    return EchoClient, build, parse


def _frame(spark):
    rows = [(i, w, l) for i, (w, l) in enumerate(
        [("alpha", "en"), ("beta", "en"), ("gamma", "fr"),
         ("delta", "fr"), ("omega", "de")])]
    return spark.createDataFrame(rows, ["row_id", "word", "lang"])


def _stage(spark, df, metrics=None, **kw):
    client, build, parse = _mk()
    return llm_op.DeferredLLMStage(
        df, build, parse, client, PAYLOAD, ["row_id", "word"],
        retry=RetryPolicy(max_attempts=1), metrics=metrics, **kw)


def test_input_column_filter_runs_before_the_model(spark):
    df = _frame(spark)
    m = llm_op.LLMMetrics(spark)
    out = _stage(spark, df, metrics=m).filter("lang = 'en'").df()
    assert out.count() == 2
    assert m.calls.value == 2          # 3 non-en rows never reached the model


def test_payload_filter_stays_after_the_model(spark):
    df = _frame(spark)
    m = llm_op.LLMMetrics(spark)
    out = _stage(spark, df, metrics=m).filter("echo = 'say alpha'").df()
    assert out.count() == 1
    assert m.calls.value == 5          # every row was called, then filtered


def test_mixed_conjunction_splits(spark):
    df = _frame(spark)
    m = llm_op.LLMMetrics(spark)
    out = (_stage(spark, df, metrics=m)
           .filter("lang = 'en' AND llm_ok AND echo != 'say beta'").df())
    assert out.count() == 1                       # alpha only
    assert m.calls.value == 2                     # fr/de rows pushed out pre


def test_nondeterministic_filter_is_never_reordered(spark):
    df = _frame(spark)
    m = llm_op.LLMMetrics(spark)
    # rand() touches only input columns (none, in fact) but must not move
    # below the stage the user wrote it against
    out = _stage(spark, df, metrics=m).filter("rand(42) >= 0.0").df()
    assert out.count() == 5
    assert m.calls.value == 5


def test_unknown_column_raises_clearly(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="lang"):
        # an OR is one conjunct: rand() makes it non-pushable, and lang
        # (input-only, not a keep column) makes post-placement impossible
        _stage(spark, df).filter("lang = 'en' OR rand(1) > 0.5")


def test_matches_manual_composition(spark):
    df = _frame(spark)
    client, build, parse = _mk()
    manual = llm_op.llm_stage(
        df.filter("lang = 'en'"), build, parse, client, PAYLOAD,
        ["row_id", "word"], retry=RetryPolicy(max_attempts=1)
    ).filter("llm_ok")
    deferred = (_stage(spark, df)
                .filter("lang = 'en'").filter("llm_ok").df())
    assert sorted(map(tuple, deferred.collect())) == \
        sorted(map(tuple, manual.collect()))


def test_composes_with_prompt_cache(spark, tmp_path):
    df = _frame(spark)
    m = llm_op.LLMMetrics(spark)
    out = (_stage(spark, df, metrics=m, cache_dir=str(tmp_path / "c"))
           .filter("lang = 'en'").df())
    assert out.count() == 2 and m.calls.value == 2

    m2 = llm_op.LLMMetrics(spark)
    out2 = (_stage(spark, df, metrics=m2, cache_dir=str(tmp_path / "c"))
            .filter("lang IN ('en', 'fr')").df())
    assert out2.count() == 4
    assert m2.calls.value == 2         # en rows replay, only fr rows call
