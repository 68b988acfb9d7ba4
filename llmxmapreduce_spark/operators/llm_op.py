"""The generic batched-LLM operator (SURVEY.md §2.10b) — the single pattern
behind every L1-L27 "LLM scalar".

``llm_stage`` is a ``mapInPandas`` transformation: per Arrow batch it formats
prompts from row fields, calls the client (one client per partition — the
Spark analog of the reference's per-model request pool,
request/wrapper.py:12-67), parses replies, and emits the payload plus the
error-sentinel bookkeeping columns ``llm_ok/llm_error/llm_attempts``
(async_d/node/node.py:243-272, decorator.py:9-18).  Failed rows flow on and
can be quarantined with :func:`dead_letter_split` instead of killing the job.

Scale notes: Arrow-batched (never row-at-a-time Python), no driver collect,
and the stage's parallelism = its input partitioning, so LLM concurrency is
tuned by ``repartition(n)`` before the stage.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from llmxmapreduce_spark.llm.client import LLMClient, RetryPolicy, call_with_retry

LLM_COLS = [
    T.StructField("llm_ok", T.BooleanType(), False),
    T.StructField("llm_error", T.StringType(), True),
    T.StructField("llm_attempts", T.IntegerType(), False),
]


class LLMMetrics:
    """D10/D12 call + token accounting via Spark accumulators (the engine
    analog of the reference's token_counter.py:7-37 / pipeline_analyser).

    Character counts stand in for tokens (÷4 ≈ the reference's estimate);
    accumulators aggregate across all executors and are readable on the
    driver after each action.
    """

    def __init__(self, spark):
        sc = spark.sparkContext
        self.calls = sc.accumulator(0)
        self.failures = sc.accumulator(0)
        self.prompt_chars = sc.accumulator(0)
        self.reply_chars = sc.accumulator(0)

    def snapshot(self) -> dict:
        return {
            "calls": self.calls.value,
            "failures": self.failures.value,
            "prompt_chars": self.prompt_chars.value,
            "reply_chars": self.reply_chars.value,
            "est_prompt_tokens": self.prompt_chars.value // 4,
            "est_reply_tokens": self.reply_chars.value // 4,
        }


def llm_stage(
    df: DataFrame,
    build_prompt: Callable[[dict[str, Any]], str],
    parse: Callable[[str], dict[str, Any]],
    client_factory: Callable[[], LLMClient],
    payload_fields: list[T.StructField],
    keep_cols: list[str],
    retry: RetryPolicy | None = None,
    metrics: LLMMetrics | None = None,
) -> DataFrame:
    """Run one LLM stage over ``df``.

    - ``build_prompt(row_dict) -> str`` — prompt template over row fields.
    - ``parse(reply) -> dict`` — validated payload; raising marks the row
      ``llm_ok=false`` (parse-and-retry is the reference's schema system,
      process_str.py:8-29).
    - ``payload_fields`` — schema of what ``parse`` returns.
    - ``keep_cols`` — input columns carried through (ids, ordering keys).

    When ``retry`` is omitted, the policy comes from the client's own
    ``retry_policy`` (the per-provider preset on OpenAICompatClient),
    falling back to the test default.  The probe instantiates one client on
    the driver; per-partition clients are created inside ``run``.
    """
    if retry is None:
        retry = getattr(client_factory(), "retry_policy", None) or RetryPolicy()
    keep_fields = [df.schema[c] for c in keep_cols]
    out_schema = T.StructType(keep_fields + payload_fields + LLM_COLS)
    payload_names = [f.name for f in payload_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            out_rows = []
            for row in pdf.to_dict("records"):
                prompt = build_prompt(row)
                reply, err, attempts = call_with_retry(client, prompt, retry)
                if metrics is not None:
                    metrics.calls.add(1)
                    metrics.prompt_chars.add(len(prompt))
                    if reply is None:
                        metrics.failures.add(1)
                    else:
                        metrics.reply_chars.add(len(reply))
                payload: dict[str, Any] = dict.fromkeys(payload_names)
                ok = reply is not None
                if ok:
                    try:
                        parsed = parse(reply)
                        payload.update({k: parsed.get(k) for k in payload_names})
                    except Exception as e:  # noqa: BLE001 - sentinel semantics
                        ok, err = False, f"ParseError: {type(e).__name__}: {e}"
                out_rows.append(
                    {**{c: row[c] for c in keep_cols}, **payload,
                     "llm_ok": ok, "llm_error": err, "llm_attempts": attempts}
                )
            yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


def dead_letter_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ok_rows, failed_rows) — D8 quarantine instead of crash."""
    return df.filter("llm_ok"), df.filter("NOT llm_ok")
