"""LLM client layer: pluggable clients + retry policy (SURVEY.md §2.9 D12/D13).

The engine never talks to a provider directly from operators — operators
receive a ``client_factory`` and instantiate one client per partition inside
``mapInPandas`` (one connection pool per executor core, the Spark analog of
the reference's per-model ``Semaphore(20)`` request pool,
request/wrapper.py:12-67).
"""

from llmxmapreduce_spark.llm.client import (  # noqa: F401
    HashEchoClient,
    LLMClient,
    MockQAClient,
    OpenAICompatClient,
    RetryPolicy,
)
